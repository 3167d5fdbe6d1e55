package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off response-curve probe: time one SparkEntry kernel on an
  * arbitrary corpus dir at several explicit shuffle widths, to verify
  * whether reducer width is actually the binding constraint the sizing
  * contract assumes. Usage:
  * `sbt "runMain graft.tools.WidthProbe <query> <dir> <w1,w2,...>"`. */
object WidthProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val widths = args(2).split(",").map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    def gc(): Long = Jvm.gcMillis()
    // optional extra conf overrides: k=v pairs after the width list
    val extra = args.drop(3).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    widths.foreach { w =>
      val t0 = System.nanoTime(); val g0 = gc()
      ConfGuard.withConfSnapshot(spark) {
        // fixed width for the whole query: the kernel's own
        // ensureShuffleWidth only raises, so setting a HIGHER floor
        // here tests that width, and a lower one lets the kernel win
        spark.conf.set("spark.sql.shuffle.partitions", w.toString)
        extra.foreach { case (k, v) => spark.conf.set(k, v) }
        fn(spark, dir).count()
      }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Checkpoints.sweep(spark)
      println(f"width=$w%-5d time=$dt%7.2fs gc=${(gc() - g0) / 1000.0}%6.2fs")
    }
    spark.stop()
  }
}
