package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a kernel's output row count on each given dir (shape probe:
  * does the intermediate the next stage consumes scale linearly?).
  * Usage: `sbt "runMain graft.tools.CountProbe <query> <dir> [dir2...]"`. */
object CountProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    args.drop(1).foreach { dir =>
      val n = ConfGuard.withConfSnapshot(spark) { fn(spark, dir).count() }
      spark.catalog.clearCache()
      Checkpoints.sweep(spark)
      println(s"count $name $dir = $n")
    }
    spark.stop()
  }
}
