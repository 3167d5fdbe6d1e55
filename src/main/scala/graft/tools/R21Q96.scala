package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: isolate q96's slow AQE stage (round 21 diagnostic). */
object R21Q96 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    val dir = "/root/testdata/sf0.1"
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q96probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // silence INFO except codegen messages
    org.apache.log4j.LogManager.getRootLogger
      .setLevel(org.apache.log4j.Level.WARN)
    org.apache.log4j.LogManager
      .getLogger("org.apache.spark.sql.catalyst.expressions.codegen")
      .setLevel(org.apache.log4j.Level.INFO)
    org.apache.log4j.LogManager
      .getLogger("org.apache.spark.sql.execution.WholeStageCodegenExec")
      .setLevel(org.apache.log4j.Level.INFO)
    for (i <- 1 to 2) {
      val df = t(s"construct $i") {
        graft.SparkEntry.queries("q96_pq_ann")(spark, dir)
      }
      t(s"count $i") { df.count() }
      spark.catalog.clearCache(); Checkpoints.sweep(spark)
    }
    spark.stop()
  }
}
