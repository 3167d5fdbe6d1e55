package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for the round-22 plan-evidence files:
  * `runMain graft.tools.R22Plans <suffix> <q1,q2,...>` writes
  * plans/r22/<query>_<suffix>.txt for each matching query. Bench-shaped
  * session (local[32], same AQE confs) so the plans are the ones the
  * run of record executes. */
object R22Plans {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val prefixes = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r22"))
    val names = graft.SparkEntry.queries.keys.toVector.sorted
      .filter(n => prefixes.exists(n.contains))
    for (name <- names) {
      try {
        val df = ConfGuard.withConfSnapshot(spark) {
          graft.SparkEntry.queries(name)(spark, sfDir)
        }
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"plans/r22/${name}_$suffix.txt"), txt)
        println(s"[plans] wrote $name ($suffix)")
      } catch { case e: Throwable =>
        println(s"[plans] $name FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      Checkpoints.sweep(spark)
    }
    spark.stop()
  }
}
