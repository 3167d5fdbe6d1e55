package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off cardinality probe for the pair-expansion kernels (round 22):
  * group counts, Σn, Σ pairs — the denominator for per-pair CPU cost.
  * Local diagnostic only. */
object R22Card {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // q109 kernel: lineitem (partkey -> supplier set)
    val g109 = graft.sources.Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_suppkey").distinct()
      .groupBy($"l_partkey").agg(count(lit(1)).as("n"))
      .filter($"n" > 1 && $"n" <= 128)
    g109.agg(count(lit(1)).as("groups"), sum($"n").as("sum_n"),
      max($"n").as("max_n"),
      sum($"n" * ($"n" - 1) / 2).as("pairs")).show(false)

    // q27 kernel: documents shingle groups
    val d = graft.sources.Tables.documents(spark, sfDir)
    val ids = d.select($"doc_id",
        explode(expr("transform(sequence(1, greatest(size(split(text, ' ')) - 2, 0)), i -> " +
          "conv(substring(md5(concat_ws(' ', slice(split(text, ' '), i, 3))), 1, 15), 16, 10))")).as("h"))
    val g27 = ids.groupBy($"h").agg(countDistinct($"doc_id").as("n"))
      .filter($"n" <= 32)
    g27.agg(count(lit(1)).as("groups"), sum($"n").as("sum_n"),
      max($"n").as("max_n"),
      sum(when($"n" > 1, $"n" * ($"n" - 1) / 2).otherwise(0)).as("pairs"))
      .show(false)
    g27.filter($"n" > 1).agg(count(lit(1)).as("multi_groups")).show(false)
    spark.stop()
  }
}
