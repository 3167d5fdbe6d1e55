package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query inventories. Every entry in [[queries]]
  * that is SQL-expressible has a DuckDB oracle in [[oracleSql]] with
  * IDENTICAL output column names and an explicit deterministic ORDER BY on
  * both sides.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01Flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Dml.queries ++ Chunker.queries ++
      Dedup.queries ++ TextStats.queries ++ Similarity.queries ++
      Search.queries ++ Multimodal.queries ++ Temporal.queries ++
      Curation.queries ++ Spans.queries ++ Clustering.queries ++
      Analytics.queries ++ Graphs.queries ++ Bpe.queries ++
      Evolution.queries ++ Embedding.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Dml.oracle ++ Chunker.oracle ++
      Dedup.oracle ++ TextStats.oracle ++ Similarity.oracle ++
      Search.oracle ++ Multimodal.oracle ++ Temporal.oracle ++
      Curation.oracle ++ Spans.oracle ++ Clustering.oracle ++
      Analytics.oracle ++ Graphs.oracle ++ Bpe.oracle ++
      Evolution.oracle ++ Embedding.oracle
}
