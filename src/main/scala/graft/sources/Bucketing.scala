package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables: the shuffle-free co-located join
  * path for the engine's fact-fact joins (SURVEY.md §4 100 TB notes).
  *
  * Writing both sides bucketed by the join key with the same bucket count
  * lets Catalyst plan a SortMergeJoin with NO Exchange on either side —
  * at 100 TB this turns the recurring orders⋈lineitem join from a
  * full-data shuffle into a per-bucket local merge. PlanQualitySpec
  * asserts the no-Exchange plan.
  */
object Bucketing {

  /** Write `df` as a bucketed external table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** Write `df` partitioned by `partCol` (hive-style directories) — the
    * layout that turns a date/key predicate into directory pruning and
    * enables dynamic partition pruning when the predicate arrives through
    * a dim-side join at runtime. */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.partitionBy(partCol).mode("overwrite").parquet(path)

  /** Co-locate the orders⋈lineitem spine: both sides bucketed on the
    * order key. Returns the two registered table names. */
  def setupOrderLineitem(spark: SparkSession, sfDir: String,
      warehouse: String, buckets: Int = 8): (String, String) = {
    writeBucketed(Tables.orders(spark, sfDir), "orders_bucketed",
      s"$warehouse/orders_bucketed", "o_orderkey", buckets)
    writeBucketed(
      Tables.lineitem(spark, sfDir)
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_bucketed", s"$warehouse/lineitem_bucketed",
      "o_orderkey", buckets)
    ("orders_bucketed", "lineitem_bucketed")
  }
}
