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

  /** Write `df` as a bucketed external table at `path`.
    *
    * The input is repartitioned BY THE BUCKET KEY into exactly
    * `buckets` partitions first (round 22, guide §6): repartition's
    * HashPartitioning is the same murmur3-pmod the bucket writer
    * applies, so each write task holds exactly one bucket's rows and
    * emits ONE sorted file per bucket — instead of every input task
    * writing its own copy of all N bucket files (q140's probe showed
    * the whole layout write serialized on the 1–2 AQE-coalesced input
    * partitions, 1.2 s single-task; and tasks×buckets small files is
    * exactly the layout §6 warns about at scale). Table content,
    * bucketing metadata and the downstream exchange-free scan plans
    * are unchanged. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit = {
    // plannedWrite would insert ITS OWN exchange above ours, sized to
    // the session shuffle width and then AQE-byte-coalesced back to 1
    // task (observed: the explicit repartition fed a planned-write
    // shuffle that collapsed to a single writer again). Scoped off for
    // this write only (the q83 conf-snapshot pattern) so the writer
    // consumes our key-aligned partitions directly.
    val s = df.sparkSession
    val pwKey = "spark.sql.optimizer.plannedWrite.enabled"
    val prev = s.conf.get(pwKey)
    try {
      s.conf.set(pwKey, "false")
      df.repartition(buckets, org.apache.spark.sql.functions.col(key))
        .write
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    } finally s.conf.set(pwKey, prev)
  }

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
