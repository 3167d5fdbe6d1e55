package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained funnel — the streaming twin of the batch
  * q88 (view → click-within-24h → purchase-within-24h): per-user state
  * is exactly THREE optional microsecond timestamps (t1, t2, t3), so
  * state is O(#users) however many events flow through — the funnel
  * analog of the TARGET_LAG derived tables (search index, dedup index,
  * CMS, LM model) maintained by this package.
  *
  * The merge assumes micro-batches arrive in event-time order (the
  * standard replay/watermark discipline of this package's maintainers;
  * a late event earlier than the committed t1 would need retained
  * history to re-derive t2/t3 — that is a reprocessing concern, not a
  * state-maintenance one). Under that ordering every state field is a
  * `least()` of its old value and a batch minimum, which makes the
  * merge IDEMPOTENT — re-applying the same batch converges to the same
  * state, the property the crash-retry spec pins. The cascade is
  * computed sequentially inside one merge (t2 candidates qualify
  * against the MERGED t1, t3 against the MERGED t2), so a view, its
  * click, and the purchase may all arrive in one batch.
  *
  * Exactly-once discipline is the package standard: per-batch marker +
  * in-state batchId via [[VersionedState]], one table behind one
  * atomically-swapped pointer.
  *
  * Scale shape: per batch, three filtered min-aggregates over the
  * batch (map-side combined, hash-partitioned by user_id) full-outer
  * merged with the state table on user_id — O(batch + |users|) per
  * trigger, never a re-read of history.
  */
object FunnelStream {

  private val WindowUs = 24L * 3600 * 1000000 // 24 h in µs

  private def emptyState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Option[Long], Option[Long], Option[Long])]
      .toDF("user_id", "t1", "t2", "t3")
  }

  def readState(spark: SparkSession, stateDir: String): DataFrame =
    new VersionedState(stateDir).read(spark, "funnel")
      .getOrElse(emptyState(spark))

  /** Merge one event-time-ordered micro-batch into the funnel state.
    * Events must carry (user_id, event_type, ts). Idempotent per batch
    * content; marker-guarded per batchId. */
  def mergeBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
      batchId: Long): Unit = {
    val state = new VersionedState(stateDir)
    if (state.isApplied(batchId)) return
    val prev = readState(spark, stateDir)

    val us = unix_micros(col("ts"))
    def evs(tpe: String) = batch.filter(col("event_type") === tpe)
      .select(col("user_id"), us.as("e"))

    // each stage QUALIFIES batch events against the merged anchor of
    // the previous stage BEFORE taking the min — aggregating first
    // would let a batch's earliest (unqualifying, e.g. pre-view) click
    // shadow a later qualifying one
    val t1n = prev.select(col("user_id"), col("t1"), col("t2"), col("t3"))
      .join(evs("view").groupBy(col("user_id")).agg(min(col("e")).as("bv")),
        Seq("user_id"), "full_outer")
      .withColumn("t1n", least(col("t1"), col("bv")))
    val t2n = t1n
      .join(evs("click"), Seq("user_id"), "left")
      .withColumn("cand",
        when(col("e") > col("t1n") &&
          col("e") <= col("t1n") + WindowUs, col("e")))
      .groupBy(col("user_id"), col("t1n"), col("t2"), col("t3"))
      .agg(min(col("cand")).as("bc"))
      .withColumn("t2n", least(col("t2"), col("bc")))
    val merged = t2n
      .join(evs("purchase"), Seq("user_id"), "left")
      .withColumn("cand",
        when(col("e") > col("t2n") &&
          col("e") <= col("t2n") + WindowUs, col("e")))
      .groupBy(col("user_id"), col("t1n"), col("t2n"), col("t3"))
      .agg(min(col("cand")).as("bp"))
      .withColumn("t3n", least(col("t3"), col("bp")))
      .select(col("user_id"), col("t1n").as("t1"), col("t2n").as("t2"),
        col("t3n").as("t3"))

    state.commit(Seq("funnel" -> merged), batchId)
    state.mark(batchId)
  }

  /** The maintained funnel report: per first-view cohort week, users at
    * each stage — the same shape as the batch q88 rollup. */
  def report(spark: SparkSession, stateDir: String): DataFrame = {
    val st = readState(spark, stateDir).filter(col("t1").isNotNull)
    st.withColumn("cohort_week",
        floor(datediff(to_date(timestamp_micros(col("t1"))),
          lit("1970-01-01")) / 7.0).cast("long"))
      .groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_view"),
        sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("n_click"),
        sum(when(col("t3").isNotNull, 1L).otherwise(0L)).as("n_purchase"))
      .withColumn("conv_click",
        round(col("n_click").cast("double") / col("n_view"), 4))
      .withColumn("conv_purchase",
        round(col("n_purchase").cast("double") / col("n_view"), 4))
      .orderBy(col("cohort_week"))
  }
}
