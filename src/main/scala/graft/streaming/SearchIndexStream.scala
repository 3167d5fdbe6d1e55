package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}


/** Incrementally-maintained search-index statistics — the engine's
  * faithful form of the reference's `CORTEX SEARCH SERVICE ... TARGET_LAG
  * '1 minute'` (`epa_ingestion.py:838-865`): as new documents arrive, the
  * BM25 index-side statistics (per-token document frequency, per-doc
  * length) are upserted within the trigger interval, instead of the whole
  * index being rebuilt.
  *
  * Exactly-once discipline (the additive df merge is NOT naturally
  * idempotent, so every piece matters):
  *  - the streaming checkpoint lives at a STABLE location inside the
  *    state dir — a re-run resumes from the last committed offset and
  *    only ever sees new files, never a full replay;
  *  - BOTH state tables live in ONE versioned directory behind a single
  *    atomically-replaced CURRENT pointer: a crash at any instant leaves
  *    the composite state either fully old or fully new — never one
  *    table updated without the other (the D6 transaction analog). A
  *    retry before the swap recomputes from the old state; a retry after
  *    the swap sees every batch doc already indexed, so the first-writer-
  *    wins anti-join yields an empty delta and nothing double-counts;
  *  - each fully-applied batch is sealed by a batchId marker.
  *
  * First-writer-wins: a doc_id already indexed (or repeated within one
  * batch) contributes nothing — documents are immutable in the reference
  * (PDFs; MERGE dedupes on key), and the additive merge would otherwise
  * double-count a re-arrival the checkpoint can't catch (same id in a
  * NEW file).
  *
  * Scale notes: each micro-batch shuffles only the batch's tokens (Δ),
  * never the corpus; the state tables are hash-partitionable by token /
  * doc_id. Trigger interval == TARGET_LAG.
  */
object SearchIndexStream {

  // composite versioned state (single pointer over both tables) — the
  // shared machinery lives in [[VersionedState]]

  /** Read current state (empty frames before the first commit). */
  def readState(spark: SparkSession, stateDir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val state = new VersionedState(stateDir)
    (state.read(spark, "token_stats")
      .getOrElse(Seq.empty[(String, Long)].toDF("token", "df")),
      state.read(spark, "doc_stats")
        .getOrElse(Seq.empty[(Long, Long)].toDF("doc_id", "dl")))
  }

  /** Merge one micro-batch of new documents into the state (additive df,
    * union dl). Idempotent per batchId AND under partial-crash retries
    * (see the object doc): the first-writer-wins anti-join already makes
    * a post-swap replay a no-op delta, and VersionedState's in-state
    * batchId short-circuits it outright. */
  def mergeBatch(batch: DataFrame, stateDir: String, batchId: Long): Unit = {
    val state = new VersionedState(stateDir)
    if (state.isApplied(batchId)) { state.mark(batchId); return }
    val spark = batch.sparkSession
    val (tok, doc) = readState(spark, stateDir)
    // checkpointed so the commits below can't lazily re-read a deleted
    // state version, and so the anti-join snapshot is pinned; released
    // before returning — a long-lived stream would otherwise pin one
    // dead frame per micro-batch (the BENCH_r10 leak class)
    val (fresh, freeFresh) = graft.tools.Checkpoints.tracked(
      batch.dropDuplicates("doc_id")
        .join(doc.select(col("doc_id")), Seq("doc_id"), "left_anti"))
    try {
      if (fresh.isEmpty) { // duplicate-only batch: state already covers it
        state.mark(batchId)
        return
      }
      val toks = fresh.select(col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      val dTok = toks.select(col("doc_id"), col("token")).distinct()
        .groupBy("token").agg(count(lit(1)).as("df"))
      val dDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val newTok = tok.unionByName(dTok)
        .groupBy("token").agg(sum("df").as("df"))
      val newDoc = doc.unionByName(dDoc)
        .groupBy("doc_id").agg(sum("dl").as("dl"))
      // commit WRITES both tables (an action), so nothing lazy outlives
      // the checkpoint once it returns
      state.commit(Seq("token_stats" -> newTok, "doc_stats" -> newDoc), batchId)
      state.mark(batchId)
    } finally freeFresh()
  }

  /** Run the maintenance query over a document stream (micro-batched via
    * maxFilesPerTrigger), updating `stateDir` per batch. The checkpoint
    * is stable under stateDir, so repeated invocations RESUME (consume
    * only newly arrived files) rather than replaying the corpus. */
  def maintain(spark: SparkSession, inDir: String, stateDir: String):
      StreamingQuery = {
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, stateDir, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .start()
  }
}
