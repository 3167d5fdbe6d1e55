package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The ONE copy of the incrementally-maintained FRAME-SET near-dup
  * index — the multi-row member of the incremental-index family
  * ([[DedupIndexStream]] text MinHash / [[PhashIndexStream]] image
  * aHash carry one signature per doc; here one document contributes a
  * frame-hash SET). Round 17 built it for animations
  * ([[AnimIndexStream]]); round 18 reuses it verbatim for multi-page
  * scanned documents ([[DocIndexStream]]) — the instantiations differ
  * ONLY in the hash core, so stream ≡ batch holds for both by the same
  * construction and a fix lands in both (the BandIndexMerge
  * consolidation lesson).
  *
  * As new documents arrive they are decoded+hashed ONCE (Δ work),
  * their per-frame hashes land in the `frames` table, candidates come
  * from probing the accumulated full-hash bucket index, and pairs
  * accumulate with exact frame-set Jaccard. Everything rides the
  * shared [[BandIndexMerge]] kernel, whose last-writer-wins
  * replacement is row-set based and therefore handles multi-row
  * signatures unchanged: a re-arriving doc_id replaces ALL its frame
  * rows, bucket rows, and accumulated pairs. The no-cap caveat and
  * rebuild signal are inherited: [[mergeBatch]] returns the post-merge
  * max bucket population among batch-touched buckets (full-hash
  * buckets make a cap crossing the genuine shared-blank-frame
  * degeneracy, not a pigeonhole artifact — the round-17 SCALE.md
  * finding).
  *
  * State tables (hash-partitionable at scale):
  *  - frames  (doc_id, fhash)        — 8 bytes per FRAME, ever
  *  - buckets (doc_id, band, bkey)   — one row per frame row
  *  - pairs   (doc_a, doc_b, n_common, sim) — accumulated candidates
  */
private[streaming] abstract class FrameSetIndex {

  /** The lane's hash core: (doc_id) → DISTINCT (doc_id, fhash) rows —
    * the SAME one-copy kernel the lane's batch query runs, so stream
    * hashing ≡ batch hashing by construction. */
  protected def hashFrame(docs: DataFrame): DataFrame

  /** The lane's scorer and presentation (shared with its batch query —
    * both instantiations use the Multimodal frame-set kernels). */
  protected def score(candKeys: DataFrame, allFh: DataFrame): DataFrame
  protected def bands(fh: DataFrame): DataFrame
  protected def present(pairs: DataFrame): DataFrame

  def readState(spark: SparkSession, stateDir: String):
      (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val state = new VersionedState(stateDir)
    (state.read(spark, "frames")
      .getOrElse(Seq.empty[(Long, Long)].toDF("doc_id", "fhash")),
      state.read(spark, "buckets")
        .getOrElse(Seq.empty[(Long, Int, Long)]
          .toDF("doc_id", "band", "bkey")),
      state.read(spark, "pairs")
        .getOrElse(Seq.empty[(Long, Long, Long, Double)]
          .toDF("doc_a", "doc_b", "n_common", "sim")))
  }

  /** The batch query's presentation face over the accumulated pairs
    * (one copy with the batch query). */
  def report(spark: SparkSession, stateDir: String): DataFrame = {
    val (_, _, pairs) = readState(spark, stateDir)
    present(pairs)
  }

  /** @return the [[BandIndexMerge]] rebuild signal (−1 for an
    *         already-applied batch): max post-merge population among
    *         the buckets this batch touched — above the batch cap
    *         means a genuinely degenerate shared frame. */
  def mergeBatch(batch: DataFrame, stateDir: String, batchId: Long): Long = {
    val state = new VersionedState(stateDir)
    if (state.isApplied(batchId)) { state.mark(batchId); return -1L }
    val spark = batch.sparkSession
    val dFrames = hashFrame(
      batch.select(col("doc_id")).dropDuplicates("doc_id")).cache()
    val signal =
      try BandIndexMerge.merge(state, batchId, readState(spark, stateDir),
        dFrames, bands(dFrames), score,
        ("frames", "buckets", "pairs"))
      finally dFrames.unpersist(blocking = false)
    state.mark(batchId)
    signal
  }

  /** Single-shot batch rebuild under the same pointer (`batchId` must
    * be negative — outside the stream's id space). */
  def rebuild(docs: DataFrame, stateDir: String, batchId: Long): Unit = {
    val state = new VersionedState(stateDir)
    val frames = hashFrame(
      docs.select(col("doc_id")).dropDuplicates("doc_id")).cache()
    try BandIndexMerge.rebuild(state, batchId, frames,
      bands(frames), score,
      ("frames", "buckets", "pairs"))
    finally frames.unpersist(blocking = false)
  }

  /** Maintain the index over a document stream; stable checkpoint so
    * repeated invocations resume, not replay. */
  def maintain(spark: SparkSession, inDir: String, stateDir: String):
      StreamingQuery = {
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, stateDir, batchId): Unit
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .start()
  }
}
