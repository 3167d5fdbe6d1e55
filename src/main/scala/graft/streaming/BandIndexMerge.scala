package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE copy of the incremental band-index merge kernel, shared by
  * [[DedupIndexStream]] (text MinHash → LSH bands → est_sim pairs) and
  * [[PhashIndexStream]] (image aHash → Hamming bands → exact-distance
  * pairs). Previously two near-verbatim copies that had already
  * diverged on cache-release and guard details (review find — the
  * same fix-it-twice failure mode the pairExpansion consolidation in
  * Dedup.scala records).
  *
  * Semantics (identical for both instantiations):
  *  - last-writer-wins replacement: a re-arriving doc_id REPLACES its
  *    signature row and all band rows (anti-join keeps only non-batch
  *    history) — signature and band state can never mix two versions
  *    of one document;
  *  - probe: batch bands against the POST-replacement band set — each
  *    new doc meets the whole current-version history through the
  *    bucket equi-join, never a scan; per trigger the work is O(batch
  *    rows + matching buckets), the property that makes continuous
  *    dedup of a growing corpus feasible where the batch query is
  *    O(corpus) every run;
  *  - pairs are last-writer-wins too: every accumulated pair touching
  *    a batch doc_id is RETRACTED and recomputed from the new
  *    signatures via the probe, so a doc whose new content no longer
  *    collides with its old partners stops being marked their
  *    near-dup. The retained and recomputed sets are disjoint by
  *    construction (every new-pair key touches a batch doc; no
  *    retained key does), so plain union needs no re-aggregation;
  *  - all three tables commit under the caller's [[VersionedState]]
  *    single pointer — a crash at any instant leaves the composite
  *    fully old or fully new, never new pairs over old signatures;
  *  - rebuild signal: the incremental form intentionally carries no
  *    stop-bucket cap (a bucket crossing it mid-stream would retract
  *    already-emitted pairs), so the "reproduces the batch query
  *    exactly" contract holds only while no accumulated bucket crosses
  *    the batch cap. [[merge]] therefore RETURNS the post-commit max
  *    population among this batch's touched buckets (the only ones that
  *    can newly cross) and WARN-logs when it exceeds `capSignal` —
  *    the documented periodic batch rebuild is triggered by a signal,
  *    not discovered via divergence (advisor r14 find; probe work in a
  *    degenerate bucket also goes quadratic, so the signal doubles as
  *    the perf tripwire).
  */
private[streaming] object BandIndexMerge {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** @param current  (sigs, bands, pairs) state frames as read
    * @param dSigs    Δ signature frame (doc_id + signature columns),
    *                 intra-batch duplicate ids already collapsed
    * @param dBands   Δ band frame (doc_id, band, bkey) derived from dSigs
    * @param score    (candidate keys (doc_a, doc_b), merged signature
    *                 frame) → scored pairs (doc_a, doc_b, score column)
    * @param tables   state-table names for the commit
    * @param capSignal bucket population above which the rebuild signal
    *                 fires (the batch query's stop-bucket cap)
    * @return max population among the band buckets TOUCHED BY THIS
    *         BATCH, post-commit (0 for a batch adding no band rows) —
    *         > capSignal means the batch twin would now drop a bucket
    *         this index still probes and a batch rebuild is due. Only
    *         touched buckets can newly cross the cap (LWW retraction
    *         only shrinks the others), so the delta-scoped max raises
    *         the same alarm as a full-index max without aggregating
    *         the whole band table per trigger (review find: the first
    *         cut made every merge O(index) in shuffle work). */
  def merge(state: VersionedState, batchId: Long,
      current: (DataFrame, DataFrame, DataFrame),
      dSigs: DataFrame, dBands: DataFrame,
      score: (DataFrame, DataFrame) => DataFrame,
      tables: (String, String, String),
      capSignal: Int = graft.operators.Dedup.MaxShingleDf): Long = {
    val (sigs, bands, pairs) = current
    val dIds = dSigs.select(col("doc_id"))
    val allSigs = dSigs.unionByName(
      sigs.join(dIds, Seq("doc_id"), "left_anti"))
    val allBands = dBands.unionByName(
      bands.join(dIds, Seq("doc_id"), "left_anti"))
    val candKeys = dBands.as("x")
      .join(allBands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(
        least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()
    val newPairs = score(candKeys, allSigs)
    val retained = pairs
      .join(dIds.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"),
        "left_anti")
      .join(dIds.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"),
        "left_anti")
      .select(newPairs.columns.toSeq.map(col): _*)
    state.commit(Seq(tables._1 -> allSigs, tables._2 -> allBands,
      tables._3 -> retained.unionByName(newPairs)), batchId)
    // rebuild signal — computed from the WRITTEN band table (rather
    // than the pre-commit lineage, which would recompute the whole
    // anti-join) restricted to the buckets this batch touched: the
    // semi-join filters scan-side against the broadcast delta keys, so
    // the aggregation shuffles O(touched buckets), not O(index)
    val maxBucket = state.read(dBands.sparkSession, tables._2)
      .map { b =>
        val r = b.join(
            dBands.select(col("band"), col("bkey")).distinct(),
            Seq("band", "bkey"), "left_semi")
          .groupBy(col("band"), col("bkey")).count()
          .agg(max(col("count"))).first()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }.getOrElse(0L)
    if (maxBucket > capSignal) log.warn(
      s"band index '${tables._2}': max bucket population $maxBucket " +
        s"exceeds the batch stop-bucket cap $capSignal — the incremental " +
        "report can now diverge from its batch twin and probe work in " +
        "that bucket is quadratic; schedule a batch rebuild")
    maxBucket
  }

  /** The batch REBUILD the rebuild signal asks for — the drop-in swap
    * both index streams document, made an operation instead of a
    * sentence: recompute all three tables single-shot from the given
    * signatures (candidates = full band self-join, a < b, de-duplicated
    * — the batch form of the probe) and commit them under the SAME
    * single pointer the incremental merges use. Because the swap is one
    * atomic pointer replacement and the streaming checkpoint tracks
    * consumed FILES (not state versions), a maintainer resumed after a
    * rebuild merges new arrivals against the rebuilt snapshot with
    * every exactly-once guarantee intact (spec-pinned: stream →
    * rebuild → stream more ≡ one batch over everything).
    *
    * `batchId` must be outside the stream's id space (negative works:
    * foreachBatch ids count up from 0) so the rebuild's marker can
    * never make a future micro-batch replay think it already ran —
    * ENFORCED, and the committed `_batch` record keeps the MAX stream
    * batchId seen so far so the `appliedBatch >= batchId` crash-window
    * backstop survives the rebuild (the IvfIndexStream.rebuild
    * discipline, applied uniformly; advisor find, r15). */
  def rebuild(state: VersionedState, batchId: Long,
      allSigs: DataFrame, allBands: DataFrame,
      score: (DataFrame, DataFrame) => DataFrame,
      tables: (String, String, String)): Unit = {
    val candKeys = allBands.as("x")
      .join(allBands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    require(batchId < 0,
      s"rebuild batchId $batchId must be negative (outside the stream id space)")
    state.commit(Seq(tables._1 -> allSigs, tables._2 -> allBands,
      tables._3 -> score(candKeys, allSigs)),
      math.max(state.appliedBatch.getOrElse(-1L), batchId))
    state.mark(batchId)
  }
}
