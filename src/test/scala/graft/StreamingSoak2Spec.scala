package graft

import graft.operators.{Analytics, Dedup, Embedding, Similarity}
import graft.sources.Tables
import graft.streaming.{CapStream, DedupIndexStream, FunnelStream,
  IvfIndexStream, MarkovStream, PqIndexStream}

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Second composed streaming soak — the maintainer families the first
  * soak (REST→shred→chunk → Search/Dedup/Phash) does not cover,
  * composed with kill/resume and an IN-SOAK index rebuild:
  *
  *  - [[CapStream]] (top-k admission margins — algebraic state),
  *  - [[FunnelStream]] (least()-merge anchors + cascade windows),
  *  - [[MarkovStream]] (additive counts + boundary stitching margins —
  *    the enforced time-monotonic contract means its shards are
  *    event-time slices while the others replay out of order),
  *  - [[DedupIndexStream]] with a MID-SOAK [[DedupIndexStream.rebuild]]
  *    on the LIVE checkpoint (IndexRebuildSpec proves the swap in
  *    isolation; here it happens mid-traffic, between the kill point
  *    and the resume, and the resume must merge against the REBUILT
  *    snapshot),
  *  - [[IvfIndexStream]] (the similarity family's cell index),
  *  - [[PqIndexStream]] (round 16 — the LAST ANN lane's maintainer:
  *    its first half arrives SEEDLESS so every row parks, and the
  *    second half pins the model trained on everything arrived).
  *
  * Every index must end ≡ its batch twin over the SAME final corpus
  * from the SAME shared kernels — six state-algebra classes (top-k,
  * least-merge, additive+margin, LWW band index, pinned-centroid
  * assignment, pinned-codebook encoding) surviving interleaved kills,
  * a crash-retry, and a rebuild swap in one run. */
class StreamingSoak2Spec extends SparkSuite {

  import spark.implicits._

  test("6-maintainer soak: kill/resume, crash-retry, in-soak rebuild") {
    val docs = Tables.documents(spark, sfDir)
    val events = Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value",
        $"props")
    val embs = Tables.embeddings(spark, sfDir)

    // ---- shard layouts per contract: docs replay OUT of order (6
    // residue shards, reverse), events replay in event-time sextiles
    // (Markov's enforced ordering contract), embeddings lead with the
    // centroid-eligible shard (the pinned seed set == batch q44's)
    val capIn = Files.createTempDirectory("graft_soak2_cap_").toString
    val dedupIn = Files.createTempDirectory("graft_soak2_dd_").toString
    val mkvIn = Files.createTempDirectory("graft_soak2_mkv_").toString
    val ivfIn = Files.createTempDirectory("graft_soak2_ivf_").toString
    val pqIn = Files.createTempDirectory("graft_soak2_pq_").toString
    def shardDocs(dir: String, residues: Seq[Int]): Unit =
      residues.foreach { r =>
        docs.filter($"doc_id" % 6 === r).coalesce(1)
          .write.mode("append").parquet(dir)
      }
    val ts = events.select($"ts").distinct().orderBy($"ts").collect()
      .map(_.getTimestamp(0))
    def sextile(k: Int) = ts(k * ts.length / 6)
    def eventSlice(k: Int) = {
      val lo = sextile(k)
      if (k == 5) events.filter($"ts" >= lo)
      else events.filter($"ts" >= lo && $"ts" < sextile(k + 1))
    }

    val capState = Files.createTempDirectory("graft_soak2_cap_st_").toString
    val dedupState = Files.createTempDirectory("graft_soak2_dd_st_").toString
    val funnelState = Files.createTempDirectory("graft_soak2_fn_st_").toString
    val mkvState = Files.createTempDirectory("graft_soak2_mkv_st_").toString
    val ivfState = Files.createTempDirectory("graft_soak2_ivf_st_").toString
    val pqState = Files.createTempDirectory("graft_soak2_pq_st_").toString

    // ---- first half up to the kill point (3 of 6 shards each)
    shardDocs(capIn, Seq(5, 3, 1))
    shardDocs(dedupIn, Seq(5, 3, 1))
    (0 to 2).foreach(k => eventSlice(k).coalesce(1)
      .write.mode("append").parquet(mkvIn))
    embs.filter($"vec_id" % 40 === 0).coalesce(1)
      .write.mode("append").parquet(ivfIn)
    embs.filter($"vec_id" % 40 =!= 0 && $"vec_id" % 2 === 1).coalesce(1)
      .write.mode("append").parquet(ivfIn)
    CapStream.maintain(spark, capIn, capState).awaitTermination()
    DedupIndexStream.maintain(spark, dedupIn, dedupState).awaitTermination()
    MarkovStream.maintain(spark, mkvIn, mkvState).awaitTermination()
    IvfIndexStream.maintain(spark, ivfIn, ivfState).awaitTermination()
    // PQ first half: odd non-seed vec_ids only (the seed rule is
    // vec_id < 16) — no model can pin, so every row PARKS unencoded
    embs.filter($"vec_id" >= 16 && $"vec_id" % 2 === 1).coalesce(1)
      .write.mode("append").parquet(pqIn)
    PqIndexStream.maintain(spark, pqIn, pqState).awaitTermination()
    (0 to 2).foreach(k =>
      FunnelStream.mergeBatch(spark, funnelState,
        eventSlice(k).select($"user_id", $"event_type", $"ts"), k.toLong))

    // ---- crash-retry at the kill point: batchId 0 redelivered to all
    // five — marker short-circuits make every one a no-op
    val midPairs = DedupIndexStream.readState(spark, dedupState)._3.count()
    val midCap = CapStream.report(spark, capState).collect().toSeq
    val midMkv = MarkovStream.report(spark, mkvState).collect().toSeq
    val midFunnel = FunnelStream.report(spark, funnelState).collect().toSeq
    assert(DedupIndexStream.mergeBatch(
      spark.read.parquet(dedupIn).limit(3), dedupState, 0L) == -1L)
    assert(!IvfIndexStream.mergeBatch(embs.limit(3), ivfState, 0L).applied)
    assert(!PqIndexStream.mergeBatch(embs.limit(3), pqState, 0L).applied)
    CapStream.mergeBatch(spark.read.parquet(capIn).limit(3), capState, 0L)
    MarkovStream.mergeBatch(eventSlice(0), mkvState, 0L)
    FunnelStream.mergeBatch(spark, funnelState,
      eventSlice(0).select($"user_id", $"event_type", $"ts"), 0L)
    assert(DedupIndexStream.readState(spark, dedupState)._3.count() == midPairs)
    assert(CapStream.report(spark, capState).collect().toSeq == midCap)
    assert(MarkovStream.report(spark, mkvState).collect().toSeq == midMkv)
    assert(FunnelStream.report(spark, funnelState).collect().toSeq == midFunnel)

    // ---- IN-SOAK REBUILD on the live checkpoint: single-shot state
    // from exactly the arrived docs swaps in mid-traffic as a no-op...
    DedupIndexStream.rebuild(
      docs.filter($"doc_id" % 2 === 1), // residues {5,3,1} mod 6 = odd ids
      dedupState, -1L)
    assert(DedupIndexStream.readState(spark, dedupState)._3.count() == midPairs)

    // ---- ...and the resume merges against the REBUILT snapshot
    shardDocs(capIn, Seq(4, 2, 0))
    shardDocs(dedupIn, Seq(4, 2, 0))
    (3 to 5).foreach(k => eventSlice(k).coalesce(1)
      .write.mode("append").parquet(mkvIn))
    embs.filter($"vec_id" % 40 =!= 0 && $"vec_id" % 2 === 0).coalesce(1)
      .write.mode("append").parquet(ivfIn)
    // PQ second half: everything else, INCLUDING the 16 seeds — the
    // model pins here, trained on the full arrived corpus (= the whole
    // table), so the final report must equal batch q96 with no rebuild
    embs.filter($"vec_id" < 16 || $"vec_id" % 2 === 0).coalesce(1)
      .write.mode("append").parquet(pqIn)
    CapStream.maintain(spark, capIn, capState).awaitTermination()
    DedupIndexStream.maintain(spark, dedupIn, dedupState).awaitTermination()
    MarkovStream.maintain(spark, mkvIn, mkvState).awaitTermination()
    IvfIndexStream.maintain(spark, ivfIn, ivfState).awaitTermination()
    PqIndexStream.maintain(spark, pqIn, pqState).awaitTermination()
    (3 to 5).foreach(k =>
      FunnelStream.mergeBatch(spark, funnelState,
        eventSlice(k).select($"user_id", $"event_type", $"ts"), k.toLong))

    // ---- batch twins over the SAME final corpus, SAME kernels
    assert(CapStream.report(spark, capState).collect().toSeq ==
      Embedding.q121DomainCap(spark, sfDir).collect().toSeq)
    assert(FunnelStream.report(spark, funnelState).collect().toSeq ==
      Analytics.q88Funnel(spark, sfDir).collect().toSeq)
    assert(MarkovStream.report(spark, mkvState).collect().toSeq ==
      Analytics.q130MarkovTransitions(spark, sfDir).collect().toSeq)
    assert(IvfIndexStream.report(spark, ivfState).collect().toSeq ==
      Similarity.queries("q44_sim_ivf_ann")(spark, sfDir).collect().toSeq)
    assert(PqIndexStream.report(spark, pqState).collect().toSeq ==
      Similarity.queries("q96_pq_ann")(spark, sfDir).collect().toSeq)

    val wide = Dedup.minhashWide(docs)
    val bands = Dedup.lshBands(wide)
    val twinDedup = bands.as("x")
      .join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.bkey" === $"y.bkey" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b")).distinct()
      .join(wide.as("a"), $"doc_a" === $"a.doc_id")
      .join(wide.as("b"), $"doc_b" === $"b.doc_id")
      .select($"doc_a", $"doc_b",
        round(Dedup.signatureMatchFraction, 6).as("est_sim"))
    val streamDedup = DedupIndexStream.readState(spark, dedupState)._3
    assert(streamDedup.count() > midPairs, "resume must add cross-half pairs")
    assert(streamDedup.except(twinDedup).isEmpty &&
      twinDedup.except(streamDedup).isEmpty)
  }
}
