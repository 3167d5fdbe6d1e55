package graft

import graft.operators.Similarity
import graft.sources.Tables
import graft.streaming.PqIndexStream

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming PQ index ≡ batch q96 — the LAST ANN lane to gain the
  * incremental lifecycle (merge → reconstruction-drift signal → tested
  * rebuild → live-checkpoint swap), mirroring IvfIndexStreamSpec:
  *  - a full replay trains the pinned model on exactly the corpus
  *    batch q96 trains on, so the maintained report equals the graded
  *    query EXACTLY (shared train/encode/ADC kernels — ranking cannot
  *    diverge);
  *  - a mid-stream rebuild from exactly the arrived corpus is
  *    observationally a no-op, and a resume on the live checkpoint
  *    consumes only new files;
  *  - seed-less cold start PARKS rows (never scores, never drops);
  *    the first seed-carrying batch trains on everything arrived, and
  *    the report converges to q96 with no rebuild needed;
  *  - a distribution shift on new arrivals raises the reconstruction
  *    drift ratio past the WARN threshold, and the rebuild the signal
  *    asks for retrains + re-encodes under one pointer swap. */
class PqIndexStreamSpec extends SparkSuite {

  import spark.implicits._

  private def embs = Tables.embeddings(spark, sfDir)

  test("full replay ≡ batch q96; mid-stream rebuild no-op; clean resume") {
    val inDir = Files.createTempDirectory("graft_pq_in_").toString
    val stateDir = Files.createTempDirectory("graft_pq_st_").toString
    embs.coalesce(1).write.mode("append").parquet(inDir)
    PqIndexStream.maintain(spark, inDir, stateDir).awaitTermination()

    val batch = Similarity.queries("q96_pq_ann")(spark, sfDir)
      .collect().toSeq
    assert(batch.nonEmpty)
    assert(PqIndexStream.report(spark, stateDir).collect().toSeq == batch)

    // mid-stream rebuild from exactly the arrived corpus: no-op swap
    PqIndexStream.rebuild(spark, stateDir, -1L)
    assert(PqIndexStream.report(spark, stateDir).collect().toSeq == batch)

    // resume with no new files: nothing replays
    PqIndexStream.maintain(spark, inDir, stateDir).awaitTermination()
    assert(PqIndexStream.report(spark, stateDir).collect().toSeq == batch)
  }

  test("two maintained indexes compose into the IVF-PQ face ≡ batch q159") {
    // the composed query lane: probe cells from the INCREMENTAL IVF
    // index, ADC within from the INCREMENTAL PQ index — neither
    // rebuilt, same kernels as batch q159, exact equality
    val ivfIn = Files.createTempDirectory("graft_pqivf_a_").toString
    val ivfState = Files.createTempDirectory("graft_pqivf_ast_").toString
    val pqIn = Files.createTempDirectory("graft_pqivf_b_").toString
    val pqState = Files.createTempDirectory("graft_pqivf_bst_").toString
    // IVF: centroid-eligible shard first (pins batch q44's seed set)
    embs.filter($"vec_id" % 40 === 0).coalesce(1)
      .write.mode("append").parquet(ivfIn)
    graft.streaming.IvfIndexStream.maintain(spark, ivfIn, ivfState)
      .awaitTermination()
    embs.filter($"vec_id" % 40 =!= 0).coalesce(1)
      .write.mode("append").parquet(ivfIn)
    graft.streaming.IvfIndexStream.maintain(spark, ivfIn, ivfState)
      .awaitTermination()
    // PQ: full corpus in one batch (pins batch q96's training corpus)
    embs.coalesce(1).write.mode("append").parquet(pqIn)
    PqIndexStream.maintain(spark, pqIn, pqState).awaitTermination()

    val batch = Similarity.queries("q159_ivf_pq_ann")(spark, sfDir)
      .collect().toSeq
    assert(batch.nonEmpty)
    assert(PqIndexStream.ivfPqReport(spark, ivfState, pqState)
      .collect().toSeq == batch)
  }

  test("seedless parking, train-on-arrival ≡ q96, drift WARN + rebuild") {
    val stateDir = Files.createTempDirectory("graft_pq_drift_").toString
    // batch 0 carries NO seed (vec_id < 16): everything parks
    val s0 = PqIndexStream.mergeBatch(
      embs.filter($"vec_id" >= 16), stateDir, 0L)
    assert(s0.nParked > 0 && s0.baseMeanRecon == 0.0,
      s"seedless batch must park, not encode: $s0")
    intercept[IllegalArgumentException](
      PqIndexStream.report(spark, stateDir)) // no model yet — named error

    // batch 1 carries the seeds: the model pins, trained on EVERYTHING
    // arrived (batch + parked residue) — which is now the full table,
    // so the report equals the graded batch query with no rebuild
    val s1 = PqIndexStream.mergeBatch(
      embs.filter($"vec_id" < 16), stateDir, 1L)
    assert(s1.baseMeanRecon > 0.0 && s1.nParked == 0)
    val batch = Similarity.queries("q96_pq_ann")(spark, sfDir)
      .collect().toSeq
    assert(PqIndexStream.report(spark, stateDir).collect().toSeq == batch)

    // batch 2: a shifted distribution (scaled copies under ghost ids)
    // — reconstruction error balloons under the pinned model and the
    // drift ratio crosses the WARN threshold
    val ghosts = embs.select(($"vec_id" + 100000L).as("vec_id"),
      transform($"embedding", x => x * lit(5.0f)).as("embedding"),
      $"label")
    val s2 = PqIndexStream.mergeBatch(ghosts, stateDir, 2L)
    assert(s2.driftRatio > 2.0,
      s"a 5x-scaled batch must blow past the drift threshold: $s2")

    // an already-applied batch returns the sentinel and changes nothing
    assert(!PqIndexStream.mergeBatch(embs.limit(3), stateDir, 2L).applied)

    // the rebuild the signal asks for: retrain over the full arrived
    // corpus — the baseline absorbs the shift, everything re-encodes
    val baseBefore = s2.baseMeanRecon
    PqIndexStream.rebuild(spark, stateDir, -2L)
    val (books, codes, meta) = PqIndexStream.readState(spark, stateDir)
    assert(books.nonEmpty && meta.exists(_._1 > baseBefore),
      "rebuild must retrain the baseline over the shifted corpus")
    assert(codes.filter($"c0" < 0).isEmpty, "nothing stays parked")
    // post-rebuild merges still apply (the preserved batch record keeps
    // the stream id space monotonic)
    val s3 = PqIndexStream.mergeBatch(
      embs.limit(0), stateDir, 3L) // empty batch: applied, no-op
    assert(s3.applied)
  }
}
