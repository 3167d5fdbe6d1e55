package graft

import graft.operators.Similarity
import graft.sources.Tables
import graft.streaming.IvfIndexStream

import java.nio.file.Files

/** Streaming IVF index ≡ batch q44 — the similarity family's entry in
  * the incremental-index lifecycle (stream + drift signal + tested
  * rebuild + live-checkpoint swap), mirroring the dedup family's
  * DedupIndexStreamSpec/IndexRebuildSpec contracts:
  *  - a sharded replay whose FIRST shard carries every centroid-eligible
  *    vector pins the same seed set as batch q44, so the maintained
  *    report equals q44 exactly (assignment is per-vector deterministic
  *    against pinned centroids — arrival order cannot matter);
  *  - a mid-stream rebuild from exactly the arrived corpus is
  *    observationally a no-op, and resume on the live checkpoint merges
  *    against the rebuilt snapshot to land ≡ q44 over everything;
  *  - when centroids arrive LATE, the drift signal counts exactly the
  *    eligible-but-unpinned vectors (the seeds the batch twin would
  *    use), and [[IvfIndexStream.rebuild]] re-seeds + reassigns so the
  *    report converges to q44. */
class IvfIndexStreamSpec extends SparkSuite {

  import spark.implicits._

  private def embs = Tables.embeddings(spark, sfDir)

  test("seeded replay + mid-stream rebuild no-op + resume ≡ batch q44") {
    val inDir = Files.createTempDirectory("graft_ivf_in_").toString
    val stateDir = Files.createTempDirectory("graft_ivf_st_").toString
    // shard 1: ALL centroid-eligible vectors → the pinned seed set is
    // exactly batch q44's (every 40th vec_id)
    embs.filter($"vec_id" % 40 === 0).coalesce(1)
      .write.mode("append").parquet(inDir)
    IvfIndexStream.maintain(spark, inDir, stateDir).awaitTermination()

    // mid-stream rebuild on the LIVE checkpoint from exactly the
    // arrived vectors: the swap must change nothing observable
    val before = IvfIndexStream.report(spark, stateDir).collect().toSeq
    IvfIndexStream.rebuild(spark, stateDir, -1L) // negative: outside id space
    assert(IvfIndexStream.report(spark, stateDir).collect().toSeq == before)

    // resume: the rest arrives in reverse residue order (arrival order
    // must not matter); the checkpoint consumes only the new files
    for (r <- Seq(2, 1, 0))
      embs.filter($"vec_id" % 40 =!= 0 && $"vec_id" % 3 === r).coalesce(1)
        .write.mode("append").parquet(inDir)
    IvfIndexStream.maintain(spark, inDir, stateDir).awaitTermination()

    val batch = Similarity.queries("q44_sim_ivf_ann")(spark, sfDir)
      .collect().toSeq
    assert(batch.nonEmpty)
    assert(IvfIndexStream.report(spark, stateDir).collect().toSeq == batch)

    // resume with no new files: nothing replays
    IvfIndexStream.maintain(spark, inDir, stateDir).awaitTermination()
    assert(IvfIndexStream.report(spark, stateDir).collect().toSeq == batch)
  }

  test("late centroids raise the drift signal; rebuild converges to q44") {
    val stateDir = Files.createTempDirectory("graft_ivf_drift_").toString
    val eligible = embs.filter($"vec_id" % 40 === 0)
    val nEligible = eligible.count()
    assert(nEligible >= 2, "fixture must carry 2+ eligible vectors")
    val firstCid = eligible.agg(org.apache.spark.sql.functions.min($"vec_id"))
      .first().getLong(0)

    // batch 0 carries NO eligible vector: everything parks at cell −1
    val s0 = IvfIndexStream.mergeBatch(
      embs.filter($"vec_id" % 40 =!= 0 && $"vec_id" % 2 === 1), stateDir, 0L)
    assert(s0.nCentroids == 0 && s0.missingCentroids == 0)
    assert(IvfIndexStream.readState(spark, stateDir)._2
      .filter($"cell" =!= -1L).isEmpty, "nothing may be assigned seedless")

    // batch 1 carries ONE eligible vector: the pin happens now, and the
    // signal is still clean (no eligible vector is outside the pin)
    val s1 = IvfIndexStream.mergeBatch(
      embs.filter($"vec_id" === firstCid), stateDir, 1L)
    assert(s1.nCentroids == 1 && s1.missingCentroids == 0)

    // batch 2: every remaining vector, including all other eligible
    // ones — each is a seed the batch twin would use but we lack
    val s2 = IvfIndexStream.mergeBatch(
      embs.filter($"vec_id" =!= firstCid &&
        ($"vec_id" % 40 === 0 || $"vec_id" % 2 === 0)), stateDir, 2L)
    assert(s2.missingCentroids == nEligible - 1,
      s"drift must count exactly the unpinned eligible vectors: $s2")
    assert(s2.missingFrac > 0.25, "the WARN threshold must have fired")

    // an already-applied batch returns the sentinel and changes nothing
    assert(!IvfIndexStream.mergeBatch(
      embs.limit(3), stateDir, 2L).applied)

    // the rebuild the signal asks for: re-seed + reassign ⇒ ≡ q44
    IvfIndexStream.rebuild(spark, stateDir, -2L)
    val batch = Similarity.queries("q44_sim_ivf_ann")(spark, sfDir)
      .collect().toSeq
    assert(IvfIndexStream.report(spark, stateDir).collect().toSeq == batch)
    // post-rebuild state is drift-free: every eligible vector is pinned
    val (cent, assign) = IvfIndexStream.readState(spark, stateDir)
    assert(cent.count() == nEligible)
    assert(assign.filter($"cell" === -1L).isEmpty)
  }
}
