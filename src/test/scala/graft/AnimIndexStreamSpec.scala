package graft

import graft.sources.Tables
import graft.streaming.AnimIndexStream

import java.nio.file.Files

/** Incremental animation near-dup index ≡ batch q166 over a sharded
  * replay: every canon's 4 re-encodes land in DIFFERENT doc_id % 3
  * residue classes (4c..4c+3 always span ≥ 3 residues), so every
  * surviving pair is discovered by the batch-vs-state bucket probe
  * across triggers, never within one. Also: resume no-op, re-arrival
  * convergence, multi-row LWW state bounds, rebuild equivalence. */
class AnimIndexStreamSpec extends SparkSuite {

  import spark.implicits._

  test("3-shard replay reproduces batch q166; re-arrival and rebuild converge") {
    val docs = Tables.documents(spark, sfDir).filter($"doc_id" < 120)
    val inDir = Files.createTempDirectory("graft_anim_in_").toString
    for (r <- Seq(1, 2, 0)) // arrival order must not matter
      docs.filter($"doc_id" % 3 === r).coalesce(1)
        .write.mode("append").parquet(inDir)

    val stateDir = Files.createTempDirectory("graft_anim_state_").toString
    AnimIndexStream.maintain(spark, inDir, stateDir).awaitTermination()

    val batch = graft.operators.Multimodal
      .q166AnimationNearDup(spark, sfDir)
      .filter($"doc_a" < 120 && $"doc_b" < 120).collect().toSeq
    val stream = AnimIndexStream.report(spark, stateDir).collect().toSeq
    assert(batch.nonEmpty && stream == batch)

    // bounded multi-row state: one frame row per distinct (doc, frame
    // hash), one bucket row each — 30 canons x nf frames x 4 variants
    val (frames, buckets, _) = AnimIndexStream.readState(spark, stateDir)
    val wantFrames = (0L until 30L)
      .map(c => 4 * (2 + c % 3)).sum
    assert(frames.count() == wantFrames)
    assert(buckets.count() == wantFrames)

    // resume with no new files: nothing replays
    AnimIndexStream.maintain(spark, inDir, stateDir).awaitTermination()
    assert(AnimIndexStream.report(spark, stateDir).collect().toSeq == batch)

    // re-arrival under a fresh batchId: frame SETS replace wholesale
    // (the multi-row LWW path) and the report converges unchanged
    val redo = spark.read.parquet(inDir).filter($"doc_id" % 3 === 2)
    val signal = AnimIndexStream.mergeBatch(redo, stateDir, 411L)
    assert(signal > 0) // touched buckets hold the canon's re-encodes
    assert(AnimIndexStream.report(spark, stateDir).collect().toSeq == batch)
    val (f2, b2, _) = AnimIndexStream.readState(spark, stateDir)
    assert(f2.count() == wantFrames && b2.count() == wantFrames)
    // already-applied batchId short-circuits
    assert(AnimIndexStream.mergeBatch(redo, stateDir, 411L) == -1L)

    // single-shot rebuild under the same pointer reproduces the report
    val rbDir = Files.createTempDirectory("graft_anim_rb_").toString
    AnimIndexStream.rebuild(docs, rbDir, -1L)
    assert(AnimIndexStream.report(spark, rbDir).collect().toSeq == batch)
  }
}
