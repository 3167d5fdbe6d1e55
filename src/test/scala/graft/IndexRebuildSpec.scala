package graft

import graft.operators.Dedup
import graft.sources.Tables
import graft.streaming.{DedupIndexStream, PhashIndexStream}

import java.nio.file.Files

/** The batch REBUILD the band-index rebuild signal asks for, proven to
  * be the drop-in swap the maintainers document: with a LIVE streaming
  * checkpoint mid-corpus, swapping in single-shot-recomputed state (a)
  * changes nothing observable when built from exactly the arrived
  * docs, and (b) leaves every resume guarantee intact — subsequent
  * micro-batches merge against the rebuilt snapshot and the final
  * index still equals the batch query over the full corpus. Without
  * this, "schedule a batch rebuild" (the WARN the signal emits past
  * the stop-bucket cap) would be advice with no tested operation
  * behind it. */
class IndexRebuildSpec extends SparkSuite {

  import spark.implicits._

  test("rebuild mid-stream is a no-op swap; resume stays ≡ batch (phash)") {
    val docs = Tables.documents(spark, sfDir)
    val inDir = Files.createTempDirectory("graft_rb_ph_in_").toString
    val stateDir = Files.createTempDirectory("graft_rb_ph_st_").toString
    // stream one residue class, then rebuild from EXACTLY the arrived
    // docs: the report must not change (the swap is semantics-neutral)
    docs.filter($"doc_id" % 3 === 2).coalesce(1)
      .write.mode("append").parquet(inDir)
    PhashIndexStream.maintain(spark, inDir, stateDir).awaitTermination()
    val before = PhashIndexStream.report(spark, stateDir).collect().toSeq
    PhashIndexStream.rebuild(docs.filter($"doc_id" % 3 === 2),
      stateDir, -1L) // negative id: outside the stream's batch space
    assert(PhashIndexStream.report(spark, stateDir)
      .collect().toSeq == before)
    // resume over the rest: the live checkpoint consumes only the new
    // files and merges against the REBUILT snapshot
    for (r <- Seq(1, 0))
      docs.filter($"doc_id" % 3 === r).coalesce(1)
        .write.mode("append").parquet(inDir)
    PhashIndexStream.maintain(spark, inDir, stateDir).awaitTermination()
    val batch = graft.operators.Multimodal
      .q136ImagePhashDedup(spark, sfDir).collect().toSeq
    assert(batch.nonEmpty)
    assert(PhashIndexStream.report(spark, stateDir).collect().toSeq == batch)
  }

  test("rebuild mid-stream is a no-op swap; resume stays ≡ batch (minhash)") {
    val docs = Tables.documents(spark, sfDir)
    val inDir = Files.createTempDirectory("graft_rb_dd_in_").toString
    val stateDir = Files.createTempDirectory("graft_rb_dd_st_").toString
    docs.filter($"doc_id" % 3 === 0).coalesce(1)
      .write.mode("append").parquet(inDir)
    DedupIndexStream.maintain(spark, inDir, stateDir).awaitTermination()
    val before = DedupIndexStream.readState(spark, stateDir)._3
      .orderBy($"doc_a", $"doc_b").collect().toSeq
    DedupIndexStream.rebuild(docs.filter($"doc_id" % 3 === 0),
      stateDir, -1L)
    assert(DedupIndexStream.readState(spark, stateDir)._3
      .orderBy($"doc_a", $"doc_b").collect().toSeq == before)
    for (r <- Seq(2, 1))
      docs.filter($"doc_id" % 3 === r).coalesce(1)
        .write.mode("append").parquet(inDir)
    DedupIndexStream.maintain(spark, inDir, stateDir).awaitTermination()
    val batch = Dedup.queries("q28_dedup_minhash_lsh")(spark, sfDir)
    val pairs = DedupIndexStream.readState(spark, stateDir)._3
    assert(pairs.count() == batch.count())
    assert(pairs.except(batch).isEmpty && batch.except(pairs).isEmpty)
  }
}
