package graft

import graft.operators.Embedding
import graft.sources.Tables
import graft.streaming.CapStream

import java.nio.file.Files

/** Streaming cap ≡ batch cap: replay the documents fixture in 3
  * micro-batches arriving OUT of doc_id order; the accumulated report
  * must equal q121's single-shot run (admission is by score, not
  * arrival). Also pins the class-defining properties: state stays
  * bounded at sources × cap, the top-k margin absorbs a genuine
  * re-merge by algebra, and the additive totals margin does NOT — the
  * documented input contract, asserted rather than hand-waved. */
class CapStreamSpec extends SparkSuite {

  test("out-of-order 3-batch replay reproduces the batch q121 report") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val inDir = Files.createTempDirectory("graft_cap_in_").toString
    // reverse shard order: high doc_ids (the tie-break losers) first
    for (r <- Seq(2, 1, 0))
      docs.filter($"doc_id" % 3 === r).coalesce(1)
        .write.mode("append").parquet(inDir)

    val stateDir = Files.createTempDirectory("graft_cap_state_").toString
    CapStream.maintain(spark, inDir, stateDir).awaitTermination()

    val batchReport = Embedding.q121DomainCap(spark, sfDir).collect().toSeq
    val streamReport = CapStream.report(spark, stateDir).collect().toSeq
    assert(streamReport == batchReport)

    // bounded-state guarantee: the admission margin holds at most
    // cap rows per source no matter how much streamed past
    val (_, top) = CapStream.readState(spark, stateDir)
    val nSources = docs.select($"source").distinct().count()
    assert(top.count() <= nSources * Embedding.DomainCap)
    assert(top.groupBy($"source").count()
      .filter($"count" > Embedding.DomainCap).isEmpty)

    // resume with no new files: nothing replays
    CapStream.maintain(spark, inDir, stateDir).awaitTermination()
    assert(CapStream.report(spark, stateDir).collect().toSeq == batchReport)

    // re-application under a FRESH batchId (both replay guards
    // bypassed): the top-k margin must absorb it by algebra — kept
    // set, kept mass and cutoff unmoved — while the additive totals
    // margin inflates, which is exactly the documented contract
    // violation mode (duplicate doc_ids across batches)
    val b2 = spark.read.parquet(inDir).filter($"doc_id" % 3 === 2)
    val dupDocs = b2.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    CapStream.mergeBatch(b2, stateDir, 50L)
    val after = CapStream.report(spark, stateDir).collect().toSeq
    val by
      : Map[String, org.apache.spark.sql.Row] =
      after.map(r => r.getAs[String]("source") -> r).toMap
    batchReport.foreach { r =>
      val src = r.getAs[String]("source")
      val a = by(src)
      assert(a.getAs[Long]("n_kept") == r.getAs[Long]("n_kept"), src)
      assert(a.getAs[Long]("kept_chars") == r.getAs[Long]("kept_chars"), src)
      assert(a.getAs[Long]("cutoff_score") ==
        r.getAs[Long]("cutoff_score"), src)
      assert(a.getAs[Long]("n_docs") ==
        r.getAs[Long]("n_docs") + dupDocs.getOrElse(src, 0L), src)
    }
  }

  test("crash between pointer swap and applied-marker: retry is a no-op") {
    import spark.implicits._
    // CapStream's totals margin is ADDITIVE — the one margin that is
    // exactly-once only because of the batchId backstop. Simulate the
    // crash window the backstop closes: state committed, the per-batch
    // marker (written after commit) lost; the streaming retry of the
    // same batchId must fold NOTHING.
    val docs = Tables.documents(spark, sfDir)
    val b0 = docs.filter($"doc_id" % 2 === 0)
    val b1 = docs.filter($"doc_id" % 2 === 1)
    val stateDir = Files.createTempDirectory("graft_cap_crash_").toString
    CapStream.mergeBatch(b0, stateDir, 0L)
    CapStream.mergeBatch(b1, stateDir, 1L)
    val want = CapStream.report(spark, stateDir).collect().toSeq
    val marker = java.nio.file.Paths.get(s"$stateDir/_applied_1")
    assert(Files.exists(marker))
    Files.delete(marker)
    CapStream.mergeBatch(b1, stateDir, 1L) // retry
    assert(CapStream.report(spark, stateDir).collect().toSeq == want,
      "retry after a swap-then-crash double-applied the additive totals")
    assert(Files.exists(marker), "recovered retry must re-mark its batch")
  }
}
