package graft

import graft.operators.Dedup
import graft.sources.Tables
import graft.streaming.NoveltyStream

import java.nio.file.Files

/** Streaming novelty ≡ batch novelty: replay the documents fixture in 3
  * micro-batches ARRIVING OUT OF doc_id ORDER; the accumulated report
  * must equal q114's single-shot run (attribution is by min doc_id, not
  * arrival, so order cannot matter). Resume, marker-less retry, and
  * doc re-arrival must all leave the state unchanged. */
class NoveltyStreamSpec extends SparkSuite {

  test("out-of-order 3-batch replay reproduces the batch q114 report") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val inDir = Files.createTempDirectory("graft_nov_in_").toString
    // reverse shard order: highest doc_ids arrive FIRST, so arrival
    // order actively disagrees with attribution order
    for (r <- Seq(2, 1, 0))
      docs.filter($"doc_id" % 3 === r).coalesce(1)
        .write.mode("append").parquet(inDir)

    val stateDir = Files.createTempDirectory("graft_nov_state_").toString
    NoveltyStream.maintain(spark, inDir, stateDir).awaitTermination()

    val batchReport = Dedup.q114SourceNovelty(spark, sfDir).collect().toSeq
    val streamReport = NoveltyStream.report(spark, stateDir).collect().toSeq
    assert(streamReport == batchReport)

    // resume with no new files: nothing replays
    NoveltyStream.maintain(spark, inDir, stateDir).awaitTermination()
    assert(NoveltyStream.report(spark, stateDir).collect().toSeq
      == batchReport)

    // re-application of already-folded rows under a FRESH batchId: both
    // replay guards (marker + in-state batchId) are bypassed so the
    // merge genuinely re-runs, and the idempotent algebra
    // (min/distinct/first-write-wins) must absorb it without a ripple —
    // the property the additive streams (Drift/Cms) do NOT have
    val b2 = spark.read.parquet(inDir).filter($"doc_id" % 3 === 2)
    NoveltyStream.mergeBatch(b2, stateDir, 50L)
    assert(NoveltyStream.report(spark, stateDir).collect().toSeq
      == batchReport)

    // re-arrival with DIFFERENT text: first write wins, state unmoved
    val mutated = docs.limit(5)
      .select($"doc_id", org.apache.spark.sql.functions.lit("changed text entirely").as("text"),
        $"lang", $"source", $"n_chars")
    NoveltyStream.mergeBatch(mutated, stateDir, 99L)
    assert(NoveltyStream.report(spark, stateDir).collect().toSeq
      == batchReport)
  }
}
