package graft

import graft.operators.Embedding
import graft.sources.Tables
import graft.streaming.DriftStream

import java.nio.file.Files

/** Streaming drift ≡ batch drift: replay the embeddings fixture in 3
  * micro-batches; the accumulated sum state and the report must equal
  * q105's single-shot run over the full corpus, and neither a resumed
  * run nor a marker-less retry may double-count. */
class DriftStreamSpec extends SparkSuite {

  test("3-batch replay accumulates exactly the batch drift state") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val inDir = Files.createTempDirectory("graft_drift_in_").toString
    for (r <- 0 to 2)
      emb.filter($"vec_id" % 3 === r).coalesce(1)
        .write.mode("append").parquet(inDir)

    val stateDir = Files.createTempDirectory("graft_drift_state_").toString
    DriftStream.maintain(spark, inDir, stateDir).awaitTermination()

    val batchSums = Embedding.driftSums(emb)
    val streamed = DriftStream.readSums(spark, stateDir)
    assert(streamed.except(batchSums).isEmpty
      && batchSums.except(streamed).isEmpty)

    // the report face matches the batch query exactly (same projection,
    // same integer means — collect both ordered and compare rows)
    val batchReport = Embedding.q105EmbeddingDrift(spark, sfDir).collect().toSeq
    val streamReport = DriftStream.report(spark, stateDir).collect().toSeq
    assert(streamReport == batchReport)

    // resume with no new files: the additive merge must not re-apply
    DriftStream.maintain(spark, inDir, stateDir).awaitTermination()
    val streamed2 = DriftStream.readSums(spark, stateDir)
    assert(streamed2.except(batchSums).isEmpty
      && batchSums.except(streamed2).isEmpty)

    // direct retry of an applied batchId is a no-op (marker fast path)
    val b0 = spark.read.parquet(inDir).filter($"vec_id" % 3 === 0)
    DriftStream.mergeBatch(b0, stateDir, 0L)
    val streamed3 = DriftStream.readSums(spark, stateDir)
    assert(streamed3.except(batchSums).isEmpty
      && batchSums.except(streamed3).isEmpty)
  }

  test("crash between state swap and marker write cannot double-count") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val stateDir = Files.createTempDirectory("graft_drift_crash_").toString
    DriftStream.mergeBatch(emb, stateDir, 0L)
    val once = DriftStream.readSums(spark, stateDir).collect().toSet
    // simulate the crash window: swap survived, marker never written —
    // the retry re-invokes the same batchId and the in-state batchId
    // backstop must reject the re-apply
    Files.delete(java.nio.file.Paths.get(s"$stateDir/_applied_0"))
    DriftStream.mergeBatch(emb, stateDir, 0L)
    val twice = DriftStream.readSums(spark, stateDir).collect().toSet
    assert(twice == once)
    // and the marker is restored for the fast path
    assert(Files.exists(java.nio.file.Paths.get(s"$stateDir/_applied_0")))
  }
}
