package graft

import graft.operators.Temporal
import graft.sources.Tables
import graft.streaming.CmsStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming CMS ≡ batch CMS: replay the documents fixture in 3
  * micro-batches; the accumulated cell grid must equal q68's
  * single-shot cells over the full corpus (the mergeability identity,
  * now exercised through the exactly-once streaming path), and a
  * resumed run must not double-count. */
class CmsStreamSpec extends SparkSuite {

  test("3-batch replay accumulates exactly the batch cell grid") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val inDir = Files.createTempDirectory("graft_cms_in_").toString
    for (r <- 0 to 2)
      docs.filter($"doc_id" % 3 === r).coalesce(1)
        .write.mode("append").parquet(inDir)

    val stateDir = Files.createTempDirectory("graft_cms_state_").toString
    CmsStream.maintain(spark, inDir, stateDir).awaitTermination()

    val batchCells = Temporal.cmsCells(
      docs.select(explode(split($"text", " ")).as("token")))
    val streamed = CmsStream.readCells(spark, stateDir)
    assert(streamed.except(batchCells).isEmpty
      && batchCells.except(streamed).isEmpty)

    // resume with no new files: the additive merge must not re-apply
    CmsStream.maintain(spark, inDir, stateDir).awaitTermination()
    val streamed2 = CmsStream.readCells(spark, stateDir)
    assert(streamed2.except(batchCells).isEmpty
      && batchCells.except(streamed2).isEmpty)

    // retry of an applied batch is a no-op (marker): re-merging batch 0's
    // frame directly must not double-count
    val b0 = spark.read.parquet(inDir).filter($"doc_id" % 3 === 0)
    CmsStream.mergeBatch(b0, stateDir, 0L)
    val streamed3 = CmsStream.readCells(spark, stateDir)
    assert(streamed3.except(batchCells).isEmpty
      && batchCells.except(streamed3).isEmpty)
  }

  test("crash between state swap and marker write cannot double-count") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val stateDir = Files.createTempDirectory("graft_cms_crash_").toString
    CmsStream.mergeBatch(docs, stateDir, 0L)
    // materialized: if the retry (buggily) re-committed, the lazy frame's
    // underlying version directory would be deleted out from under it
    val once = CmsStream.readCells(spark, stateDir).collect().toSet
    // simulate the crash window: the state swap survived but the applied
    // marker was never written — the streaming retry re-invokes the same
    // batchId. The additive merge must NOT apply again (the batchId
    // recorded inside the committed version is the backstop).
    Files.delete(java.nio.file.Paths.get(s"$stateDir/_applied_0"))
    CmsStream.mergeBatch(docs, stateDir, 0L)
    val retried = CmsStream.readCells(spark, stateDir).collect().toSet
    assert(retried == once)
    // and the marker is restored for the fast path
    assert(Files.exists(java.nio.file.Paths.get(s"$stateDir/_applied_0")))
  }
}
