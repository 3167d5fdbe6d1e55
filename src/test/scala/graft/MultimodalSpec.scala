package graft

import graft.operators.Multimodal
import graft.streaming.EventsStream
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Multimodal plumbing specs + the stream-stream interval join. */
class MultimodalSpec extends SparkSuite {

  test("batched mapPartitions decode equals per-row UDF decode") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val a = Multimodal.withFeatures(media)
      .select($"media_id", $"features")
      .orderBy($"media_id").collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val b = Multimodal.withFeaturesBatched(media, batchSize = 7)
      .select($"media_id", $"features")
      .orderBy($"media_id").collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(a.nonEmpty)
    assert(a == b)
  }

  test("resizeMeta preserves aspect and caps the long side") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val out = Multimodal.resizeMeta(media, maxSide = 100)
      .select($"out_width", $"out_height", $"meta.width", $"meta.height")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getInt(0) <= 100 && r.getInt(1) <= 100)
      if (r.getInt(2) <= 100 && r.getInt(3) <= 100) {
        assert(r.getInt(0) == r.getInt(2) && r.getInt(1) == r.getInt(3))
      }
    }
  }

  test("stream-stream interval join equals the batch interval join") {
    val q = EventsStream.purchaseErrorJoin(
        EventsStream.readEvents(spark, sfDir),
        EventsStream.readEvents(spark, sfDir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("pe_join")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ssj_ckpt_").toString)
      .start()
    q.awaitTermination()
    val streamed = spark.table("pe_join")
      .orderBy("p_id", "e_id").collect().toSeq
    val batchEvents = Tables.events(spark, sfDir)
    val batch = EventsStream.purchaseErrorJoin(batchEvents, batchEvents)
      .orderBy("p_id", "e_id").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
