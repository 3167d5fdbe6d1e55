package graft

import graft.streaming.EventsStream
import graft.sources.Tables

/** Streaming ≡ batch equivalence (SURVEY.md §2.10 / §7.1 M6): the same
  * transform over the replayed event stream and over the batch table must
  * agree — Trigger.AvailableNow + memory sink keeps it wall-clock-free. */
class StreamingSpec extends SparkSuite {

  test("streaming hourly counts equal batch hourly counts") {
    val q = EventsStream.runAvailableNow(spark, sfDir, "hourly", "complete")(
      EventsStream.hourlyCounts)
    q.awaitTermination()
    val streamed = spark.table("hourly")
      .orderBy("bucket", "event_type").collect().toSeq
    val batch = EventsStream.hourlyCounts(Tables.events(spark, sfDir))
      .orderBy("bucket", "event_type").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming dedup emits each event_id once") {
    val q = EventsStream.runAvailableNow(spark, sfDir, "dedup", "append")(
      EventsStream.dedupedEvents)
    q.awaitTermination()
    val n = spark.table("dedup").count()
    val distinct = Tables.events(spark, sfDir)
      .select("event_id").distinct().count()
    assert(n == distinct)
  }
}
