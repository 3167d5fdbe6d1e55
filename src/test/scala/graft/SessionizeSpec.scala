package graft

import graft.streaming.{EventsStream, Sessionize}
import graft.sources.Tables
import org.apache.spark.sql.streaming.Trigger

/** Custom-state streaming sessionization ≡ batch window sessionization
  * over the same replayed events. */
class SessionizeSpec extends SparkSuite {

  test("streaming flatMapGroupsWithState sessions equal batch sessions") {
    import spark.implicits._
    val q = Sessionize.sessionsStreaming(EventsStream.readEvents(spark, sfDir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessions")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sess_ckpt_").toString)
      .start()
    q.awaitTermination()
    val streamed = spark.table("sessions")
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start")
      .collect().toSeq
    val batch = Sessionize.sessionsBatch(Tables.events(spark, sfDir))
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .orderBy("user_id", "session_start")
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed.size == batch.size)
    assert(streamed == batch)
  }
}
