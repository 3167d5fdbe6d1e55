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
      .select("user_id", "session_start", "session_end", "n_events",
        "sum_value")
      .orderBy("user_id", "session_start")
      .collect().toSeq
    val batch = Sessionize.sessionsBatch(Tables.events(spark, sfDir))
      .select($"user_id", $"session_start", $"session_end", $"n_events",
        $"sum_value")
      .orderBy("user_id", "session_start")
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed.size == batch.size)
    streamed.zip(batch).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1) &&
        a.getLong(2) == b.getLong(2) && a.getLong(3) == b.getLong(3), s"$a != $b")
      // both sides round to 4 decimals; accumulation order may differ by ulps
      assert(math.abs(a.getDouble(4) - b.getDouble(4)) < 1e-6, s"$a != $b")
    }
  }
}
