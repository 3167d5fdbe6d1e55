package graft

import graft.operators.Analytics
import graft.sources.Tables
import graft.streaming.FunnelStream
import org.apache.spark.sql.functions._

/** Incremental funnel maintenance ≡ batch q88: replay the events fixture
  * in three event-time-ordered micro-batches; the maintained report must
  * equal the batch funnel, a retried batch must be a no-op, and a
  * cross-batch cascade (view in one batch, its qualifying click in the
  * next) must be picked up. */
class FunnelStreamSpec extends SparkSuite {

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_funnel_").toString

  test("three-batch replay converges to the batch q88 report") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"ts")
    // event-time-ordered thirds via exact timestamp cut points
    val ts = ev.select(unix_micros($"ts").as("u")).orderBy($"u")
      .collect().map(_.getLong(0))
    val (c1, c2) = (ts(ts.length / 3), ts(2 * ts.length / 3))
    val dir = freshDir()
    val b1 = ev.filter(unix_micros($"ts") <= c1)
    val b2 = ev.filter(unix_micros($"ts") > c1 && unix_micros($"ts") <= c2)
    val b3 = ev.filter(unix_micros($"ts") > c2)
    FunnelStream.mergeBatch(spark, dir, b1, 0L)
    FunnelStream.mergeBatch(spark, dir, b2, 1L)
    FunnelStream.mergeBatch(spark, dir, b3, 2L)
    val streamed = FunnelStream.report(spark, dir).collect().map(_.toString)
    val batch = Analytics.q88Funnel(spark, sfDir).collect().map(_.toString)
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq,
      s"maintained:\n${streamed.mkString("\n")}\nbatch:\n${batch.mkString("\n")}")
  }

  test("a retried batch is a no-op and an unmarked replay converges") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"ts")
    val dir = freshDir()
    FunnelStream.mergeBatch(spark, dir, ev, 0L)
    val once = FunnelStream.report(spark, dir).collect().map(_.toString).toSeq
    // marker fast path: same batchId returns without touching state
    FunnelStream.mergeBatch(spark, dir, ev, 0L)
    // idempotent merge: same CONTENT under a fresh id converges too
    // (the least()-merge property the maintainer's ordering contract
    // rests on)
    FunnelStream.mergeBatch(spark, dir, ev, 1L)
    val thrice = FunnelStream.report(spark, dir).collect().map(_.toString).toSeq
    assert(once == thrice)
  }

  test("a cascade split across batches is detected") {
    import spark.implicits._
    val dir = freshDir()
    def mk(rows: Seq[(Long, String, Long)]) =
      rows.toDF("user_id", "event_type", "us")
        .select($"user_id", $"event_type", timestamp_micros($"us").as("ts"))
    val h = 3600L * 1000000
    // batch 0: view at t=1h; a pre-view click at t=0 must NOT shadow
    FunnelStream.mergeBatch(spark, dir, mk(Seq(
      (1L, "click", 0L), (1L, "view", h))), 0L)
    // batch 1: qualifying click 2h later, then purchase within window
    FunnelStream.mergeBatch(spark, dir, mk(Seq(
      (1L, "click", 3 * h), (1L, "purchase", 4 * h))), 1L)
    val st = FunnelStream.readState(spark, dir).collect()
    assert(st.length == 1)
    val r = st.head
    assert(r.getLong(r.fieldIndex("t1")) == h)
    assert(r.getLong(r.fieldIndex("t2")) == 3 * h)
    assert(r.getLong(r.fieldIndex("t3")) == 4 * h)
  }
}
