package graft.tools

import org.apache.spark.sql.SparkSession

/** Session-conf isolation for multi-query harnesses (Verify, Bench,
  * long-lived notebook sessions): a query that tunes SQLConf for its own
  * plan — legitimately, like q83's bloom-ceiling raise — must not leak
  * that tuning into every later query's optimizer behavior in the same
  * session (the BENCH_r08 q83 anomaly was traced to exactly this channel;
  * see PLANS.md round 9). Queries restore their own mutations, and the
  * harness wraps each query in this guard as defense in depth.
  */
object ConfGuard {

  /** Run `f`, then restore the session's runtime SQL conf to its entry
    * state: keys `f` added are unset, keys `f` changed are set back.
    * Static/non-modifiable confs are skipped (set/unset throws on them —
    * they also cannot have been mutated by `f` for the same reason). */
  /** The SIZING half of the conf contract: raise
    * `spark.sql.shuffle.partitions` to at least `width` for the
    * calling kernel's shuffles (reducer-side grouped state shrinks
    * proportionally; AQE coalesces back down whatever a small input
    * doesn't need, so over-raising is free). Never lowers — a
    * user-raised width wins. Mutation discipline: harnesses (Bench,
    * Verify, ScaleProbe) wrap every query in [[withConfSnapshot]], so
    * the raise is query-scoped there; a bare long-lived session that
    * calls a sizing kernel keeps the raised width, which is the safe
    * direction (wider, never narrower). */
  def ensureShuffleWidth(s: SparkSession, width: Int): Unit = {
    val key = "spark.sql.shuffle.partitions"
    val cur = try s.conf.get(key).toInt catch { case _: Exception => 0 }
    if (width > cur) s.conf.set(key, width.toString)
  }

  def withConfSnapshot[T](s: SparkSession)(f: => T): T = {
    val before = s.conf.getAll
    try f
    finally {
      val after = s.conf.getAll
      for (k <- after.keysIterator if !before.contains(k))
        try s.conf.unset(k) catch { case _: Exception => () }
      for ((k, v) <- before if !after.get(k).contains(v))
        try s.conf.set(k, v) catch { case _: Exception => () }
    }
  }
}
