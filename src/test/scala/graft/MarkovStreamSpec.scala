package graft

import graft.sources.Tables
import graft.streaming.MarkovStream

import java.nio.file.Files

/** Streaming transition model ≡ batch q130 over a time-sharded replay
  * (boundary pairs between shards included — the stitching the state's
  * last-event margin exists for), resume no-op, and the ordering
  * contract enforced LOUDLY: an out-of-order batch must throw before
  * touching state. */
class MarkovStreamSpec extends SparkSuite {

  import spark.implicits._

  test("3-shard time-ordered replay reproduces batch q130 exactly") {
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value",
        $"props")
    // tertile boundaries on distinct ts values so no tie straddles a
    // shard edge (adjacency order is (ts, event_id))
    val ts = ev.select($"ts").distinct().orderBy($"ts").collect()
      .map(_.getTimestamp(0))
    val (t1, t2) = (ts(ts.length / 3), ts(2 * ts.length / 3))
    val inDir = Files.createTempDirectory("graft_mkv_in_").toString
    ev.filter($"ts" < t1).coalesce(1).write.mode("append").parquet(inDir)
    ev.filter($"ts" >= t1 && $"ts" < t2).coalesce(1)
      .write.mode("append").parquet(inDir)
    ev.filter($"ts" >= t2).coalesce(1).write.mode("append").parquet(inDir)

    val stateDir = Files.createTempDirectory("graft_mkv_state_").toString
    MarkovStream.maintain(spark, inDir, stateDir).awaitTermination()

    val batch = graft.operators.Analytics
      .q130MarkovTransitions(spark, sfDir).collect().toSeq
    val stream = MarkovStream.report(spark, stateDir).collect().toSeq
    assert(stream == batch)
    // the equality above only proves stitching if shard boundaries CUT
    // user sequences — verify the replay actually created boundary
    // pairs (every user active in 2+ shards contributes one per cut)
    val intraOnly = Seq(ev.filter($"ts" < t1),
      ev.filter($"ts" >= t1 && $"ts" < t2), ev.filter($"ts" >= t2))
      .map { shard =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        shard.withColumn("nt",
            org.apache.spark.sql.functions.lead($"event_type", 1).over(w))
          .filter($"nt".isNotNull).count()
      }.sum
    val total = batch.map(_.getAs[Long]("n")).sum
    assert(total > intraOnly,
      s"no boundary pairs were exercised ($total vs $intraOnly)")

    // resume with no new files: nothing replays
    MarkovStream.maintain(spark, inDir, stateDir).awaitTermination()
    assert(MarkovStream.report(spark, stateDir).collect().toSeq == batch)

    // ordering contract: re-merging an EARLY shard under a fresh
    // batchId is out of order and must throw before corrupting state
    val early = spark.read.parquet(inDir).filter($"ts" < t1)
    val ex = intercept[IllegalStateException] {
      MarkovStream.mergeBatch(early, stateDir, 77L)
    }
    assert(ex.getMessage.contains("out-of-order"))
    assert(MarkovStream.report(spark, stateDir).collect().toSeq == batch)
  }

  private def twoShards() = {
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value",
        $"props")
    val ts = ev.select($"ts").distinct().orderBy($"ts").collect()
      .map(_.getTimestamp(0))
    val mid = ts(ts.length / 2)
    (ev.filter($"ts" < mid), ev.filter($"ts" >= mid))
  }

  test("crash between pointer swap and applied-marker: retry is a no-op") {
    // the crash window VersionedState.appliedBatch exists to close: the
    // state committed (pointer swapped) but the per-batch applied
    // marker — written AFTER commit — was lost to a crash. The retry
    // must be recognized as already-folded via the in-state batchId, or
    // the ADDITIVE counts margin double-applies every transition.
    val (shard1, shard2) = twoShards()
    val stateDir = Files.createTempDirectory("graft_mkv_crash_").toString
    MarkovStream.mergeBatch(shard1, stateDir, 0L)
    MarkovStream.mergeBatch(shard2, stateDir, 1L)
    val want = MarkovStream.report(spark, stateDir).collect().toSeq
    val marker = java.nio.file.Paths.get(s"$stateDir/_applied_1")
    assert(Files.exists(marker))
    Files.delete(marker) // simulate the crash: commit survived, mark lost
    MarkovStream.mergeBatch(shard2, stateDir, 1L) // streaming retry
    assert(MarkovStream.report(spark, stateDir).collect().toSeq == want,
      "retry after a swap-then-crash double-applied the counts")
    assert(Files.exists(marker), "recovered retry must re-mark its batch")
  }

  test("leftover partial version directory does not poison a retry") {
    // the OTHER crash window: batch 1's version directory was written
    // (tables + in-dir batch file) but the process died BEFORE the
    // pointer swap. CURRENT still names version 0, so the retry must
    // re-merge batch 1 from v0 state, overwrite the partial v1 —
    // including tables the partial write never produced — and swap.
    import org.apache.spark.sql.functions.lit
    val (shard1, shard2) = twoShards()
    val stateDir = Files.createTempDirectory("graft_mkv_partial_").toString
    MarkovStream.mergeBatch(shard1, stateDir, 0L)
    val cleanDir = Files.createTempDirectory("graft_mkv_clean_").toString
    MarkovStream.mergeBatch(shard1, cleanDir, 0L)
    MarkovStream.mergeBatch(shard2, cleanDir, 1L)
    val want = MarkovStream.report(spark, cleanDir).collect().toSeq
    // fabricate the pre-swap crash: v__1 holds a WRONG counts table and
    // the batch file, no `last` table, pointer untouched
    spark.range(1).select(lit("zzz").as("from_type"),
        lit("zzz").as("to_type"), lit(999L).as("n"))
      .coalesce(1).write.parquet(s"$stateDir/v__1/counts")
    Files.write(java.nio.file.Paths.get(s"$stateDir/v__1/_batch"),
      "1".getBytes("UTF-8"))
    val st = new graft.streaming.VersionedState(stateDir)
    assert(st.readVersion.contains(0L), "pointer must still be pre-crash")
    assert(!st.isApplied(1L), "a pre-swap crash must NOT count as applied")
    MarkovStream.mergeBatch(shard2, stateDir, 1L) // retry
    assert(MarkovStream.report(spark, stateDir).collect().toSeq == want,
      "retry over a partial version directory diverged from clean replay")
    assert(st.readVersion.contains(1L))
    assert(st.appliedBatch.contains(1L))
  }
}
