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
}
