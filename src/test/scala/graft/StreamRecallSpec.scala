package graft

import graft.operators.Similarity
import graft.streaming.{IndexRecallMeter, IvfIndexStream, PqIndexStream}

import java.nio.file.Files

/** The round-17 verdict's missing measurement, pinned: q165's
  * recall/cost meter applied to POST-STREAM index state. The stream is
  * sharded so the first batch carries only a third of the corpus —
  * the IVF centroid set and the PQ codebooks PIN on that batch, so
  * the maintained indexes drift from the batch twin as the rest
  * arrives (exactly what the rebuild signals count). The spec asserts
  * three things: the drift window is real (pinned seeds < the batch
  * twin's seed population), the meter over drifted state is
  * well-formed (6 rows, adc ≤ membership, monotone in nprobe), and a
  * rebuild of both maintainers restores the meter to batch q165's
  * table EXACTLY, row for row — streamed-state recall == batch-built
  * recall on identical data, with the drifted row recorded as the
  * measured price the rebuild signal bought back. */
class StreamRecallSpec extends SparkSuite {

  import spark.implicits._

  test("index recall meter: drift window measured, rebuild restores batch q165") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val inDir = Files.createTempDirectory("graft_recall_in_").toString
    // shard 1 first: it contains centroid-eligible ids (40, 160, ... ≡
    // 1 mod 3) and PQ seed ids (< 16), so both models pin on a
    // one-third corpus — the drift scenario
    for (r <- Seq(1, 2, 0))
      emb.filter($"vec_id" % 3 === r).coalesce(1)
        .write.mode("append").parquet(inDir)
    val ivfDir = Files.createTempDirectory("graft_recall_ivf_").toString
    val pqDir = Files.createTempDirectory("graft_recall_pq_").toString
    IvfIndexStream.maintain(spark, inDir, ivfDir).awaitTermination()
    PqIndexStream.maintain(spark, inDir, pqDir).awaitTermination()

    // the drift window is real: the pinned centroid set is missing
    // seeds the batch twin would use
    val (cent, assign) = IvfIndexStream.readState(spark, ivfDir)
    val nPinned = cent.count()
    val nEligible = assign.filter($"vec_id" % 40 === 0).count()
    assert(nPinned < nEligible,
      s"expected a drift window (pinned $nPinned of $nEligible seeds)")

    def lawful(rows: Seq[org.apache.spark.sql.Row]): Unit = {
      assert(rows.size == 6)
      val byKey = rows.map(r => ((r.getInt(0), r.getString(1)),
        (r.getLong(3), r.getDouble(5)))).toMap
      for (p <- Seq(1, 2, 4))
        assert(byKey((p, "adc"))._1 <= byKey((p, "membership"))._1,
          s"adc > membership at nprobe $p")
      // MEMBERSHIP is monotone by construction (the probed set grows
      // with nprobe). ADC is NOT guaranteed monotone: extra probed
      // cells add candidates that can push a true neighbor out of the
      // ADC top-5 — and the drifted one-third-seed state actually
      // exhibits that here (adc@1 > adc@2), which is exactly the kind
      // of operating-point fact this meter exists to surface. q165's
      // spec pins adc monotonicity only as an empirical property of
      // the batch lane's data, not a law.
      assert(byKey((1, "membership"))._1 <= byKey((2, "membership"))._1 &&
        byKey((2, "membership"))._1 <= byKey((4, "membership"))._1,
        "membership not monotone")
    }
    val drifted = IndexRecallMeter.meter(spark, ivfDir, pqDir)
      .collect().toSeq
    lawful(drifted)

    // rebuild both maintainers (the operation the signals ask for) —
    // the meter must now equal batch q165 EXACTLY: same seeds, same
    // kernels, same corpus, same ground truth
    IvfIndexStream.rebuild(spark, ivfDir, -1L)
    PqIndexStream.rebuild(spark, pqDir, -2L)
    val rebuilt = IndexRecallMeter.meter(spark, ivfDir, pqDir)
      .collect().toSeq
    lawful(rebuilt)
    val batch = Similarity.q165IvfPqRecall(spark, sfDir).collect().toSeq
    assert(rebuilt == batch,
      "post-rebuild meter diverges from batch q165")

    // the drift-window row: what the rebuild bought, made explicit —
    // the drifted table is a genuinely different operating point (the
    // one-third-seed cells scan a different corpus fraction)
    assert(drifted != rebuilt,
      "drift scenario produced no measurable delta (shards too uniform?)")
  }
}
