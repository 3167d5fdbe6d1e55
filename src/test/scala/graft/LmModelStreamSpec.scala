package graft

import graft.streaming.LmModelStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The incremental LM model must be INDISTINGUISHABLE from a batch refit
  * over the union of batches — table-level equality, not statistical
  * closeness — and additively exactly-once under replay. */
class LmModelStreamSpec extends SparkSuite {

  private def docs = graft.sources.Tables.documents(spark, sfDir)

  test("3-batch streamed model equals the batch refit, and scoring matches q76") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_lmin_").toString
    val state = Files.createTempDirectory("graft_lmstate_").toString
    // three disjoint slices appended as three part files in ONE flat
    // directory (FileStreamSource does not recurse into subdirs); one
    // file per trigger → the slices arrive as three micro-batches
    (0 until 3).foreach { k =>
      docs.filter($"doc_id" % 3 === k).coalesce(1)
        .write.mode("append").parquet(in)
    }
    LmModelStream.maintain(spark, in, state).awaitTermination()

    val streamedUni = LmModelStream.readUnigrams(spark, state)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchUni = docs.select(explode(split($"text", " ")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("cu"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamedUni == batchUni, "unigram model diverged from batch refit")

    val streamedBi = LmModelStream.readBigrams(spark, state)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batchBi = docs.select(split($"text", " ").as("t"))
      .filter(size($"t") >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(t) - 1),
          |  i -> struct(element_at(t, i) AS prev,
          |              element_at(t, i + 1) AS cur))""".stripMargin)).as("p"))
      .groupBy($"p.prev", $"p.cur").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamedBi == batchBi, "bigram model diverged from batch refit")

    // scoring against the streamed model reproduces q76's per-language
    // rollup exactly (same formula, same model → same doubles)
    val scored = LmModelStream.scoreDocs(spark, state, docs)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg($"ppl"), 2).as("avg_ppl"),
        round(max($"ppl"), 2).as("max_ppl"))
    val q76 = graft.operators.Curation.q76BigramPerplexity(spark, sfDir)
    val got = scored.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val want = q76.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == want, s"streamed-model scoring diverged: $got vs $want")
  }

  test("scoring a document the model never saw backs off, not drops") {
    import spark.implicits._
    val state = Files.createTempDirectory("graft_lmnew_").toString
    LmModelStream.mergeBatch(docs, state, batchId = 0L)
    // 'table' is in the corpus; 'zzznew' is not: the (table, zzznew)
    // bigram must score as the pure smoothing term 0.3*(0+1)/(N+V),
    // giving ppl = (N+V)/0.3 — computable by hand from the model
    val newDoc = Seq((999L, "table zzznew", "en", "sX", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = LmModelStream.scoreDocs(spark, state, newDoc).collect()
    assert(out.length == 1, "unseen-bigram document was dropped from scoring")
    val uni = LmModelStream.readUnigrams(spark, state).collect()
    val n = uni.map(_.getLong(1)).sum
    val v = uni.length.toLong
    val expected = (n + v) / 0.3
    val got = out(0).getAs[Double]("ppl")
    assert(math.abs(got - expected) / expected < 1e-9,
      s"backoff ppl $got != smoothing-only $expected")
  }

  test("replaying a committed batch is a no-op (additive exactly-once)") {
    import spark.implicits._
    val state = Files.createTempDirectory("graft_lmreplay_").toString
    val b0 = docs.filter($"doc_id" < 100)
    LmModelStream.mergeBatch(b0, state, batchId = 0L)
    val after1 = LmModelStream.readUnigrams(spark, state)
      .agg(sum($"cu")).collect()(0).getLong(0)
    // crash-retry at ANY instant replays the same batchId — including
    // after the pointer swap: the in-state batchId must short-circuit it
    LmModelStream.mergeBatch(b0, state, batchId = 0L)
    val after2 = LmModelStream.readUnigrams(spark, state)
      .agg(sum($"cu")).collect()(0).getLong(0)
    assert(after1 == after2, s"replay double-counted: $after1 -> $after2")
    // and deleting the marker alone must NOT reopen the window
    val marker = new java.io.File(state, "_applied_0")
    if (marker.exists()) marker.delete()
    LmModelStream.mergeBatch(b0, state, batchId = 0L)
    val after3 = LmModelStream.readUnigrams(spark, state)
      .agg(sum($"cu")).collect()(0).getLong(0)
    assert(after1 == after3, s"marker-less replay double-counted: $after3")
  }
}
