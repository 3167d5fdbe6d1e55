package graft

import graft.streaming.SearchIndexStream
import graft.sources.Tables
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Incremental index maintenance ≡ batch rebuild: replay the documents
  * fixture in 2 micro-batches; the maintained df/dl statistics must equal
  * the single-shot batch computation over the full corpus. */
class SearchIndexStreamSpec extends SparkSuite {

  test("incrementally maintained stats equal batch stats") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    // stage the corpus as 2 parquet files → 2 micro-batches
    val inDir = Files.createTempDirectory("graft_idx_in_").toString
    docs.filter($"doc_id" % 2 === 0).coalesce(1)
      .write.mode("append").parquet(inDir)
    docs.filter($"doc_id" % 2 === 1).coalesce(1)
      .write.mode("append").parquet(inDir)

    val stateDir = Files.createTempDirectory("graft_idx_state_").toString
    val q = SearchIndexStream.maintain(spark, inDir, stateDir)
    q.awaitTermination()

    val (tok, doc) = SearchIndexStream.readState(spark, stateDir)
    val toks = docs.select($"doc_id", explode(split($"text", " ")).as("token"))
    val batchTok = toks.select($"doc_id", $"token").distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val batchDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))

    assert(tok.count() == batchTok.count())
    assert(tok.except(batchTok).isEmpty && batchTok.except(tok).isEmpty)
    assert(doc.count() == batchDoc.count())
    assert(doc.except(batchDoc).isEmpty && batchDoc.except(doc).isEmpty)
    // and it genuinely ran incrementally: at least 2 batches → df summed
    assert(tok.agg(max("df")).head().getLong(0) > 1)

    // re-run idempotency: the stable checkpoint resumes (sees no new
    // files), so the additive state must not double-count
    val q2 = SearchIndexStream.maintain(spark, inDir, stateDir)
    q2.awaitTermination()
    val (tok2, doc2) = SearchIndexStream.readState(spark, stateDir)
    assert(tok2.except(batchTok).isEmpty && batchTok.except(tok2).isEmpty)
    assert(doc2.except(batchDoc).isEmpty && batchDoc.except(doc2).isEmpty)

    // an already-indexed doc_id arriving in a NEW file must contribute
    // nothing (first-writer-wins) — the checkpoint can't catch this one;
    // the file also repeats the id twice (intra-batch duplicate)
    val dup = docs.orderBy($"doc_id").limit(1)
    dup.unionByName(dup).coalesce(1)
      .write.mode("append").parquet(inDir)
    SearchIndexStream.maintain(spark, inDir, stateDir).awaitTermination()
    val (tok3, doc3) = SearchIndexStream.readState(spark, stateDir)
    assert(tok3.except(batchTok).isEmpty && batchTok.except(tok3).isEmpty)
    assert(doc3.except(batchDoc).isEmpty && batchDoc.except(doc3).isEmpty)

    // a brand-new doc repeated twice within ONE batch counts once
    val newDoc9 = Seq((9000000L, "alpha beta beta gamma", "en", "syn", 21L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    newDoc9.unionByName(newDoc9).coalesce(1)
      .write.mode("append").parquet(inDir)
    SearchIndexStream.maintain(spark, inDir, stateDir).awaitTermination()
    val (_, doc4) = SearchIndexStream.readState(spark, stateDir)
    val dl9 = doc4.filter($"doc_id" === 9000000L).collect()
    assert(dl9.length == 1 && dl9.head.getLong(1) == 4L) // 4 tokens, once
  }

  test("RestSource: throttled fetch isolates failures per key") {
    val out = graft.sources.RestSource.fetchDriver(spark,
      Seq("a", "b", "bad", "c"),
      k => if (k == "bad") throw new RuntimeException("HTTP 500")
        else s"""{"key":"$k"}""")
    val rows = out.collect()
    assert(rows.length == 4)
    assert(rows.count(_.isNullAt(1)) == 1)
    assert(rows.filter(_.getString(0) == "bad").head.getString(2)
      .contains("HTTP 500"))
  }

  test("RestSource: distributed fetch returns all keys") {
    import spark.implicits._
    val keys = (1 to 100).map(_.toString).toDS.repartition(8)
    val out = graft.sources.RestSource.fetchDistributed(keys,
      k => s"""{"k":$k}""")
    assert(out.count() == 100)
    assert(out.filter(col("error").isNotNull).count() == 0)
  }
}
