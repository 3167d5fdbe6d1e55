package graft

import graft.operators.{Pipeline, Search, Shred}
import graft.sources.RestSource
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The reference's COMPLETE lifecycle (`epa_ingestion.py:868-921`,
  * SURVEY.md §3.1) as ONE composed run: REST fetch → JSON shred →
  * what-to-download view → binary store + metadata MERGE → incremental
  * anti-join → chunk + status machine → enrichment → search index +
  * query. PipelineSpec exercises the middle stages; this is the
  * integration seam the per-query correctness gates don't cover — every
  * stage consumes the PREVIOUS stage's actual output, and each stage's
  * row counts are asserted before the next runs. */
class E2ESpec extends SparkSuite {
  import spark.implicits._

  private def doc(regno: String, name: String, text: String,
      pdfs: Seq[(String, String)]): String = {
    val pdfJson = pdfs.map { case (f, d) =>
      s"""{"epa_reg_num":"$regno","pdffile":"$f","pdffile_accepted_date":"$d"}"""
    }.mkString("[", ",", "]")
    // the body text rides along in the fake PDF the fetch edge serves
    s"""{"eparegno":"$regno","productname":"$name","signal_word":"CAUTION",
       |"product_status":"Active","cancel_flag":"N",
       |"companyinfo":[{"name":"ACME $name Corp","city":"X","state":"CT"}],
       |"types":[{"type":"INSECTICIDE"}],
       |"pdffiles":$pdfJson}""".stripMargin.replace("\n", "")
  }

  test("fetch → shred → store → anti-join → chunk → enrich → index, " +
    "eight stages, each consuming the previous stage's output") {
    val bodies = Map(
      "alpha.pdf" -> "mosquito barrier spray for outdoor perimeter use ",
      "beta.pdf" -> "broadleaf weed control formula for lawn application ",
      "gamma.pdf" -> "rodent bait station refill for indoor placement ")
    val payloads = Map(
      "100-1" -> doc("100-1", "ALPHA", "", Seq(
        ("alpha-old.pdf", "2001-01-01"), ("alpha.pdf", "2015-06-20"))),
      "100-2" -> doc("100-2", "BETA", "", Seq(("beta.pdf", "2010-03-14"))),
      "100-3" -> doc("100-3", "GAMMA", "", Seq(("gamma.pdf", "2019-09-09"))))

    // STAGE 1 — REST fetch (distributed shape, per-item isolation): four
    // keys requested, one unknown key fails WITHOUT aborting the run
    val keys = spark.createDataset(Seq("100-1", "100-2", "100-3", "999-X"))
    val fetched = RestSource.fetchDistributed(keys,
      k => payloads.getOrElse(k,
        throw new RuntimeException(s"HTTP 404 for $k"))).cache()
    assert(fetched.count() == 4)
    assert(fetched.filter($"error".isNotNull).select($"key")
      .as[String].collect().toSeq == Seq("999-X"))

    // STAGE 2 — shred the successful payloads into the star tables
    val star = Shred.shredJson(spark,
      fetched.filter($"error".isNull).select($"json").as[String]
        .collect().toSeq)
    assert(star("products").count() == 3)
    assert(star("pdffiles").count() == 4)  // ALPHA has two revisions
    assert(star("companyinfo").count() == 3)

    // STAGE 3 — what-to-download: latest accepted PDF per product,
    // anti-joined against (empty) metadata
    val emptyMeta = Seq.empty[(String, String, String, Long, String, String,
      String, String, String)].toDF("PRODUCT_NAME", "STAGE_FILE_PATH",
      "ORIGINAL_URL", "FILE_SIZE_BYTES", "PROCESSING_STATUS", "EPAREGNO",
      "PDF_FILE_NAME", "PDFFILE_ACCEPTED_DATE", "PDFFILE")
      .withColumn("UPLOAD_TIMESTAMP", current_timestamp())
      .withColumn("ID", lit(null).cast("long"))
    val toDl = Pipeline.pdfToDownload(star("products"), star("pdffiles"),
      emptyMeta)
    assert(toDl.count() == 3) // one per product; ALPHA's LATEST revision
    assert(toDl.filter($"EPAREGNO" === "100-1").head()
      .getAs[String]("PDFFILE") == "alpha.pdf")

    // STAGE 4 — download into the binary store + metadata MERGE (the
    // PDF edge serves the body text; repetition makes it chunk-sized)
    val store = Files.createTempDirectory("graft_e2e_").toString
    val fetchedPdfs = Pipeline.downloadAndStore(toDl,
      f => bodies(f).*(30).getBytes("UTF-8"), store)
    val meta1 = Pipeline.mergeMetadata(emptyMeta, fetchedPdfs)
    assert(meta1.count() == 3)
    assert(meta1.filter($"PROCESSING_STATUS" === "PENDING").count() == 3)

    // STAGE 5 — incremental anti-join: a re-run finds nothing new
    assert(Pipeline.pdfToDownload(star("products"), star("pdffiles"),
      meta1).count() == 0)

    // STAGE 6 — chunk what the store holds (directory table ⋈ PENDING
    // metadata), then advance the status machine
    val toChunk = Pipeline.pdfToChunk(spark, store, meta1)
    assert(toChunk.count() == 3)
    val emptyChunks = Seq.empty[(String, Long, String, String, Int, String)]
      .toDF("RELATIVE_PATH", "SIZE", "FILE_URL", "EPAREGNO", "CHUNK_INDEX",
        "CHUNK")
    val chunks = Pipeline.processChunks(emptyChunks, toChunk,
      bytes => new String(bytes, "UTF-8")).cache()
    assert(chunks.count() >= 3)
    assert(chunks.select($"EPAREGNO").distinct().count() == 3)
    val meta2 = Pipeline.markChunked(meta1, chunks)
    assert(meta2.filter($"PROCESSING_STATUS" === "CHUNKED").count() == 3)

    // STAGE 7 — enrich every chunk with product/company/type attributes
    val enriched = Pipeline.updateCategory(chunks, star("products"),
      star("companyinfo"), star("types")).cache()
    assert(enriched.count() == chunks.count())
    assert(enriched.filter($"COMPANYNAME".isNull).count() == 0)

    // STAGE 8 — search index over the enriched chunks: BM25 retrieval
    // must surface the right product's chunk for a body-text query
    val corpus = enriched.select(
      concat($"RELATIVE_PATH", lit("#"), $"CHUNK_INDEX").as("doc_id"),
      $"CHUNK".as("text"), $"EPAREGNO")
    val hit = Search.bm25(corpus, Seq("mosquito", "barrier"))
      .join(corpus, "doc_id")
      .orderBy($"score".desc, $"doc_id".asc)
      .head()
    assert(hit.getAs[String]("EPAREGNO") == "100-1") // ALPHA's chunk wins
    assert(hit.getAs[Long]("n_terms_hit") == 2L)
  }
}
