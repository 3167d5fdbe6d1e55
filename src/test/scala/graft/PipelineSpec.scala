package graft

import graft.operators.{Pipeline, Shred}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** End-to-end lifecycle over reference-shaped data (SURVEY.md §3.1):
  * shred → what-to-download → store+merge → what-to-chunk → chunk →
  * status machine → enrichment. Also pins incremental semantics: a
  * re-run downloads nothing new and chunk counts are stable. */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  def doc(regno: String, name: String, pdfs: Seq[(String, String)]): String = {
    val pdfJson = pdfs.map { case (f, d) =>
      s"""{"epa_reg_num":"$regno","pdffile":"$f","pdffile_accepted_date":"$d"}"""
    }.mkString("[", ",", "]")
    s"""{"eparegno":"$regno","productname":"$name","signal_word":"CAUTION",
       |"product_status":"Active","cancel_flag":"N",
       |"companyinfo":[{"name":"ACME $name Corp","city":"X","state":"CT"}],
       |"types":[{"type":"INSECTICIDE"},{"type":"HERBICIDE"}],
       |"pdffiles":$pdfJson}""".stripMargin.replace("\n", "")
  }

  test("full lifecycle: shred → download view → store → chunk → enrich") {
    val docs = Seq(
      doc("100-1", "ALPHA", Seq(("a-old.pdf", "2001-01-01"), ("a-new.pdf", "2015-06-20"))),
      doc("100-2", "BETA", Seq(("b.pdf", "2010-03-14"))),
      doc("100-3", "GAMMA", Seq.empty))
    val star = Shred.shredJson(spark, docs)
    val products = star("products")
    val pdffiles = star("pdffiles")

    // 1. what-to-download: latest PDF per product, nothing in metadata yet
    val emptyMeta = Seq.empty[(String, String, String, Long, String, String,
      String, String, String)].toDF("PRODUCT_NAME", "STAGE_FILE_PATH",
      "ORIGINAL_URL", "FILE_SIZE_BYTES", "PROCESSING_STATUS", "EPAREGNO",
      "PDF_FILE_NAME", "PDFFILE_ACCEPTED_DATE", "PDFFILE")
      .withColumn("UPLOAD_TIMESTAMP", current_timestamp())
      .withColumn("ID", lit(null).cast("long"))
    val toDl = Pipeline.pdfToDownload(products, pdffiles, emptyMeta)
    val dl = toDl.collect().map(r =>
      r.getAs[String]("EPAREGNO") -> r.getAs[String]("PDFFILE")).toMap
    assert(dl == Map("100-1" -> "a-new.pdf", "100-2" -> "b.pdf"))
    // GAMMA has no pdffiles → absent; ALPHA picked the LATEST accepted

    // 2. download + store (fake fetch = deterministic bytes) + MERGE
    val store = Files.createTempDirectory("graft_pipeline_").toString
    val fetched = Pipeline.downloadAndStore(toDl,
      f => s"%PDF text of $f with words ".*(40).getBytes("UTF-8"), store)
    val meta1 = Pipeline.mergeMetadata(emptyMeta, fetched)
    assert(meta1.count() == 2)
    assert(meta1.filter($"PROCESSING_STATUS" === "PENDING").count() == 2)

    // 2b. AUTOINCREMENT surrogate ids: dense 1..N in (EPAREGNO, PDFFILE)
    // order, and STABLE across a re-merge of the same batch
    val ids1 = meta1.select($"EPAREGNO", $"ID").as[(String, Long)]
      .collect().toMap
    assert(ids1 == Map("100-1" -> 1L, "100-2" -> 2L))
    val remerged = Pipeline.mergeMetadata(meta1, fetched)
    val ids1b = remerged.select($"EPAREGNO", $"ID").as[(String, Long)]
      .collect().toMap
    assert(ids1b == ids1) // matched rows keep their ids — nothing renumbers

    // 3. incremental re-run: nothing left to download (anti-join)
    assert(Pipeline.pdfToDownload(products, pdffiles, meta1).count() == 0)

    // 4. what-to-chunk: store directory ⋈ pending metadata
    val toChunk = Pipeline.pdfToChunk(spark, store, meta1)
    assert(toChunk.count() == 2)

    // 5. chunk (parse = UTF-8 decode), status machine advance
    val emptyChunks = Seq.empty[(String, Long, String, String, Int, String)]
      .toDF("RELATIVE_PATH", "SIZE", "FILE_URL", "EPAREGNO", "CHUNK_INDEX",
        "CHUNK")
    val chunks = Pipeline.processChunks(emptyChunks, toChunk,
      bytes => new String(bytes, "UTF-8"))
    assert(chunks.count() >= 2)
    assert(chunks.groupBy($"EPAREGNO").count().count() == 2)
    val meta2 = Pipeline.markChunked(meta1, chunks)
    assert(meta2.filter($"PROCESSING_STATUS" === "CHUNKED").count() == 2)
    assert(meta2.filter($"PROCESSING_STATUS" === "PENDING").count() == 0)

    // 6. idempotent re-chunk: delete-before-insert keeps counts stable
    val chunks2 = Pipeline.processChunks(chunks, toChunk,
      bytes => new String(bytes, "UTF-8"))
    assert(chunks2.count() == chunks.count())

    // 7. enrichment: product/company attrs + sorted type array on chunks
    val enriched = Pipeline.updateCategory(chunks, star("products"),
      star("companyinfo"), star("types"))
    val one = enriched.filter($"EPAREGNO" === "100-1").head()
    assert(one.getAs[String]("PRODUCTNAME") == "ALPHA")
    assert(one.getAs[String]("COMPANYNAME") == "ACME ALPHA Corp")
    assert(one.getSeq[String](one.fieldIndex("CATEGORY_EPA_TYPE")) ==
      Seq("HERBICIDE", "INSECTICIDE"))
  }

  test("surrogate ids extend densely for late batches, never renumber") {
    val emptyMeta = Seq.empty[(String, String, String, Long, String, String,
      String, String, String)].toDF("PRODUCT_NAME", "STAGE_FILE_PATH",
      "ORIGINAL_URL", "FILE_SIZE_BYTES", "PROCESSING_STATUS", "EPAREGNO",
      "PDF_FILE_NAME", "PDFFILE_ACCEPTED_DATE", "PDFFILE")
      .withColumn("UPLOAD_TIMESTAMP", current_timestamp())
      .withColumn("ID", lit(null).cast("long"))
    val store = Files.createTempDirectory("graft_pipeline_ids_").toString
    def fetchAndMerge(meta: org.apache.spark.sql.DataFrame,
        ds: Seq[String]) = {
      val star = Shred.shredJson(spark, ds)
      val toDl = Pipeline.pdfToDownload(star("products"), star("pdffiles"),
        emptyMeta) // re-fetch everything in the batch
      Pipeline.mergeMetadata(meta,
        Pipeline.downloadAndStore(toDl, f => s"pdf $f".getBytes, store))
    }
    val metaA = fetchAndMerge(emptyMeta, Seq(
      doc("300-1", "P1", Seq(("p1.pdf", "2020-01-01"))),
      doc("300-2", "P2", Seq(("p2.pdf", "2020-01-01")))))
    // batch B re-fetches 300-2 (matched → keeps id) and adds 300-3 (new)
    val metaB = fetchAndMerge(metaA, Seq(
      doc("300-2", "P2", Seq(("p2.pdf", "2020-01-01"))),
      doc("300-3", "P3", Seq(("p3.pdf", "2021-02-02")))))
    val ids = metaB.select($"EPAREGNO", $"ID").as[(String, Long)]
      .collect().toMap
    assert(ids == Map("300-1" -> 1L, "300-2" -> 2L, "300-3" -> 3L))
  }

  test("failed fetch isolates per item (FAILED status, run continues)") {
    val docs = Seq(
      doc("200-1", "OK", Seq(("ok.pdf", "2020-01-01"))),
      doc("200-2", "BAD", Seq(("bad.pdf", "2020-01-01"))))
    val star = Shred.shredJson(spark, docs)
    val emptyMeta = Seq.empty[(String, String, String, Long, String, String,
      String, String, String)].toDF("PRODUCT_NAME", "STAGE_FILE_PATH",
      "ORIGINAL_URL", "FILE_SIZE_BYTES", "PROCESSING_STATUS", "EPAREGNO",
      "PDF_FILE_NAME", "PDFFILE_ACCEPTED_DATE", "PDFFILE")
      .withColumn("UPLOAD_TIMESTAMP", current_timestamp())
    val toDl = Pipeline.pdfToDownload(star("products"), star("pdffiles"),
      emptyMeta)
    val store = Files.createTempDirectory("graft_pipeline_fail_").toString
    val fetched = Pipeline.downloadAndStore(toDl,
      f => if (f == "bad.pdf") throw new RuntimeException("HTTP 404")
        else "ok".getBytes, store)
    val byStatus = fetched.groupBy($"PROCESSING_STATUS").count()
      .as[(String, Long)].collect().toMap
    assert(byStatus == Map("PENDING" -> 1L, "FAILED" -> 1L))
  }
}
