package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.BinaryStore

/** The reference's full pipeline lifecycle (SURVEY.md §3.1) as composable
  * DataFrame stages — the end-to-end proof that a user of the reference
  * could run their workflow on this engine: JSON shred → star tables →
  * what-to-download view (J1+W1+J3) → binary store + metadata MERGE →
  * what-to-chunk view (J4) → lateral chunking + status machine (D1-D3) →
  * enrichment (D4/A1). Every stage is a pure function; persistence is the
  * caller's overwrite-by-swap (D6).
  *
  * Column names are the shredder's uppercase forms (reference
  * `columns.str.upper()`, `epa_ingestion.py:325`).
  *
  * Scale notes: the spine joins key on EPAREGNO/PDFFILE — the natural
  * partition key; the window and the anti-join share it, so one exchange
  * feeds both. The fan-out stage (chunking) is shuffle-free Generate.
  */
object Pipeline {

  /** VW_PDF_TO_DOWNLOAD (`epa_ingestion.py:432-457`): products ⋈ pdffiles
    * (J1), keep the latest accepted PDF per product (W1; string dates
    * order lexicographically exactly like the reference — ISO format makes
    * that chronological), drop PDFs already in metadata (J3). */
  def pdfToDownload(products: DataFrame, pdffiles: DataFrame,
      metadata: DataFrame): DataFrame = {
    val joined = products.alias("prd")
      .join(pdffiles.alias("pdf"), Seq("EPAREGNO"), "inner")
    val w = Window.partitionBy(col("EPAREGNO"))
      .orderBy(col("PDFFILE_ACCEPTED_DATE").desc, col("PDFFILE").asc)
    val latest = joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    latest.join(metadata.select(col("PDFFILE")), Seq("PDFFILE"), "left_anti")
      .select(col("EPAREGNO"), col("PRODUCTNAME"), col("SIGNAL_WORD"),
        col("PRODUCT_STATUS"), col("PDFFILE"), col("PDFFILE_ACCEPTED_DATE"))
  }

  /** Download + store stage (`epa_ingestion.py:639-730`): fetch each
    * pending PDF (injectable `fetch` — the HTTP edge), PUT into the binary
    * store under the sanitized name (`:668` `{productname}_{eparegno}`),
    * and emit the metadata records for the MERGE. Per-item fault isolation:
    * a failed fetch yields status FAILED instead of aborting (`:713-718`).
    * The loop is driver-side like the reference's (rate-limited HTTP); at
    * scale it becomes foreachPartition with per-partition throttling. */
  def downloadAndStore(toDownload: DataFrame, fetch: String => Array[Byte],
      storeDir: String): DataFrame = {
    val spark = toDownload.sparkSession
    import spark.implicits._
    val rows = toDownload
      .select("EPAREGNO", "PRODUCTNAME", "PDFFILE", "PDFFILE_ACCEPTED_DATE")
      .collect()
    val recs = rows.toSeq.map { r =>
      val (regno, pname, pdf, accepted) = (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3))
      val clean = BinaryStore.sanitizeFilename(s"${pname}_$regno") + ".pdf"
      val rel = s"EPA_LABEL_PDF/$clean"
      try {
        val bytes = fetch(pdf)
        BinaryStore.put(storeDir, rel, bytes)
        (pname, s"$storeDir/$rel", pdf, bytes.length.toLong, "PENDING",
          regno, clean, accepted, pdf)
      } catch {
        case scala.util.control.NonFatal(_) =>
          (pname, null: String, pdf, 0L, "FAILED", regno, clean, accepted, pdf)
      }
    }
    recs.toDF("PRODUCT_NAME", "STAGE_FILE_PATH", "ORIGINAL_URL",
        "FILE_SIZE_BYTES", "PROCESSING_STATUS", "EPAREGNO",
        "PDF_FILE_NAME", "PDFFILE_ACCEPTED_DATE", "PDFFILE")
      .withColumn("UPLOAD_TIMESTAMP", current_timestamp())
  }

  /** Metadata MERGE on EPAREGNO (`epa_ingestion.py:551-637`, D5) with
    * the table's AUTOINCREMENT surrogate id (`epa_ingestion.py:237`):
    * the TABLE assigns ids at merge time (like the warehouse sequence),
    * so `fresh` arrives id-less, matched rows keep their id, and new
    * rows extend densely in (EPAREGNO, PDFFILE) order — stable across
    * re-merges. */
  def mergeMetadata(existing: DataFrame, fresh: DataFrame): DataFrame =
    Dml.mergeWithAutoId(existing,
      fresh.select(existing.columns.filterNot(_ == "ID").map(col): _*),
      Seq("EPAREGNO"), Seq("EPAREGNO", "PDFFILE"))

  /** VW_PDF_TO_CHUNK (`epa_ingestion.py:484-501`): binary-store directory
    * table ⋈ PENDING metadata on the derived relative-path key (J4/P6 —
    * extract-then-equi-join, not the reference's LIKE-suffix theta). */
  def pdfToChunk(spark: SparkSession, storeDir: String,
      metadata: DataFrame): DataFrame = {
    val dir = BinaryStore.directoryTable(spark, s"$storeDir/EPA_LABEL_PDF")
    val pending = metadata
      .filter(col("PROCESSING_STATUS") === "PENDING")
      .withColumn("META_RELATIVE_PATH",
        regexp_extract(col("STAGE_FILE_PATH"), "EPA_LABEL_PDF/.*$", 0))
    dir.withColumn("RELATIVE_PATH",
        concat(lit("EPA_LABEL_PDF/"), col("relative_path")))
      .join(pending, col("RELATIVE_PATH") === col("META_RELATIVE_PATH"))
      .select(col("RELATIVE_PATH"), col("size").as("SIZE"),
        col("file_url").as("FILE_URL"), col("content"),
        col("EPAREGNO"), col("PRODUCT_NAME"))
  }

  /** Chunk-processing transaction (`epa_ingestion.py:732-789`, D1+D2+J5):
    * delete chunks of files being re-chunked (idempotency), fan each
    * document out through the native ChunkGenerator, append. `parse` is
    * the injectable PARSE_DOCUMENT edge (bytes → text); it DEFAULTS to
    * the real pure-JVM extractor ([[graft.sources.PdfText.extract]] —
    * FlateDecode + literal-string Tj/TJ, proven against the reference's
    * own label PDFs in PdfTextSpec), with injection retained for
    * documents needing a richer parser (CMap'd fonts). Returns the new
    * chunk table. */
  def processChunks(chunks: DataFrame, toChunk: DataFrame,
      parse: Array[Byte] => String = graft.sources.PdfText.extract)
      : DataFrame = {
    val parseUdf = udf(parse)
    val fresh = graft.functions.ChunkFunctions.chunkDocsNative(
      toChunk.withColumn("TEXT", parseUdf(col("content")))
        .select("RELATIVE_PATH", "SIZE", "FILE_URL", "EPAREGNO", "TEXT"),
      textCol = "TEXT")
      .withColumnRenamed("chunk", "CHUNK")
      .withColumnRenamed("chunk_index", "CHUNK_INDEX")
    Dml.deleteUsing(chunks, fresh.select("RELATIVE_PATH").distinct(),
      Seq("RELATIVE_PATH"))
      .unionByName(fresh, allowMissingColumns = true)
  }

  /** Status advance PENDING→CHUNKED for just-chunked files, keyed on the
    * derived relative path (`epa_ingestion.py:769-775`, D3). `chunked` is
    * a DataFrame with a RELATIVE_PATH column (e.g. the processChunks
    * output) — the update joins distributed, never collecting paths into
    * a driver-side In(...) literal. */
  def markChunked(metadata: DataFrame, chunked: DataFrame): DataFrame = {
    val paths = chunked.select(col("RELATIVE_PATH").as("__rel")).distinct()
    val withKey = metadata.withColumn("__rel",
      regexp_extract(col("STAGE_FILE_PATH"), "EPA_LABEL_PDF/.*$", 0))
    Dml.updateFrom(withKey, paths, Seq("__rel"),
        Map("PROCESSING_STATUS" ->
          when(col("PROCESSING_STATUS") === "PENDING", lit("CHUNKED"))
            .otherwise(col("PROCESSING_STATUS"))))
      .drop("__rel")
  }

  /** Chunk enrichment (`epa_ingestion.py:791-836`, D4+A1): company /
    * product attributes plus the ARRAY_AGG(TYPE) category array joined
    * onto every chunk. */
  def updateCategory(chunks: DataFrame, products: DataFrame,
      company: DataFrame, types: DataFrame): DataFrame = {
    val typeArr = types.groupBy(col("EPAREGNO"))
      .agg(array_sort(collect_list(col("TYPE"))).as("CATEGORY_EPA_TYPE"))
    chunks
      .join(broadcast(products.select(col("EPAREGNO"), col("PRODUCTNAME"),
        col("SIGNAL_WORD"))), Seq("EPAREGNO"), "left")
      .join(broadcast(company.select(col("EPAREGNO"),
        col("NAME").as("COMPANYNAME"))), Seq("EPAREGNO"), "left")
      .join(broadcast(typeArr), Seq("EPAREGNO"), "left")
  }
}
