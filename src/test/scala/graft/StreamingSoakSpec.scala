package graft

import graft.operators.{Chunker, Dedup, Multimodal}
import graft.sources.{RestSource, Tables}
import graft.streaming.{DedupIndexStream, PhashIndexStream, SearchIndexStream}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.net.{InetSocketAddress, URI}
import java.nio.file.Files

/** Composed streaming soak — the per-maintainer streaming ≡ batch specs
  * each prove ONE index in isolation; this drives the whole ingestion
  * shape at once: REST fetch (real loopback HTTP) → shred → document
  * rows → chunk, feeding THREE incremental indexes (search stats over
  * chunks, MinHash near-dup over documents, phash near-dup over
  * documents) through a 10-batch sharded replay with a mid-run stop
  * (all three maintainers terminate after 5 shards — the kill point),
  * a crash-retry (an already-applied batchId re-delivered to each),
  * and a resume over the remaining 5 shards. At the end every index
  * must equal its batch twin computed single-shot over the SAME final
  * corpus from the SAME shared kernels. */
class StreamingSoakSpec extends SparkSuite {

  private def epaJson(regno: String): String =
    s"""{"items":[{"eparegno":"$regno","productname":"SOAK PRODUCT $regno",
       |"signal_word":"CAUTION","product_status":"Active","cancel_flag":"N",
       |"companyinfo":[{"name":"SOAK CO $regno","city":"X","state":"CT"}],
       |"pdffiles":[{"epa_reg_num":"$regno","pdffile":"$regno.pdf",
       |"pdffile_accepted_date":"2020-01-01"}]}]}""".stripMargin
      .replace("\n", "")

  private def withServer[A](f: Int => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/product/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val key = ex.getRequestURI.getPath.stripPrefix("/product/")
        val body = epaJson(key).getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.start()
    try f(server.getAddress.getPort)
    finally server.stop(0)
  }

  private def httpFetch(port: Int): String => String = { key =>
    val conn = new URI(s"http://127.0.0.1:$port/product/$key").toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    try {
      require(conn.getResponseCode / 100 == 2, s"HTTP ${conn.getResponseCode}")
      new String(conn.getInputStream.readAllBytes(), "UTF-8")
    } finally conn.disconnect()
  }

  test("10-batch REST→shred→chunk soak: 3 maintainers, kill/resume, ≡ batch") {
    import spark.implicits._

    // ---- front half: REST fetch over a real socket → shred → doc rows.
    // The fetched products become documents with synthetic high ids; the
    // repeated-phrase text makes them chunk-sized AND gives the dedup
    // index real shingle overlap between REST docs (shared boilerplate —
    // exactly the near-dup structure a label corpus has).
    val keys = (1 to 4).map(i => f"soak-$i%03d")
    val restDocs = withServer { port =>
      val fetched = RestSource.fetchDriver(spark, keys, httpFetch(port))
      assert(fetched.filter($"error".isNotNull).count() == 0)
      // unwrap the items envelope — the shredder's input is the product
      // document itself (the RestSourceSpec S2 hand-off)
      val star = graft.operators.Shred.shredJson(spark,
        fetched.select($"json").as[String].collect().toSeq
          .map(j => j.substring(j.indexOf("[") + 1, j.lastIndexOf("]"))))
      star("products")
        .select(col("EPAREGNO"), col("PRODUCTNAME"))
        .collect().toSeq.sortBy(_.getString(0)).zipWithIndex
        .map { case (r, i) =>
          val body = (s"${r.getString(1)} perimeter barrier spray label " +
            "directions for use keep out of reach of children ") * 4
          (9000000L + i, body.trim, "en", "rest", body.trim.length.toLong)
        }
    }
    assert(restDocs.size == 4)
    val docs = Tables.documents(spark, sfDir).unionByName(
      restDocs.toDF("doc_id", "text", "lang", "source", "n_chars")).cache()

    // chunks are the searchable unit (the reference's chunk→index shape);
    // chunk ids stay collision-free: doc ids are ≤ 9e6+4 and chunk
    // counts < 100 at this size/overlap
    val chunks = Chunker.chunkDocs(docs, chunkSize = 120, overlap = 20)
      .select(($"doc_id" * 100 + $"chunk_index").as("doc_id"),
        $"chunk".as("text"), $"lang", $"source",
        length($"chunk").cast("long").as("n_chars"))
      .cache()
    assert(chunks.count() > docs.count(), "chunking must actually split")

    // ---- stage the replay: 10 single-file shards per input, reverse
    // residue order so pair discovery can't ride arrival order
    val searchIn = Files.createTempDirectory("graft_soak_search_").toString
    val dedupIn = Files.createTempDirectory("graft_soak_dedup_").toString
    val phashIn = Files.createTempDirectory("graft_soak_phash_").toString
    def shard(df: DataFrame, dir: String, residues: Seq[Int]): Unit =
      residues.foreach { r =>
        df.filter($"doc_id" % 10 === r).coalesce(1)
          .write.mode("append").parquet(dir)
      }
    val firstHalf = Seq(9, 7, 5, 3, 1)
    val secondHalf = Seq(8, 6, 4, 2, 0)
    shard(chunks, searchIn, firstHalf)
    shard(docs, dedupIn, firstHalf)
    shard(docs, phashIn, firstHalf)

    val searchState = Files.createTempDirectory("graft_soak_search_st_").toString
    val dedupState = Files.createTempDirectory("graft_soak_dedup_st_").toString
    val phashState = Files.createTempDirectory("graft_soak_phash_st_").toString

    // ---- first run: all three maintainers stop at the 5-shard kill point
    SearchIndexStream.maintain(spark, searchIn, searchState).awaitTermination()
    DedupIndexStream.maintain(spark, dedupIn, dedupState).awaitTermination()
    PhashIndexStream.maintain(spark, phashIn, phashState).awaitTermination()
    val midPairs = DedupIndexStream.readState(spark, dedupState)._3.count()

    // ---- crash-retry at the kill point: batchId 0 was applied by every
    // index; a redelivery must be a no-op (marker short-circuit)
    val redelivery = spark.read.parquet(dedupIn).limit(3)
    assert(DedupIndexStream.mergeBatch(redelivery, dedupState, 0L) == -1L)
    assert(PhashIndexStream.mergeBatch(redelivery, phashState, 0L) == -1L)
    SearchIndexStream.mergeBatch(redelivery, searchState, 0L)
    assert(DedupIndexStream.readState(spark, dedupState)._3.count() == midPairs)

    // ---- resume: the remaining 5 shards arrive; the stable checkpoints
    // consume ONLY the new files
    shard(chunks, searchIn, secondHalf)
    shard(docs, dedupIn, secondHalf)
    shard(docs, phashIn, secondHalf)
    SearchIndexStream.maintain(spark, searchIn, searchState).awaitTermination()
    DedupIndexStream.maintain(spark, dedupIn, dedupState).awaitTermination()
    PhashIndexStream.maintain(spark, phashIn, phashState).awaitTermination()

    // ---- batch twins over the SAME final corpus, from the SAME kernels
    // search: BM25 stats over all chunks
    val (tok, dl) = SearchIndexStream.readState(spark, searchState)
    val toks = chunks.select($"doc_id", explode(split($"text", " ")).as("token"))
    val twinTok = toks.select($"doc_id", $"token").distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val twinDl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    assert(tok.except(twinTok).isEmpty && twinTok.except(tok).isEmpty)
    assert(dl.except(twinDl).isEmpty && twinDl.except(dl).isEmpty)

    // dedup: single-shot MinHash+LSH pairs (uncapped band probe — the
    // maintainers' documented contract face)
    val wide = Dedup.minhashWide(docs)
    val bands = Dedup.lshBands(wide)
    val twinDedup = bands.as("x")
      .join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.bkey" === $"y.bkey" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b")).distinct()
      .join(wide.as("a"), $"doc_a" === $"a.doc_id")
      .join(wide.as("b"), $"doc_b" === $"b.doc_id")
      .select($"doc_a", $"doc_b",
        round(Dedup.signatureMatchFraction, 6).as("est_sim"))
    val streamDedup = DedupIndexStream.readState(spark, dedupState)._3
    assert(streamDedup.count() > midPairs, "resume must add cross-half pairs")
    assert(streamDedup.except(twinDedup).isEmpty &&
      twinDedup.except(streamDedup).isEmpty)
    // the REST docs' shared boilerplate must have been discovered as
    // near-dups ACROSS shards (their ids land in different residues)
    assert(streamDedup.filter($"doc_a" >= 9000000L).count() > 0)

    // phash: single-shot aHash band pairs + the shared presentation
    val hashes = Multimodal.imageHashesOf(docs).cache()
    val pbands = Multimodal.phashBands(hashes)
    val twinPhash = Multimodal.phashPresentation(pbands.as("x")
      .join(pbands.as("y"),
        $"x.band" === $"y.band" && $"x.bkey" === $"y.bkey" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b")).distinct()
      .join(hashes.select($"doc_id".as("doc_a"), $"lo".as("lo_a"),
        $"hi".as("hi_a")), Seq("doc_a"))
      .join(hashes.select($"doc_id".as("doc_b"), $"lo".as("lo_b"),
        $"hi".as("hi_b")), Seq("doc_b"))
      .withColumn("hamming", Multimodal.hammingExpr))
    val streamPhash = PhashIndexStream.report(spark, phashState)
    assert(twinPhash.count() > 0)
    assert(streamPhash.collect().toSeq == twinPhash.collect().toSeq)

    docs.unpersist(); chunks.unpersist(); hashes.unpersist()
  }
}
