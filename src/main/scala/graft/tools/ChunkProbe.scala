package graft.tools

import graft.operators.Chunker
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Scratch profiler + differential check for the chunker rewrite: the
  * offset-based splitter must emit byte-identical chunks to the original
  * piece-String algorithm (kept here as the reference implementation). */
object ChunkProbe {

  // ---- original (round-1) implementation, verbatim, as the oracle ----
  private def chunkTextRef(text: String, chunkSize: Int = 1512,
      overlap: Int = 256,
      separators: Seq[String] = Seq("\n\n", "\n", " ", "")): Seq[String] =
    if (text == null || text.isEmpty) Seq.empty
    else splitRecursiveRef(text, chunkSize, overlap, separators)

  private def splitRecursiveRef(text: String, chunkSize: Int, overlap: Int,
      separators: Seq[String]): Seq[String] = {
    var separator = separators.lastOption.getOrElse("")
    var newSeparators: Seq[String] = Seq.empty
    var i = 0
    var found = false
    while (i < separators.length && !found) {
      val s = separators(i)
      if (s.isEmpty) { separator = s; found = true }
      else if (text.contains(s)) {
        separator = s; newSeparators = separators.drop(i + 1); found = true
      }
      i += 1
    }
    val splits =
      if (separator.isEmpty) text.map(_.toString)
      else {
        val parts = ArrayBuffer.empty[String]
        var from = 0
        var idx = text.indexOf(separator)
        var first = true
        while (idx >= 0) {
          parts += (if (first) text.substring(from, idx)
            else separator + text.substring(from, idx))
          first = false
          from = idx + separator.length
          idx = text.indexOf(separator, from)
        }
        parts += (if (first) text.substring(from) else separator + text.substring(from))
        parts.filter(_.nonEmpty).toSeq
      }
    val finalChunks = ArrayBuffer.empty[String]
    val goodSplits = ArrayBuffer.empty[String]
    for (s <- splits) {
      if (s.length < chunkSize) goodSplits += s
      else {
        if (goodSplits.nonEmpty) {
          finalChunks ++= mergeSplitsRef(goodSplits.toSeq, "", chunkSize, overlap)
          goodSplits.clear()
        }
        if (newSeparators.isEmpty) finalChunks += s
        else finalChunks ++= splitRecursiveRef(s, chunkSize, overlap, newSeparators)
      }
    }
    if (goodSplits.nonEmpty)
      finalChunks ++= mergeSplitsRef(goodSplits.toSeq, "", chunkSize, overlap)
    finalChunks.toSeq
  }

  private def mergeSplitsRef(splits: Seq[String], separator: String,
      chunkSize: Int, overlap: Int): Seq[String] = {
    val sepLen = separator.length
    val docs = ArrayBuffer.empty[String]
    var current = ArrayBuffer.empty[String]
    var total = 0
    def joinDocs(ds: Seq[String]): Option[String] = {
      val t = ds.mkString(separator).strip()
      if (t.isEmpty) None else Some(t)
    }
    for (d <- splits) {
      val len = d.length
      if (total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize) {
        if (current.nonEmpty) {
          joinDocs(current.toSeq).foreach(docs += _)
          while (total > overlap ||
            (total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize && total > 0)) {
            total -= current.head.length + (if (current.length > 1) sepLen else 0)
            current = current.drop(1)
          }
        }
      }
      current += d
      total += len + (if (current.length > 1) sepLen else 0)
    }
    joinDocs(current.toSeq).foreach(docs += _)
    docs.toSeq
  }

  // ---- harness ----
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val texts = graft.sources.Tables.documents(spark, dir)
      .select(concat($"text", lit(" ")).as("t"))
      .as[String].collect().map(t => t * 10)
    println(s"docs=${texts.length} avgLen=${texts.map(_.length).sum / texts.length}")

    // differential: fixture docs, several (size, overlap) configs
    var diffs = 0
    for (t <- texts; (cs, ov) <- Seq((1512, 256), (200, 50), (100, 20))) {
      if (Chunker.chunkText(t, cs, ov) != chunkTextRef(t, cs, ov)) diffs += 1
    }
    // differential: random soups MIXING separators within one document
    // (per-join choice, so "\n\n" regions internally mix "\n" and " " —
    // exercising the multi-level splitRegion recursion), incl. giant
    // unbreakable words that fall through to the char split
    val rnd = new scala.util.Random(7)
    val seps = Array(" ", " ", " ", "\n", "\n", "\n\n")
    for (n <- 1 to 3000) {
      val sb = new StringBuilder
      for (w <- 0 until rnd.nextInt(300)) {
        if (w > 0) sb.append(seps(rnd.nextInt(seps.length)))
        sb.append(rnd.alphanumeric.take(1 + rnd.nextInt(200)).mkString)
      }
      val t = sb.toString
      val cs = 50 + rnd.nextInt(400)
      val ov = rnd.nextInt(cs / 2)
      if (Chunker.chunkText(t, cs, ov) != chunkTextRef(t, cs, ov)) {
        diffs += 1
        if (diffs == 1) println(s"FIRST DIFF at n=$n cs=$cs ov=$ov len=${t.length}")
      }
    }
    println(s"differential: $diffs diffs")

    var n = 0
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      n = texts.map(t => Chunker.chunkText(t).length).sum
      println(f"pure chunkText pass: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n chunks)")
    }
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.operators.Chunker.queries("q25_chunk_recursive")(spark, dir).count()
      println(f"q25 plan: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
