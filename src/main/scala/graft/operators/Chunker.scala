package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

import scala.collection.mutable.ArrayBuffer

/** Text chunking (SURVEY.md §2.8 U1): the reference's TEXT_CHUNKER UDTF
  * (`epa_ingestion.py:265-294`) wraps the recursive character splitter
  * with chunk_size=1512, chunk_overlap=256, length=char count
  * (`epa_ingestion.py:283-284`). This is a pure-Scala port of that public
  * algorithm (separators "\n\n", "\n", " ", "" — greedy merge to the size
  * cap with trailing-window overlap), exposed two ways:
  *
  *  - [[chunkText]]: pure function for unit tests / driver-side use;
  *  - [[chunkDocs]]: the lateral-join form (J5) — `posexplode` over a UDF,
  *    one input row fanning out to N (chunk_index, chunk) rows inside the
  *    executor task, no extra shuffle. At 100 TB the fan-out (~len/1256)
  *    is bounded by the 16 MB max cell (`epa_ingestion.py:254-259`).
  */
object Chunker {

  val DefaultChunkSize = 1512
  val DefaultOverlap = 256
  val DefaultSeparators: Seq[String] = Seq("\n\n", "\n", " ", "")

  /** Split `text` recursively: try the coarsest separator present; pieces
    * still over the cap are re-split with the remaining separators; sibling
    * pieces are greedily merged up to `chunkSize` chars, keeping a trailing
    * window of ≤ `overlap` chars between consecutive chunks. Separators are
    * kept (prefixed onto the following piece), matching the reference
    * UDTF's observable output. */
  def chunkText(text: String,
      chunkSize: Int = DefaultChunkSize,
      overlap: Int = DefaultOverlap,
      separators: Seq[String] = DefaultSeparators): Seq[String] =
    if (text == null || text.isEmpty) Seq.empty
    else splitRecursive(text, chunkSize, overlap, separators)

  /** Offset-based core. Because pieces carry their separator as a prefix
    * and sibling pieces merge with the empty join string, every emitted
    * chunk is a (stripped) contiguous substring of the input — so the
    * whole algorithm runs on boundary indices and allocates exactly one
    * String per chunk. (The naive piece-String form measured 340 µs per
    * 3 kB doc; this is ~10 µs — it's the reference's hottest operator,
    * `epa_ingestion.py:265-294`, so constant factors matter at scale.) */
  private def splitRecursive(text: String, chunkSize: Int, overlap: Int,
      separators: Seq[String]): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    splitRegion(text, 0, text.length, chunkSize, overlap, separators, out)
    out.toSeq
  }

  private def splitRegion(text: String, from: Int, to: Int, chunkSize: Int,
      overlap: Int, separators: Seq[String], out: ArrayBuffer[String]): Unit = {
    // pick the first separator that occurs in the region ("" as last resort)
    var sep = separators.lastOption.getOrElse("")
    var rest: Seq[String] = Seq.empty
    var i = 0
    var found = false
    while (i < separators.length && !found) {
      val s = separators(i)
      if (s.isEmpty) { sep = s; found = true }
      else {
        val idx = text.indexOf(s, from)
        if (idx >= 0 && idx <= to - s.length) {
          sep = s; rest = separators.drop(i + 1); found = true
        }
      }
      i += 1
    }

    // piece k = text[bounds(k), bounds(k+1)): separator occurrences start
    // a new piece (separator attached as prefix of the following piece)
    val bounds = ArrayBuffer[Int](from)
    if (sep.isEmpty) {
      var p = from + 1
      while (p <= to) { bounds += p; p += 1 }
    } else {
      var idx = text.indexOf(sep, from)
      while (idx >= 0 && idx <= to - sep.length) {
        if (idx > bounds.last) bounds += idx
        idx = text.indexOf(sep, idx + sep.length)
      }
      if (to > bounds.last) bounds += to
    }

    // good (= under-cap) runs merge greedily with the overlap window;
    // an over-cap piece flushes the run and recurses with the remaining
    // separators (or is emitted verbatim when none remain)
    val run = ArrayBuffer.empty[Int] // boundary offsets of the current run
    def flushRun(): Unit = { mergeRun(text, run, chunkSize, overlap, out); run.clear() }
    var k = 0
    while (k < bounds.length - 1) {
      val a = bounds(k)
      val b = bounds(k + 1)
      if (b - a < chunkSize) {
        if (run.isEmpty) run += a
        run += b
      } else {
        flushRun()
        if (rest.isEmpty) out += text.substring(a, b)
        else splitRegion(text, a, b, chunkSize, overlap, rest, out)
      }
      k += 1
    }
    flushRun()
  }

  /** Greedy merge with trailing-window overlap over one run of contiguous
    * pieces (`bounds(k)..bounds(k+1)`): emit when the next piece would
    * overflow, then slide the window start until ≤ `overlap` chars remain. */
  private def mergeRun(text: String, bounds: ArrayBuffer[Int], chunkSize: Int,
      overlap: Int, out: ArrayBuffer[String]): Unit = {
    if (bounds.length < 2) return
    val m = bounds.length - 1
    def emit(a: Int, b: Int): Unit = {
      val t = text.substring(a, b).strip()
      if (t.nonEmpty) out += t
    }
    var lo = 0
    var hi = 0 // window = pieces [lo, hi); total chars = bounds(hi)-bounds(lo)
    var total = 0
    var k = 0
    while (k < m) {
      val len = bounds(k + 1) - bounds(k)
      if (total + len > chunkSize && hi > lo) {
        emit(bounds(lo), bounds(hi))
        while (total > overlap || (total + len > chunkSize && total > 0)) {
          total -= bounds(lo + 1) - bounds(lo)
          lo += 1
        }
      }
      hi = k + 1
      total += len
      k += 1
    }
    if (hi > lo) emit(bounds(lo), bounds(hi))
  }

  // ---- DataFrame surface ----

  /** Lateral-join chunking (J5/U1): `docs(textCol)` → one row per chunk
    * with `chunk_index`. Runs inside whole-stage-codegen'd Generate; the
    * UDF is the only non-codegen hop (acceptable: it is the operator's
    * payload, not plumbing). */
  def chunkDocs(docs: DataFrame, textCol: String = "text",
      chunkSize: Int = DefaultChunkSize,
      overlap: Int = DefaultOverlap): DataFrame = {
    val chunker = udf((t: String) => chunkText(t, chunkSize, overlap))
    docs.select(
        docs.columns.map(col).toIndexedSeq :+
          posexplode(chunker(col(textCol))).as(Seq("chunk_index", "chunk")): _*)
      .drop(textCol)
  }

  /** Typed Dataset face (SURVEY §1.3: typed where flatMap chunking
    * benefits from compile-time fields): one (id, text) in, N
    * (id, chunk_index, chunk) out via flatMap. Same fan-out shape as the
    * Generator path, with case-class safety for pipeline code. */
  def chunkDocsTyped(ds: org.apache.spark.sql.Dataset[(Long, String)],
      chunkSize: Int = DefaultChunkSize,
      overlap: Int = DefaultOverlap):
      org.apache.spark.sql.Dataset[(Long, Int, String)] = {
    import ds.sparkSession.implicits._
    ds.flatMap { case (id, text) =>
      chunkText(text, chunkSize, overlap).zipWithIndex.map {
        case (c, i) => (id, i, c)
      }
    }
  }

  // ---- fixture-backed query surface ----

  /** q24 — fixed-stride chunker over documents (size 1512, stride 1256 =
    * size - overlap): the SQL-expressible cousin of the recursive splitter,
    * oracle-checked; the recursive splitter itself is pinned by ScalaTest
    * unit vectors (non-SQL-expressible). */
  def q24ChunkFixed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val size = DefaultChunkSize
    val stride = DefaultChunkSize - DefaultOverlap
    // fixture texts are shorter than one chunk; repeat ×10 (≈3 kB) so the
    // fan-out (J5's one-row→N-chunks shape) actually exercises
    Tables.documents(s, dir)
      .withColumn("body", repeat(concat($"text", lit(" ")), 10))
      .withColumn("start",
        explode(sequence(lit(0), greatest(lit(0),
          floor((length($"body") - lit(1)) / lit(stride)).cast("int")))))
      .select($"doc_id", ($"start" * stride).as("chunk_start"),
        $"body".substr($"start" * stride + 1, lit(size)).as("chunk"))
      .withColumn("chunk_len", length($"chunk"))
      .orderBy($"doc_id", $"chunk_start")
  }

  val q24Oracle: String =
    """WITH d AS (SELECT doc_id, repeat(text || ' ', 10) AS body FROM documents)
      |SELECT d.doc_id, (s.g * 1256) AS chunk_start,
      |       substring(d.body, s.g * 1256 + 1, 1512) AS chunk,
      |       length(substring(d.body, s.g * 1256 + 1, 1512)) AS chunk_len
      |FROM d,
      |     LATERAL (SELECT unnest(generate_series(0,
      |        greatest(0, CAST(floor((length(d.body) - 1) / 1256.0) AS INT)))) AS g) s
      |ORDER BY doc_id, chunk_start""".stripMargin

  /** q25 — recursive chunker stats per document. The DuckDB oracle
    * replays the greedy merge as a recursive CTE over space-boundary
    * offsets: every chunk is a trimmed contiguous substring, the next
    * window start is the first boundary within the overlap-and-capacity
    * envelope, so the walk is one row per emitted chunk. Valid because
    * the fixture corpus is single-separator (no newlines, words ≤ 8
    * chars — every piece under the cap); the general multi-separator
    * recursion is pinned by ChunkerSpec's unit vectors instead. */
  def q25ChunkRecursive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .withColumn("text", repeat(concat($"text", lit(" ")), 10))
    // native Generator path (ChunkGenerator); chunkDocs is the UDF twin —
    // ChunkerSpec pins their equivalence
    graft.functions.ChunkFunctions.chunkDocsNative(docs)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"), max(length($"chunk")).as("max_len"))
      .orderBy($"doc_id")
  }

  val q25Oracle: String =
    """WITH RECURSIVE
      |d AS (SELECT doc_id, repeat(text || ' ', 10) AS body FROM documents),
      |pos AS (SELECT doc_id, g.i - 1 AS b
      |        FROM d, LATERAL (SELECT unnest(generate_series(1, len(body))) AS i) g
      |        WHERE substr(body, g.i, 1) = ' '),
      |bl AS (SELECT doc_id, list_sort(list(b)) AS sp FROM pos GROUP BY doc_id),
      |bn AS (SELECT d.doc_id, d.body,
      |              list_concat(list_concat([0], bl.sp), [len(d.body)]) AS bounds
      |       FROM d JOIN bl USING (doc_id)),
      |walk AS (
      |  SELECT doc_id, body, bounds, 1 AS lo, CAST(NULL AS VARCHAR) AS chunk,
      |         false AS done
      |  FROM bn
      |  UNION ALL
      |  SELECT doc_id, body, bounds,
      |    CASE WHEN hi = m THEN lo
      |         ELSE m - len(list_filter(bounds, x -> x >=
      |                greatest(bounds[hi] - 256,
      |                         bounds[hi] - 1512 + (bounds[hi + 1] - bounds[hi])))) + 1
      |    END AS lo,
      |    trim(substr(body, bounds[lo] + 1, bounds[hi] - bounds[lo])) AS chunk,
      |    hi = m AS done
      |  FROM (SELECT doc_id, body, bounds, lo,
      |               len(bounds) AS m,
      |               len(list_filter(bounds, x -> x <= bounds[lo] + 1512)) AS hi
      |        FROM walk WHERE NOT done)
      |),
      |chunks AS (SELECT doc_id, chunk FROM walk
      |           WHERE chunk IS NOT NULL AND chunk <> '')
      |SELECT doc_id, count(*) AS n_chunks, max(len(chunk)) AS max_len
      |FROM chunks GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_chunk_fixed" -> q24ChunkFixed _,
    "q25_chunk_recursive" -> q25ChunkRecursive _)

  val oracle: Map[String, String] = Map(
    "q24_chunk_fixed" -> q24Oracle,
    "q25_chunk_recursive" -> q25Oracle)
}
