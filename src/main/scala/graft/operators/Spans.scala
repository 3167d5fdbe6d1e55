package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Span-level dedup operators — the exact-substring family between
  * document-level dedup (q26-q29) and n-gram audits (q81/q83):
  *
  *  - q84: duplicate-span coverage (Lee et al., "Deduplicating Training
  *    Data Makes Language Models Better", arXiv:2107.06499 — remove
  *    verbatim substrings shared across documents, here measured as the
  *    fraction of each document covered by cross-document duplicate
  *    10-token spans, with overlapping spans merged into islands first
  *    so coverage never double-counts).
  *  - q85: winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
  *    — the MOSS local fingerprinting scheme: k-gram hashes, sliding
  *    window of w, keep each window's minimum; guarantees any shared run
  *    of ≥ k+w-1 tokens shares a fingerprint).
  *
  * Scale shape: both shuffle one row per n-gram POSITION at most —
  * q84's duplicate-gram set is reduced to one row per DISTINCT gram
  * (map-side combined) before the probe join, and the island merge is a
  * per-document window over only the *duplicate* positions (a tiny
  * minority at any real dup rate); q85's window min is per-document
  * (partition-local after one hash shuffle) and fingerprints collapse
  * ~1/w of positions before leaving the task. At 100 TB the gram
  * strings would be hashed to 64-bit longs before shuffling, exactly
  * like the q27 shingle kernel — at fixture scale raw strings keep the
  * DuckDB oracle trivially identical.
  */
object Spans {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // ---------------------------------------------------------------- q84

  /** q84 — duplicate-span coverage. A 10-token gram is duplicated when
    * the identical text occurs in ≥ 2 distinct documents; a token is
    * covered when any duplicated gram's [start, start+9] span contains
    * it. Overlapping/adjacent spans are merged per document (classic
    * gaps-and-islands over a running max of span ends) so coverage is
    * exact, then each doc reports its covered-token fraction.
    *
    * Plan: one gram-hash shuffle to find duplicated grams (count
    * DISTINCT doc per gram, map-side combined), one semi-join back to
    * positions, one per-doc window over ONLY duplicate positions. No
    * all-pairs stage anywhere — cost is O(positions) + O(dup positions
    * · log) regardless of corpus size. */
  def q84DupSpanCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = docs(s, dir)
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 10)
      .select($"doc_id", size($"t").cast("long").as("n_tokens"), $"t")
    val grams = base.select($"doc_id", $"n_tokens", posexplode(expr(
        """transform(sequence(1, size(t) - 9),
          |  i -> concat_ws(' ', slice(t, i, 10)))""".stripMargin))
        .as(Seq("off", "gram")))
      .select($"doc_id", $"n_tokens", ($"off" + 1).cast("long").as("start"),
        $"gram")
    val dup = grams.groupBy($"gram")
      .agg(countDistinct($"doc_id").as("nd")).filter($"nd" > 1)
      .select($"gram")
    val dupPos = grams.join(dup, Seq("gram"), "left_semi")
    // gaps-and-islands: a span opens a new island iff it starts past the
    // running max end of everything before it
    val before = Window.partitionBy($"doc_id").orderBy($"start")
      .rowsBetween(Window.unboundedPreceding, -1)
    val upToHere = Window.partitionBy($"doc_id").orderBy($"start")
      .rowsBetween(Window.unboundedPreceding, 0)
    val islands = dupPos
      .withColumn("prev_end", max($"start" + 9).over(before))
      .withColumn("new_isl",
        when($"prev_end".isNull || $"start" > $"prev_end", 1L).otherwise(0L))
      .withColumn("isl", sum($"new_isl").over(upToHere))
      .groupBy($"doc_id", $"isl")
      .agg(min($"start").as("lo"), max($"start" + 9).as("hi"))
    val perDoc = islands.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"), sum($"hi" - $"lo" + 1).as("n_covered"))
    base.select($"doc_id", $"n_tokens")
      .join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        coalesce($"n_spans", lit(0L)).as("n_spans"),
        coalesce($"n_covered", lit(0L)).as("n_covered"),
        round(coalesce($"n_covered", lit(0L)).cast("double") / $"n_tokens", 6)
          .as("dup_frac"))
      .orderBy($"doc_id")
  }

  val q84Oracle: String =
    """WITH base AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents WHERE len(string_split(text, ' ')) >= 10),
      |b2 AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens, t FROM base),
      |g AS (SELECT doc_id, n_tokens,
      |        CAST(i AS BIGINT) AS start,
      |        array_to_string(t[i : i + 9], ' ') AS gram
      |      FROM b2, unnest(generate_series(1, len(t) - 9)) AS u(i)),
      |dup AS (SELECT gram FROM g GROUP BY gram
      |        HAVING count(DISTINCT doc_id) > 1),
      |dp AS (SELECT g.doc_id, g.start FROM g
      |       WHERE g.gram IN (SELECT gram FROM dup)),
      |marked AS (SELECT doc_id, start,
      |             CASE WHEN max(start + 9) OVER (PARTITION BY doc_id
      |                    ORDER BY start
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |                    IS NULL
      |               OR start > max(start + 9) OVER (PARTITION BY doc_id
      |                    ORDER BY start
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |             THEN 1 ELSE 0 END AS new_isl
      |           FROM dp),
      |isl AS (SELECT doc_id, start,
      |          sum(new_isl) OVER (PARTITION BY doc_id ORDER BY start
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      |        FROM marked),
      |spans AS (SELECT doc_id, isl, min(start) AS lo, max(start + 9) AS hi
      |          FROM isl GROUP BY 1, 2),
      |per_doc AS (SELECT doc_id, count(*) AS n_spans,
      |              sum(hi - lo + 1) AS n_covered
      |            FROM spans GROUP BY 1)
      |SELECT b2.doc_id, b2.n_tokens,
      |       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
      |       CAST(coalesce(p.n_covered, 0) AS BIGINT) AS n_covered,
      |       round(CAST(coalesce(p.n_covered, 0) AS DOUBLE) / b2.n_tokens, 6)
      |         AS dup_frac
      |FROM b2 LEFT JOIN per_doc p ON b2.doc_id = p.doc_id
      |ORDER BY b2.doc_id""".stripMargin

  // ---------------------------------------------------------------- q85

  /** q85 — winnowing fingerprints: hash every 5-token gram (md5 prefix —
    * identical derivation both engines), slide a w=4 window over the
    * per-document gram-hash sequence, keep each full window's minimum,
    * then the DISTINCT selected hashes are the document's fingerprint
    * set. Guarantee (SIGMOD'03): documents sharing ≥ 8 consecutive
    * tokens (k+w-1) share at least one fingerprint — the basis for
    * plagiarism-style partial-overlap detection at a density of ~2/(w+1)
    * of all grams. Per-doc output: fingerprint count, density, and an
    * order-insensitive digest of the sorted fingerprint set. */
  def q85Winnowing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread the gram-hash map work (round 22): one md5 per gram over
    // the whole corpus otherwise runs on the single scan task of the
    // small parquet file — the probe measured a 645 ms 1-task stage
    // (the q111 bigram-hash fix applied here; width is input-bytes-
    // derived, not a local core-count constant)
    val par = Tables.fanoutParallelism(s, dir, "documents", 16 << 10)
    val grams = docs(s, dir).repartition(par)
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 8) // k + w - 1
      .select($"doc_id", size($"t").cast("long").as("n_tokens"), posexplode(expr(
        """transform(sequence(1, size(t) - 4),
          |  i -> substr(md5(concat_ws(' ', slice(t, i, 5))), 1, 16))"""
          .stripMargin)).as(Seq("off0", "h")))
      .select($"doc_id", $"n_tokens", ($"off0" + 1).as("off"), $"h") // 1-based
    // min over the w=4 grams starting here; defined only for full windows
    val win = Window.partitionBy($"doc_id").orderBy($"off")
      .rowsBetween(0, 3)
    val nGrams = Window.partitionBy($"doc_id")
    val selected = grams
      .withColumn("n_grams", count(lit(1)).over(nGrams))
      .withColumn("wmin", min($"h").over(win))
      .filter($"off" <= $"n_grams" - 3)
    selected.groupBy($"doc_id", $"n_tokens")
      .agg(countDistinct($"wmin").as("n_fp"),
        min($"wmin").as("min_fp"),
        md5(concat_ws(",", array_sort(collect_set($"wmin")))).as("fp_digest"))
      .select($"doc_id", $"n_tokens", $"n_fp",
        round($"n_fp".cast("double") / ($"n_tokens" - 4), 6).as("density"),
        $"min_fp", $"fp_digest")
      .orderBy($"doc_id")
  }

  val q85Oracle: String =
    """WITH base AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents WHERE len(string_split(text, ' ')) >= 8),
      |g AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
      |        i AS off,
      |        substr(md5(array_to_string(t[i : i + 4], ' ')), 1, 16) AS h
      |      FROM base, unnest(generate_series(1, len(t) - 4)) AS u(i)),
      |w AS (SELECT doc_id, n_tokens, off,
      |        count(*) OVER (PARTITION BY doc_id) AS n_grams,
      |        min(h) OVER (PARTITION BY doc_id ORDER BY off
      |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
      |      FROM g),
      |sel AS (SELECT doc_id, n_tokens, wmin FROM w
      |        WHERE off <= n_grams - 3)
      |SELECT doc_id, n_tokens,
      |       CAST(count(DISTINCT wmin) AS BIGINT) AS n_fp,
      |       round(CAST(count(DISTINCT wmin) AS DOUBLE) / (n_tokens - 4), 6)
      |         AS density,
      |       min(wmin) AS min_fp,
      |       md5(string_agg(DISTINCT wmin, ',' ORDER BY wmin)) AS fp_digest
      |FROM sel GROUP BY doc_id, n_tokens
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q119

  /** q119 — document-stitching detection: doc A's TRAILING word 3-gram
    * equals doc B's LEADING 3-gram, the signature of one original
    * document split across two records (chunked uploads, paginated
    * crawls, MIME-split mail archives). Span dedup (q84) finds shared
    * INTERIOR grams; this finds the boundary-adjacency that says two
    * records should be REJOINED, not deduped.
    *
    * Scale shape: each doc contributes exactly ONE starter row and ONE
    * ender row (map-side element_at, no explode), so the gram-keyed
    * equi-join shuffles 2 rows/doc regardless of document length. A
    * boilerplate boundary gram fans out |enders|×|starters| rows in the
    * join — as an equi-join (not an in-task explode) that skew is
    * AQE-splittable, and a production corpus with templated
    * openers/closers should add the Jaccard-style stop-gram cap
    * (df-filter both sides) before the join; the fixture's boundary
    * grams are content-random so the uncapped join is the honest
    * baseline here. */
  def q119StitchDetection(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docs(s, dir)
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
    val first = toks.select($"doc_id",
      concat_ws(" ", element_at($"t", 1), element_at($"t", 2),
        element_at($"t", 3)).as("g"))
    val last = toks.select($"doc_id",
      concat_ws(" ", element_at($"t", -3), element_at($"t", -2),
        element_at($"t", -1)).as("g"))
    val grouped = last.select($"g", $"doc_id".as("ender"))
      .join(first.select($"g", $"doc_id".as("starter")), Seq("g"))
      .filter($"ender" =!= $"starter")
    grouped
      .select($"ender".as("doc_a"), $"starter".as("doc_b"),
        $"g".as("boundary"))
      .orderBy($"doc_a", $"doc_b")
  }

  val q119Oracle: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents
      |              WHERE len(string_split(text, ' ')) >= 3),
      |f AS (SELECT doc_id, t[1] || ' ' || t[2] || ' ' || t[3] AS g
      |      FROM toks),
      |l AS (SELECT doc_id,
      |        t[len(t) - 2] || ' ' || t[len(t) - 1] || ' ' || t[len(t)] AS g
      |      FROM toks)
      |SELECT l.doc_id AS doc_a, f.doc_id AS doc_b, l.g AS boundary
      |FROM l JOIN f ON l.g = f.g AND l.doc_id <> f.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q84_dup_span_coverage" -> q84DupSpanCoverage _,
    "q85_winnowing" -> q85Winnowing _,
    "q119_stitch_detection" -> q119StitchDetection _)

  val oracle: Map[String, String] = Map(
    "q84_dup_span_coverage" -> q84Oracle,
    "q85_winnowing" -> q85Oracle,
    "q119_stitch_detection" -> q119Oracle)
}
