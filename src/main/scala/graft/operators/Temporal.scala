package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Temporal join operators — range (interval) join and as-of join, the
  * two patterns the brief names among "operators Spark lacks". Both are
  * composed from built-ins (preference (a) of the custom-operator ladder):
  * the semantics decompose into bucketize → equi-join → refine, which
  * keeps Catalyst in charge of distribution and stays codegen'd — no
  * custom SparkPlan needed.
  *
  * Scale design: a naive interval join is a BroadcastNestedLoopJoin
  * (O(N×M) pairs evaluated). Bucketizing both sides by a time quantum
  * turns it into an equi-join on (key, bucket) — each event joins only
  * its ±1 bucket neighborhood, so work is O(matches), the 100 TB form.
  */
object Temporal {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Purchases of a user paired with that user's error events within the
    * preceding 30 minutes (interval/range join), via bucketization:
    * bucket = floor(epoch/1800); an error at e can only match purchases in
    * e's bucket or the next, so each error row expands to exactly 2
    * bucket keys and the join is a plain equi-join on (user, bucket). */
  def q50RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .withColumn("sec", unix_timestamp($"ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_id"), $"sec".as("p_sec"),
        floor($"sec" / 1800).as("bucket"))
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"event_id".as("e_id"), $"sec".as("e_sec"))
      .withColumn("bucket",
        explode(array(floor($"e_sec" / 1800), floor($"e_sec" / 1800) + 1)))
    purchases.join(errors, Seq("user_id", "bucket"))
      .filter($"e_sec" >= $"p_sec" - 1800 && $"e_sec" <= $"p_sec")
      .select($"user_id", $"p_id", $"e_id", ($"p_sec" - $"e_sec").as("lag_sec"))
      .distinct()
      .orderBy($"user_id", $"p_id", $"e_id")
  }

  /** Oracle = the declarative range predicate (DuckDB plans its own IEJoin
    * — same semantics, different physical strategy). */
  val q50Oracle: String =
    """WITH ev AS (SELECT user_id, event_id, event_type,
      |              CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |p AS (SELECT user_id, event_id AS p_id, sec AS p_sec FROM ev
      |      WHERE event_type = 'purchase'),
      |e AS (SELECT user_id, event_id AS e_id, sec AS e_sec FROM ev
      |      WHERE event_type = 'error')
      |SELECT DISTINCT p.user_id AS user_id, p.p_id, e.e_id,
      |       (p.p_sec - e.e_sec) AS lag_sec
      |FROM p JOIN e ON p.user_id = e.user_id
      |  AND e.e_sec >= p.p_sec - 1800 AND e.e_sec <= p.p_sec
      |ORDER BY user_id, p_id, e_id""".stripMargin

  /** As-of join: each purchase picks THE most recent error of the same
    * user at-or-before it (within 1 hour) — the temporal lookup pattern.
    * Range-join to candidates (bucketized as q50), then row_number keeps
    * the latest; left join semantics preserve purchases with no match. */
  def q51AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .withColumn("sec", unix_timestamp($"ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_id"), $"sec".as("p_sec"),
        floor($"sec" / 3600).as("bucket"))
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"event_id".as("e_id"), $"sec".as("e_sec"))
      .withColumn("bucket",
        explode(array(floor($"e_sec" / 3600), floor($"e_sec" / 3600) + 1)))
    val cands = purchases.join(errors, Seq("user_id", "bucket"))
      .filter($"e_sec" >= $"p_sec" - 3600 && $"e_sec" <= $"p_sec")
      .select($"user_id", $"p_id", $"p_sec", $"e_id", $"e_sec").distinct()
    val w = Window.partitionBy($"p_id")
      .orderBy($"e_sec".desc, $"e_id".asc)
    val best = cands.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"p_id", $"e_id".as("asof_e_id"),
        ($"p_sec" - $"e_sec").as("asof_lag_sec"))
    purchases.select($"user_id", $"p_id").distinct()
      .join(best, Seq("p_id"), "left")
      .select($"user_id", $"p_id",
        coalesce($"asof_e_id", lit(-1L)).as("asof_e_id"),
        coalesce($"asof_lag_sec", lit(-1L)).as("asof_lag_sec"))
      .orderBy($"user_id", $"p_id")
  }

  val q51Oracle: String =
    """WITH ev AS (SELECT user_id, event_id, event_type,
      |              CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |p AS (SELECT user_id, event_id AS p_id, sec AS p_sec FROM ev
      |      WHERE event_type = 'purchase'),
      |e AS (SELECT user_id, event_id AS e_id, sec AS e_sec FROM ev
      |      WHERE event_type = 'error'),
      |cands AS (SELECT p.user_id, p.p_id, p.p_sec, e.e_id, e.e_sec,
      |            row_number() OVER (PARTITION BY p.p_id
      |              ORDER BY e.e_sec DESC, e.e_id ASC) AS rn
      |          FROM p JOIN e ON p.user_id = e.user_id
      |            AND e.e_sec >= p.p_sec - 3600 AND e.e_sec <= p.p_sec)
      |SELECT p.user_id AS user_id, p.p_id AS p_id,
      |       coalesce(c.e_id, -1) AS asof_e_id,
      |       coalesce(p.p_sec - c.e_sec, -1) AS asof_lag_sec
      |FROM p LEFT JOIN (SELECT * FROM cands WHERE rn = 1) c
      |  ON p.p_id = c.p_id
      |ORDER BY user_id, p_id""".stripMargin

  /** q52 — mergeable HLL sketches: per-segment distinct-part sketches
    * unioned into region totals — the two-level distinct-counting pattern
    * a partitioned 100 TB store needs (sketches merge; exact distincts
    * don't). Approximate → no value-level oracle (driver does the weaker
    * rows check); TemporalSpec bounds the error against exact counts. */
  def q52HllSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val perFlag = li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
    perFlag.groupBy($"l_returnflag")
      .agg(expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS DOUBLE)")
        .as("approx_parts"))
      .orderBy($"l_returnflag")
  }

  /** q64 — KMV (k-minimum-values) distinct sketch, k=64: estimate
    * |distinct| as (k-1) · 2^52 / v_k where v_k is the k-th smallest
    * md5-derived 52-bit value. Unlike q52's DataSketches HLL, every step
    * is engine-independent arithmetic over md5 — so even the APPROXIMATE
    * estimate hash-matches the DuckDB oracle bit-for-bit, giving the
    * mergeable-sketch family a value-level gate. (Mergeability: the
    * union of two KMV sets re-truncated to k is the sketch of the union
    * — same two-level pattern as q52.) 13 hex chars = 52 bits keeps
    * every intermediate integer exact in a double on both engines.
    *
    * The sketch state is a bounded [[graft.functions.BottomKDistinct]]
    * aggregate — ≤ k distinct hashes per partial buffer, so the shuffle
    * moves k×32 B per (group × partition) and nothing ever sorts the
    * full distinct hash stream (the row_number()-window form this
    * replaced sorted ~200k hashes per group on one reducer — a scale
    * killer in miniature; the oracle is unchanged). */
  def q64KmvSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.BottomKFunctions.bottom_k_distinct
    val li = t(s, dir, "lineitem")
    val k = 64
    val twoTo52 = 4503599627370496.0 // 2^52
    val kth = li
      .select($"l_returnflag", md5(concat(lit("kmv:"), $"l_partkey")).as("h"))
      .groupBy($"l_returnflag")
      .agg(bottom_k_distinct($"h", k).as("sk"))
      // try_element_at: under ANSI mode (Spark 4 default) element_at
      // THROWS past the array end, so a group with < k distinct values
      // would abort the query instead of dropping (the window form and
      // the oracle's rn = k both drop such groups)
      .withColumn("h", try_element_at($"sk", lit(k)))
      .filter($"h".isNotNull)
      .withColumn("v",
        expr("cast(conv(substring(h, 1, 13), 16, 10) as double)"))
      .withColumn("est", lit((k - 1).toDouble) * lit(twoTo52) / $"v")
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_exact"))
    kth.join(exact, "l_returnflag")
      .select($"l_returnflag",
        round($"est", 2).as("est_distinct"),
        $"n_exact",
        round(abs($"est" - $"n_exact") / $"n_exact", 4).as("rel_err"))
      .orderBy($"l_returnflag")
  }

  val q64Oracle: String =
    """WITH h AS (SELECT DISTINCT l_returnflag,
      |             md5('kmv:' || l_partkey) AS h FROM lineitem),
      |r AS (SELECT l_returnflag, h,
      |        row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
      |      FROM h),
      |k AS (SELECT l_returnflag,
      |        list_sum(list_transform(generate_series(1, 13),
      |          i -> (strpos('0123456789abcdef',
      |                  substr(h, CAST(i AS INT), 1)) - 1)
      |               * 16.0 ** (13 - i))) AS v
      |      FROM r WHERE rn = 64),
      |e AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact
      |      FROM lineitem GROUP BY 1)
      |SELECT k.l_returnflag,
      |       round(CAST(63 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE) / v, 2) AS est_distinct,
      |       e.n_exact,
      |       round(abs(CAST(63 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE) / v - e.n_exact)
      |             / e.n_exact, 4) AS rel_err
      |FROM k JOIN e USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  /** q66 — time-series resampling with forward fill: each user's events
    * collapse to an hourly grid spanning [first, last] active hour; gap
    * hours carry the last observed hourly sum forward (last_value IGNORE
    * NULLS over an unbounded-preceding frame — the standard gap-fill).
    * The grid generates per user via sequence+explode (task-local fan-out,
    * no shuffle beyond the hourly aggregate), so at scale the cost is
    * O(active span), not O(global calendar × users). */
  def q66ResampleFfill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .filter($"user_id" < 20)
      .withColumn("sec", unix_timestamp($"ts"))
      .withColumn("hour", floor($"sec" / 3600))
    val hourly = ev.groupBy($"user_id", $"hour")
      .agg(round(sum($"value"), 4).as("v"), count(lit(1)).as("n"))
    val grid = hourly.groupBy($"user_id")
      .agg(min($"hour").as("h0"), max($"hour").as("h1"))
      .select($"user_id", explode(sequence($"h0", $"h1")).as("hour"))
    val w = Window.partitionBy($"user_id").orderBy($"hour".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("v_filled", last($"v", ignoreNulls = true).over(w))
      .select($"user_id", $"hour",
        coalesce($"n", lit(0L)).as("n"),
        coalesce($"v_filled", lit(0.0)).as("v_filled"))
      .orderBy($"user_id", $"hour")
  }

  val q66Oracle: String =
    """WITH ev AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |              value
      |            FROM events WHERE user_id < 20),
      |b AS (SELECT user_id, CAST(floor(sec / 3600) AS BIGINT) AS hour,
      |        round(sum(value), 4) AS v, count(*) AS n
      |      FROM ev GROUP BY 1, 2),
      |r AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1
      |      FROM b GROUP BY 1),
      |grid AS (SELECT r.user_id, g.hour
      |         FROM r, LATERAL (SELECT unnest(generate_series(r.h0, r.h1))
      |                          AS hour) g),
      |j AS (SELECT grid.user_id, grid.hour, b.v, b.n
      |      FROM grid LEFT JOIN b USING (user_id, hour))
      |SELECT user_id, hour, coalesce(n, 0) AS n,
      |       coalesce(last_value(v IGNORE NULLS) OVER (
      |         PARTITION BY user_id ORDER BY hour
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         CAST(0 AS DOUBLE)) AS v_filled
      |FROM j
      |ORDER BY user_id, hour""".stripMargin

  /** q68 — count-min sketch heavy hitters: a d=4 × w=1024 CMS built in
    * one pass over the token stream, probed with the exact top-20 (q60's
    * head) so over-estimation is visible next to ground truth. Like q64,
    * every hash is md5-derived arithmetic mirrored bit-for-bit in the
    * oracle, so even the APPROXIMATE counts hash-match DuckDB — the
    * mergeable-sketch family's value-level gate. CMS never
    * under-counts (overcount ≥ 0 is deterministic), and cells are a
    * FIXED 4096 rows however large the corpus: the shuffle after the
    * map-side partial agg carries ≤ d·w rows per partition — the
    * sketch property that makes 100 TB frequency estimation cheap.
    * The 4 bucket ids are computed as array elements of one projection
    * (codegen'd md5 ×4) then posexploded — the token stream is scanned
    * once. */
  private val CmsDepth = 4
  private val CmsWidth = 1024

  private def cmsBucketExpr(jCol: String, tokCol: String): String =
    s"pmod(cast(conv(substring(md5(concat('cms', $jCol, ':', $tokCol)), 1, 15), 16, 10) as bigint), $CmsWidth)"

  /** CMS cell grid (j, bucket, c) for a `token` frame. MERGEABLE: cells
    * of a union of corpora = per-corpus cells summed per (j, bucket) —
    * the property TemporalSpec pins by splitting the corpus 3 ways and
    * merging; it is what lets per-partition / per-batch sketches combine
    * on a cluster without touching raw tokens again. */
  def cmsCells(toks: DataFrame): DataFrame =
    toks
      .select(posexplode(array((0 until CmsDepth).map(j =>
        expr(cmsBucketExpr(j.toString, "token"))): _*)).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("c"))

  def q68CmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = CmsDepth
    def bucketExpr(jCol: String, tokCol: String) = cmsBucketExpr(jCol, tokCol)
    val toks = Tables.load(s, dir, "documents")
      .repartition(Tables.fanoutParallelism(s, dir, "documents"))
      .select(explode(split($"text", " ")).as("token"))
    val cells = cmsCells(toks)
    val top = toks.groupBy($"token").agg(count(lit(1)).as("tf_exact"))
      .orderBy($"tf_exact".desc, $"token".asc).limit(20)
    top
      .select($"token", $"tf_exact",
        posexplode(array((0 until d).map(j =>
          expr(bucketExpr(j.toString, "token"))): _*)).as(Seq("j", "bucket")))
      .join(cells, Seq("j", "bucket"))
      .groupBy($"token", $"tf_exact").agg(min($"c").as("tf_est"))
      .select($"token", $"tf_exact", $"tf_est",
        ($"tf_est" - $"tf_exact").as("overcount"))
      .orderBy($"tf_exact".desc, $"token".asc)
  }

  val q68Oracle: String =
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token
      |              FROM documents),
      |js AS (SELECT unnest(generate_series(0, 3)) AS j),
      |cells AS (SELECT j,
      |            CAST('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || ':' || token), 1, 15)
      |                 AS BIGINT) % 1024 AS bucket,
      |            count(*) AS c
      |          FROM toks CROSS JOIN js GROUP BY 1, 2),
      |top AS (SELECT token, count(*) AS tf_exact FROM toks
      |        GROUP BY 1 ORDER BY tf_exact DESC, token ASC LIMIT 20),
      |probe AS (SELECT t.token, t.tf_exact, min(c.c) AS tf_est
      |          FROM top t CROSS JOIN js
      |          JOIN cells c ON c.j = js.j
      |           AND c.bucket = CAST('0x' || substr(md5('cms' || CAST(js.j AS VARCHAR) || ':' || t.token), 1, 15)
      |                               AS BIGINT) % 1024
      |          GROUP BY 1, 2)
      |SELECT token, tf_exact, tf_est, tf_est - tf_exact AS overcount
      |FROM probe
      |ORDER BY tf_exact DESC, token ASC""".stripMargin

  // ---------------------------------------------------------------- q93

  /** q93 — KMV set-operation estimates: pairwise Jaccard similarity
    * between sources from their KMV sketches ALONE (Beyer et al.,
    * SIGMOD'07 — "k minimum values" sketches support union natively
    * and intersection via the inclusion filter). Per source the sketch
    * is the k=64 smallest distinct md5(token) values (the bounded
    * [[graft.functions.BottomKDistinct]] aggregate, q64's machinery);
    * for a pair (a, b) the bottom-k of the UNION is the bottom-k of
    * the two sketches' merge, and J ≈ |{h ∈ bottomk(a∪b) : h ∈ a ∧
    * h ∈ b}| / k_union, where k_union = |bottomk(a∪b)| — equal to k
    * when the union sketch fills, smaller (and the estimate exact)
    * when it doesn't. The point at 100 TB: corpus-pair similarity without
    * any corpus-pair scan — sketches are 64×16 B per source, the
    * pairwise stage touches ≤ 2k rows per pair however large the
    * corpora. Everything is md5-derived integers/strings → the
    * ESTIMATE itself hash-matches the DuckDB replay (like q64/q68).
    * Restricted to 5 sources (10 pairs) to keep the oracle readable. */
  def q93KmvJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.BottomKFunctions.bottom_k_distinct
    val k = 64
    val srcs = Seq("src0", "src1", "src2", "src3", "src4")
    // 3-token shingles, not tokens: the fixture's ~31-word vocabulary
    // would leave every sketch UNDER-filled (the sketch would be the
    // exact set and every J = 1); ~1300 distinct shingles per source
    // puts k = 64 in the true estimating regime (TemporalSpec bounds
    // the estimate against the exact Jaccard)
    val sk = Tables.documents(s, dir)
      .filter($"source".isin(srcs: _*))
      .select($"source", split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
      .select($"source", explode(expr(
        """transform(sequence(1, size(t) - 2),
          |  i -> concat_ws(' ', slice(t, i, 3)))""".stripMargin)).as("g"))
      .select($"source", md5(concat(lit("kmv:"), $"g")).as("h"))
      .groupBy($"source").agg(bottom_k_distinct($"h", k).as("sk"))
      .select($"source", explode($"sk").as("h"))
      .cache() // ≤ 5×64 rows; consumed by both sides of the pair union
    // explicit (a < b) pair list; each pair's union sketch = ALL hashes
    // of both member sketches (a hash in one sketch only still belongs
    // to the union bottom-k candidates)
    val pairList = srcs.combinations(2).map { case Seq(a, b) => (a, b) }
      .toSeq.toDF("src_a", "src_b")
    val u = pairList.join(sk.withColumnRenamed("source", "src_a"), "src_a")
      .select($"src_a", $"src_b", $"h", lit("a").as("side"))
      .union(pairList.join(sk.withColumnRenamed("source", "src_b"), "src_b")
        .select($"src_a", $"src_b", $"h", lit("b").as("side")))
    // bottom-k of the union sketch per pair, then the inclusion count
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"src_a", $"src_b").orderBy($"h")
    u.groupBy($"src_a", $"src_b", $"h")
      .agg(countDistinct($"side").as("n_sides"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .groupBy($"src_a", $"src_b")
      .agg(sum(when($"n_sides" === 2, 1L).otherwise(0L)).as("n_both"),
        count(lit(1)).as("k_union"))
      .select($"src_a", $"src_b", $"n_both",
        round($"n_both".cast("double") / $"k_union", 4).as("j_est"))
      .orderBy($"src_a", $"src_b")
  }

  val q93Oracle: String =
    """WITH t AS (SELECT source, string_split(text, ' ') AS t
      |           FROM documents
      |           WHERE source IN ('src0','src1','src2','src3','src4')
      |             AND len(string_split(text, ' ')) >= 3),
      |toks AS (SELECT source, array_to_string(t[i : i + 2], ' ') AS g
      |         FROM t, unnest(generate_series(1, len(t) - 2)) AS u(i)),
      |h AS (SELECT DISTINCT source, md5('kmv:' || g) AS h FROM toks),
      |sk AS (SELECT source, h FROM (
      |         SELECT source, h,
      |           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
      |         FROM h) WHERE rn <= 64),
      |pl AS (SELECT a.source AS src_a, b.source AS src_b
      |       FROM (SELECT DISTINCT source FROM sk) a,
      |            (SELECT DISTINCT source FROM sk) b
      |       WHERE a.source < b.source),
      |u AS (SELECT pl.src_a, pl.src_b, sk.h, 'a' AS side
      |      FROM pl JOIN sk ON sk.source = pl.src_a
      |      UNION ALL
      |      SELECT pl.src_a, pl.src_b, sk.h, 'b' AS side
      |      FROM pl JOIN sk ON sk.source = pl.src_b),
      |g AS (SELECT src_a, src_b, h, count(DISTINCT side) AS n_sides
      |      FROM u GROUP BY 1, 2, 3),
      |ranked AS (SELECT src_a, src_b, h, n_sides,
      |             row_number() OVER (PARTITION BY src_a, src_b
      |               ORDER BY h) AS rn
      |           FROM g)
      |SELECT src_a, src_b,
      |       CAST(sum(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_both,
      |       round(CAST(sum(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END)
      |         AS DOUBLE) / count(*), 4) AS j_est
      |FROM ranked WHERE rn <= 64
      |GROUP BY src_a, src_b
      |ORDER BY src_a, src_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q93_kmv_jaccard" -> q93KmvJaccard _,
    "q66_resample_ffill" -> q66ResampleFfill _,
    "q50_range_join" -> q50RangeJoin _,
    "q51_asof_join" -> q51AsOfJoin _,
    "q52_hll_sketch" -> q52HllSketch _,
    "q64_kmv_sketch" -> q64KmvSketch _,
    "q68_cms_heavy_hitters" -> q68CmsHeavyHitters _)

  val oracle: Map[String, String] = Map(
    "q93_kmv_jaccard" -> q93Oracle,
    "q66_resample_ffill" -> q66Oracle,
    "q50_range_join" -> q50Oracle,
    "q51_asof_join" -> q51Oracle,
    "q64_kmv_sketch" -> q64Oracle,
    "q68_cms_heavy_hitters" -> q68Oracle)
}
