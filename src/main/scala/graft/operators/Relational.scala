package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Core relational operators (SURVEY.md §2.2-§2.7) re-expressed on the
  * fixture star schema.
  *
  * Every query is a pure `(SparkSession, sfDir) => DataFrame` function and
  * has a matching DuckDB oracle in [[Relational.oracle]]. All results carry
  * an explicit deterministic ORDER BY so Spark and the oracle agree
  * row-for-row.
  *
  * Scale notes (100 TB): joins against `nation`/`region`/`supplier`/`part`
  * are explicitly `broadcast()` — they are bounded dimensions (like the
  * reference's EPA_PRODUCTS/EPA_COMPANY_INFO lookup sides). Fact-fact
  * joins (orders ⋈ lineitem) shuffle on their join key, which is also the
  * window partition key, so the exchange is reused across join + window.
  */
object Relational {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** q01 — flagship: the reference's signature VW_PDF_TO_DOWNLOAD pattern
    * (`epa_ingestion.py:447-456`): inner join parent⋈children (J1), keep
    * latest child per parent via row_number desc (W1/QUALIFY), anti-join
    * away parents already processed (J3: RIGHT JOIN ... IS NULL).
    * Fixture transposition: latest lineitem per order, minus orders with
    * o_orderstatus = 'F' ("already downloaded").
    */
  def q01Flagship(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    // "latest child per parent" as a max_by AGGREGATE, not a row_number
    // window (round 22, guide §2.3): the W1/QUALIFY pick under a total
    // order is the argmax under the same order, so max_by over an
    // ordering struct returns the identical row — but as a
    // DeclarativeAggregate it map-side-combines on the scan (the shuffle
    // carries ≤1 row per (mapper, orderkey)) and never sorts, where the
    // window shape paid a full local sort before the partial
    // WindowGroupLimit and a second sort after the exchange. The
    // ordering struct mirrors W1's (accepted-date desc, tiebreak asc)
    // chain exactly — DESC fields ride as-is, ASC tiebreaks negated —
    // and the same chain that made row_number deterministic (SURVEY.md
    // §7.3) makes this argmax unique. Oracle unchanged: hash-identical.
    val latest = li.groupBy($"l_orderkey")
      .agg(max_by(
        struct($"l_partkey", $"l_suppkey", $"l_linenumber", $"l_quantity",
          $"l_extendedprice", $"l_shipdate"),
        struct($"l_shipdate", (-$"l_linenumber").as("t1"),
          (-$"l_partkey").as("t2"), (-$"l_suppkey").as("t3"))).as("r"))
      .select($"l_orderkey", $"r.*")
    val processed = o.filter($"o_orderstatus" === "F").select($"o_orderkey")
    // left_anti = the reference's RIGHT JOIN + IS NULL (J3) without the
    // extra null-probe pass; broadcast is wrong here (both sides are
    // fact-sized at scale) so we let AQE pick the shuffle join.
    latest
      .join(o.select($"o_orderkey", $"o_orderdate", $"o_totalprice"),
        $"l_orderkey" === $"o_orderkey", "inner")
      .join(processed, Seq("o_orderkey"), "left_anti")
      .select($"o_orderkey", $"l_partkey", $"l_suppkey", $"l_linenumber",
        $"l_quantity", $"l_extendedprice", $"l_shipdate", $"o_orderdate",
        $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  val q01Oracle: String =
    """WITH latest AS (
      |  SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |            ORDER BY l_shipdate DESC, l_linenumber ASC, l_partkey ASC, l_suppkey ASC) AS rn
      |  FROM lineitem
      |)
      |SELECT o.o_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber,
      |       l.l_quantity, l.l_extendedprice, l.l_shipdate,
      |       o.o_orderdate, o.o_totalprice
      |FROM latest l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE l.rn = 1
      |  AND o.o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY o.o_orderkey""".stripMargin

  /** q02 — J1 inner equi-joins through the dimension chain with explicit
    * broadcast of the bounded dims (customer→nation→region), P3 filter. */
  def q02JoinInner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    o.join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA" && $"o_orderstatus" === "O")
      .select($"o_orderkey", $"c_name", $"n_name", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  val q02Oracle: String =
    """SELECT o.o_orderkey, c.c_name, n.n_name, o.o_totalprice
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA' AND o.o_orderstatus = 'O'
      |ORDER BY o.o_orderkey""".stripMargin

  /** q03 — J6 multi-way LEFT OUTER enrichment join (the reference's
    * 3-way UPDATE source, `epa_ingestion.py:814-823`). */
  def q03JoinLeftMulti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    c.join(broadcast(n), $"c_nationkey" === $"n_nationkey", "left")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey", "left")
      .select($"c_custkey", $"c_name", $"n_name", $"r_name")
      .orderBy($"c_custkey")
  }

  val q03Oracle: String =
    """SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
      |FROM customer c
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      |ORDER BY c.c_custkey""".stripMargin

  /** q04 — J3 anti join: customers with no pending order ("not yet
    * downloaded" in the reference's metadata anti-join). */
  def q04JoinAnti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pending = t(s, dir, "orders").filter($"o_orderstatus" === "P")
    t(s, dir, "customer")
      .join(pending, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val q04Oracle: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  /** q05 — semi join (EXISTS): customers with at least one open order. */
  def q05JoinSemi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val open = t(s, dir, "orders").filter($"o_orderstatus" === "O")
    t(s, dir, "customer")
      .join(open, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val q05Oracle: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** q06 — J4/P6 equi-join on a derived (regexp-extracted) key: the
    * reference joins directory listings to metadata on
    * REGEXP_SUBSTR(stage_file_path,...) (`epa_ingestion.py:493-500`).
    * Here: extract the numeric id out of s_name ('Supplier#000000001')
    * and join lineitem on it. The extraction happens BEFORE the join so
    * Catalyst plans a plain equi-join, not a theta join — the 100 TB-safe
    * form called out in SURVEY.md §2.3 J7.
    */
  def q06JoinDerivedKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = t(s, dir, "supplier")
      .withColumn("sk", regexp_extract($"s_name", "[0-9]+", 0).cast("long"))
    t(s, dir, "lineitem")
      .groupBy($"l_suppkey").agg(count(lit(1)).as("n_items"))
      .join(broadcast(sup), $"l_suppkey" === $"sk", "inner")
      .select($"s_suppkey", $"s_name", $"n_items")
      .orderBy($"s_suppkey")
  }

  val q06Oracle: String =
    """SELECT s.s_suppkey, s.s_name, l.n_items
      |FROM (SELECT l_suppkey, count(*) AS n_items FROM lineitem GROUP BY 1) l
      |JOIN (SELECT *, CAST(regexp_extract(s_name, '[0-9]+') AS BIGINT) AS sk
      |      FROM supplier) s
      |ON l.l_suppkey = s.sk
      |ORDER BY s.s_suppkey""".stripMargin

  /** q07 — J7 suffix theta join (LIKE '%' || suffix), the reference's
    * stage-path-to-relative-path match (`epa_ingestion.py:769-774`).
    * Inputs are deliberately small (the reference's are too): Spark plans
    * BroadcastNestedLoopJoin. The scale-safe rewrite is q06. */
  def q07JoinSuffixTheta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val meta = t(s, dir, "orders").filter($"o_orderkey" < 100)
      .select($"o_orderkey",
        concat(lit("stage/EPA_LABEL_PDF/"), $"o_orderkey", lit(".pdf"))
          .as("stage_file_path"))
    val listing = t(s, dir, "lineitem").filter($"l_orderkey" < 100)
      .select(concat($"l_orderkey", lit(".pdf")).as("relative_path"))
      .distinct()
    meta.join(broadcast(listing),
        $"stage_file_path".endsWith($"relative_path"))
      .select($"o_orderkey", $"stage_file_path", $"relative_path")
      .orderBy($"o_orderkey", $"relative_path")
  }

  val q07Oracle: String =
    """WITH meta AS (
      |  SELECT o_orderkey,
      |         'stage/EPA_LABEL_PDF/' || o_orderkey || '.pdf' AS stage_file_path
      |  FROM orders WHERE o_orderkey < 100),
      |listing AS (
      |  SELECT DISTINCT l_orderkey || '.pdf' AS relative_path
      |  FROM lineitem WHERE l_orderkey < 100)
      |SELECT m.o_orderkey, m.stage_file_path, l.relative_path
      |FROM meta m JOIN listing l
      |  ON m.stage_file_path LIKE '%' || l.relative_path
      |ORDER BY m.o_orderkey, l.relative_path""".stripMargin

  /** q08 — W1 window dedup-to-latest standalone (QUALIFY desugared). */
  def q08WindowLatest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_shipdate".desc, $"l_linenumber".asc,
        $"l_partkey".asc, $"l_suppkey".asc)
    t(s, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_shipdate")
      .orderBy($"l_orderkey")
  }

  val q08Oracle: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate
      |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |        ORDER BY l_shipdate DESC, l_linenumber ASC, l_partkey ASC, l_suppkey ASC) AS rn FROM lineitem)
      |WHERE rn = 1
      |ORDER BY l_orderkey""".stripMargin

  /** q09 — top-k per group via rank (generalizes W1 per SURVEY §2.4). */
  def q09WindowTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"p_brand")
      .orderBy($"p_retailprice".desc, $"p_partkey".asc)
    t(s, dir, "part")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"p_brand", $"rk", $"p_partkey", $"p_name", $"p_retailprice")
      .orderBy($"p_brand", $"rk")
  }

  val q09Oracle: String =
    """SELECT p_brand, rk, p_partkey, p_name, p_retailprice
      |FROM (SELECT *, row_number() OVER (PARTITION BY p_brand
      |        ORDER BY p_retailprice DESC, p_partkey ASC) AS rk FROM part)
      |WHERE rk <= 3
      |ORDER BY p_brand, rk""".stripMargin

  /** q10 — lag/lead analytics over the event stream (per-user ordering). */
  def q10WindowLagLead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    t(s, dir, "events")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .select($"event_id", $"user_id", $"event_type", $"prev_type", $"next_type")
      .orderBy($"event_id")
  }

  val q10Oracle: String =
    """SELECT event_id, user_id, event_type,
      |       lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_type,
      |       lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_type
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** q11 — running sum with an explicit frame (rowsBetween). l_quantity is
    * integer-valued so the running double sum is exact in both engines.
    * The window order tiebreaks through l_partkey and l_quantity: the
    * fixtures carry duplicate (l_orderkey, l_linenumber) pairs, and a
    * running aggregate over a non-total order is engine- and
    * plan-dependent at every tie boundary (bit us at sf0.1 — rows that
    * remain tied after these keys are full duplicates, whose mutual
    * order can't change any prefix sum). */
  def q11WindowRunningSum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate".asc, $"l_orderkey".asc, $"l_linenumber".asc,
        $"l_partkey".asc, $"l_quantity".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem")
      .withColumn("running_qty", sum($"l_quantity").over(w))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_shipdate",
        $"running_qty")
      .orderBy($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber")
  }

  val q11Oracle: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
      |       sum(l_quantity) OVER (PARTITION BY l_suppkey
      |         ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC,
      |                  l_partkey ASC, l_quantity ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
      |FROM lineitem
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin

  /** q12 — pricing-summary hash aggregate (the engine's general agg
    * surface; A1/A2 generalized). Double-valued aggregates are rounded on
    * both sides so summation order can't flip low bits. Partial (map-side)
    * aggregation is automatic for all of these. */
  def q12AggPricing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"),
        round(avg($"l_quantity"), 6).as("avg_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q12Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       sum(l_quantity) AS sum_qty,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |       round(avg(l_quantity), 6) AS avg_qty,
      |       count(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q13 — A1 group-collect: ARRAY_AGG(TYPE) per key
    * (`epa_ingestion.py:817-823`), sorted for determinism (SURVEY §7.3).
    * The gate output serializes the array to a '|'-joined string: the
    * driver's pandas row-sort cannot hash ndarray cells (r01 q13 err),
    * and the string carries the identical information. */
  def q13AggCollect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .select($"p_brand", $"p_type").distinct()
      .groupBy($"p_brand")
      .agg(array_join(array_sort(collect_list($"p_type")), "|").as("types"))
      .orderBy($"p_brand")
  }

  val q13Oracle: String =
    """SELECT p_brand, string_agg(p_type, '|' ORDER BY p_type ASC) AS types
      |FROM (SELECT DISTINCT p_brand, p_type FROM part)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** q14 — distinct aggregates (exact count distinct per group). */
  def q14AggDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  val q14Oracle: String =
    """SELECT l_returnflag,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps,
      |       count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q15 — set ops: union + intersect + except over key sets (SURVEY §2.6,
    * derived from the MERGE/DELETE rewrites). */
  def q15SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val withOrders = t(s, dir, "orders").select($"o_custkey".as("custkey")).distinct()
    val all = t(s, dir, "customer").select($"c_custkey".as("custkey"))
    val inactive = all.except(withOrders)                 // EXCEPT
    val active = all.intersect(withOrders)                // INTERSECT
    active.withColumn("status", lit("active"))
      .unionByName(inactive.withColumn("status", lit("inactive"))) // UNION ALL
      .orderBy($"custkey")
  }

  val q15Oracle: String =
    """WITH wo AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
      |  allc AS (SELECT c_custkey AS custkey FROM customer),
      |  act AS (SELECT custkey FROM allc INTERSECT SELECT custkey FROM wo),
      |  inact AS (SELECT custkey FROM allc EXCEPT SELECT custkey FROM wo)
      |SELECT custkey, 'active' AS status FROM act
      |UNION ALL
      |SELECT custkey, 'inactive' AS status FROM inact
      |ORDER BY custkey""".stripMargin

  /** q16 — scalar-function chain (F1-F9): regexp extract, concat,
    * sanitize (regexp_replace + translate + substring), upper, length. */
  def q16ScalarChain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .select(
        $"p_partkey",
        regexp_extract($"p_name", "[a-z]+$", 0).as("last_word"),      // F1
        concat_ws("_", $"p_brand", $"p_partkey").as("file_key"),      // F7
        substring(translate(regexp_replace($"p_name", "[<>:\"/\\\\|?*]", ""),
          " ", "_"), 1, 200).as("clean_name"),                        // F5
        upper($"p_type").as("type_uc"),                               // F6
        length($"p_name").as("name_len"))                             // F9
      .orderBy($"p_partkey")
  }

  val q16Oracle: String =
    """SELECT p_partkey,
      |       regexp_extract(p_name, '[a-z]+$') AS last_word,
      |       p_brand || '_' || p_partkey AS file_key,
      |       substring(translate(regexp_replace(p_name, '[<>:"/\\|?*]', '', 'g'), ' ', '_'), 1, 200) AS clean_name,
      |       upper(p_type) AS type_uc,
      |       length(p_name) AS name_len
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** q17 — F10 JSON field access on the event props payload
    * (`data['...']` on the API JSON, `epa_ingestion.py:313-393`). */
  def q17JsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(sum($"k").as("sum_k"), count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  val q17Oracle: String =
    """SELECT event_type,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       count(*) AS n
      |FROM events GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q18 — P7 ordered limit (top-N). */
  def q18TopN(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
  }

  val q18Oracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** q19 — time-bucketed aggregation over events (the batch face of the
    * TARGET_LAG streaming requirement, SURVEY §2.10; streaming twin lives
    * in graft.streaming). */
  def q19TimeBucket(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("bucket"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
      .orderBy($"bucket", $"event_type")
  }

  val q19Oracle: String =
    """SELECT date_trunc('hour', ts) AS bucket, event_type,
      |       count(*) AS n, round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2
      |ORDER BY bucket, event_type""".stripMargin

  /** q41 — skew-safe two-phase (salted) aggregation: event_type has very
    * low cardinality (heavy skew at scale — all rows of a type land on one
    * reducer). Phase 1 aggregates (event_type, salt) — 16-way fan-out of
    * each hot key; phase 2 combines the partials. Result is identical to
    * the direct groupBy (counts/sums of longs are associative-exact), so
    * the oracle is the plain form. At 100 TB this is the manual fallback
    * where AQE skew handling doesn't apply (single-key aggregation). */
  def q41SkewSaltedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val salted = t(s, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .withColumn("salt", ($"event_id" % 16).cast("int"))
    val partial = salted.groupBy($"event_type", $"salt")
      .agg(count(lit(1)).as("pn"), sum($"k").as("pk"))
    partial.groupBy($"event_type")
      .agg(sum($"pn").as("n"), sum($"pk").as("sum_k"))
      .orderBy($"event_type")
  }

  val q41Oracle: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q43 — gap-based sessionization (batch face of the custom-state
    * streaming operator, graft.streaming.Sessionize): 30-min gaps split
    * each user's event stream into sessions; lag + running-sum windows.
    * Epoch seconds (unix_timestamp truncation) keep the oracle exact. */
  def q43Sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.streaming.Sessionize.sessionsBatch(t(s, dir, "events"))
      .orderBy($"user_id", $"session_seq")
  }

  val q43Oracle: String =
    """WITH e AS (SELECT user_id, event_id, value,
      |             CAST(floor(epoch(ts)) AS BIGINT) AS tsSec
      |           FROM events),
      |b AS (SELECT *, CASE WHEN prev IS NULL OR tsSec - prev >= 1800
      |                     THEN 1 ELSE 0 END AS boundary
      |      FROM (SELECT *, lag(tsSec) OVER (PARTITION BY user_id
      |              ORDER BY tsSec ASC, event_id ASC) AS prev FROM e)),
      |ss AS (SELECT *, sum(boundary) OVER (PARTITION BY user_id
      |         ORDER BY tsSec ASC, event_id ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |       FROM b)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |       min(tsSec) AS session_start, max(tsSec) AS session_end,
      |       count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM ss GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** q45 — hierarchical aggregation (ROLLUP): per-(flag,status) totals,
    * per-flag subtotals, and the grand total in one pass — Spark plans a
    * single Expand + hash aggregate rather than three scans. */
  def q45Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("flag"),
        coalesce($"l_linestatus", lit("ALL")).as("status"),
        $"sum_qty", $"n")
      .orderBy($"flag", $"status")
  }

  val q45Oracle: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |       coalesce(l_linestatus, 'ALL') AS status,
      |       sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin

  /** q46 — exact percentiles (continuous interpolation) per group: the
    * sort-based quantile surface; Spark's `percentile` and DuckDB's
    * `quantile_cont` share the (n-1)·p linear-interpolation definition. */
  def q46Percentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))")
        .as("q"))
      .select($"l_returnflag",
        round(element_at($"q", 1), 4).as("p25"),
        round(element_at($"q", 2), 4).as("p50"),
        round(element_at($"q", 3), 4).as("p75"))
      .orderBy($"l_returnflag")
  }

  val q46Oracle: String =
    """SELECT l_returnflag,
      |       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      |       round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
      |       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q47 — PIVOT: per-flag rows with one count column per line status
    * (wide denormalization for reporting). Spark's .pivot() plans a
    * single-pass pivot aggregate; the oracle is the equivalent CASE
    * aggregation — identical values and column names. */
  def q47Pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .pivot($"l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .withColumnRenamed("F", "n_f").withColumnRenamed("O", "n_o")
      .na.fill(0L, Seq("n_f", "n_o"))
      .orderBy($"l_returnflag")
  }

  val q47Oracle: String =
    """SELECT l_returnflag,
      |       CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |       CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q48 — fuzzy string matching (edit distance): supplier names scored
    * against a probe name; the primitive under fuzzy entity resolution /
    * near-dup on short strings. */
  def q48FuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "supplier")
      .select($"s_suppkey", $"s_name",
        levenshtein($"s_name", lit("Supplier#000000001")).as("dist"))
      .orderBy($"dist".asc, $"s_suppkey".asc)
      .limit(10)
  }

  val q48Oracle: String =
    """SELECT s_suppkey, s_name,
      |       levenshtein(s_name, 'Supplier#000000001') AS dist
      |FROM supplier
      |ORDER BY dist ASC, s_suppkey ASC LIMIT 10""".stripMargin

  /** q49 — data profiling: per-column completeness/cardinality/range in
    * one pass (the quality gate a 100 TB ingest runs before promoting a
    * batch). */
  def q49Profile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when($"o_custkey".isNull, 1).otherwise(0)).as("null_custkey"),
        countDistinct($"o_custkey").as("distinct_custkey"),
        countDistinct($"o_orderstatus").as("distinct_status"),
        round(min($"o_totalprice"), 2).as("min_price"),
        round(max($"o_totalprice"), 2).as("max_price"),
        round(avg($"o_totalprice"), 4).as("avg_price"))
  }

  val q49Oracle: String =
    """SELECT count(*) AS n_rows,
      |       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
      |       count(DISTINCT o_custkey) AS distinct_custkey,
      |       count(DISTINCT o_orderstatus) AS distinct_status,
      |       round(min(o_totalprice), 2) AS min_price,
      |       round(max(o_totalprice), 2) AS max_price,
      |       round(avg(o_totalprice), 4) AS avg_price
      |FROM orders""".stripMargin

  /** q58 — CUBE: all 2^2 grouping combinations of (flag, status) in one
    * Expand + hash-agg pass (q45's ROLLUP covers the hierarchy prefix
    * subsets; CUBE completes the lattice — the reporting shape that
    * otherwise costs four scans). */
  def q58Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("flag"),
        coalesce($"l_linestatus", lit("ALL")).as("status"),
        $"sum_qty", $"n")
      .orderBy($"flag", $"status")
  }

  val q58Oracle: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |       coalesce(l_linestatus, 'ALL') AS status,
      |       sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin

  /** q62 — null-preserving fan-out (P8's explode_outer face, oracled):
    * rows whose extracted array is empty survive as a single null row —
    * the reference's "keep the parent even when a child array is absent"
    * shredding semantics (`epa_ingestion.py:339-393`), which plain
    * explode silently drops. */
  def q62ExplodeOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        explode_outer(regexp_extract_all($"text", lit("[a-z]{8}"), lit(0)))
          .as("w"))
      .groupBy($"doc_id")
      .agg(count($"w").as("n_matches"), count(lit(1)).as("n_rows"))
      .orderBy($"doc_id")
  }

  val q62Oracle: String =
    """SELECT d.doc_id, count(u.w) AS n_matches, count(*) AS n_rows
      |FROM documents d LEFT JOIN LATERAL (
      |  SELECT unnest(regexp_extract_all(d.text, '[a-z]{8}')) AS w) u
      |  ON true
      |GROUP BY d.doc_id
      |ORDER BY doc_id""".stripMargin

  /** q54 — bloom-filter join pruning: build a Bloom filter over the small
    * (filtered) side's keys, prune the fact side BEFORE its shuffle, then
    * join exactly. At 100 TB this is the difference between shuffling the
    * full fact table and shuffling only rows that can possibly match
    * (false positives are removed by the join itself, so the result is
    * exact — the oracle is the plain join). Spark's own runtime row-level
    * filtering plays the same trick inside AQE; this is the explicit,
    * plannable form sized from the build side's observed count. */
  def q54BloomJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val hot = t(s, dir, "orders")
      .filter($"o_totalprice" > 400000)
      .select($"o_orderkey", $"o_totalprice")
      .cache() // consumed 3x: sizing count, bloom-build subquery, probe join
    // EXACTLY Spark's own runtime-row-filter shape (InjectRuntimeFilter):
    // might_contain(<scalar subquery: bloom_filter_agg over the build
    // side>, xxhash64(probe key)). The bloom is built DISTRIBUTED with
    // map-side partial aggregation inside the same DAG — no collected
    // filter re-shipped as a plan literal — and the probe code-gens in
    // the scan's WholeStageCodegen span. Sizing stays ADAPTIVE to the
    // observed build-side count (one cheap action on the cached dim):
    // a statically-capped bloom saturates to fpp→1 at 100× scale, which
    // quietly turns the pre-shuffle prune into a no-op.
    val nKeys = math.max(1024L, hot.count())
    val nBits =
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(nKeys, 0.01)
    val bloomDf = hot.select(GraftColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(GraftColumnBridge.expression(hot("o_orderkey")))),
        Literal(nKeys), Literal(nBits)).toAggregateExpression())
      .as("bf"))
    val li = t(s, dir, "lineitem")
    val mightContain = GraftColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      new XxHash64(Seq(GraftColumnBridge.expression(li("l_orderkey"))))))
    li.filter(mightContain)
      .join(hot, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_items"), sum($"l_quantity").as("sum_qty"))
      .orderBy($"o_orderkey")
  }

  val q54Oracle: String =
    """SELECT o.o_orderkey, count(*) AS n_items, sum(l.l_quantity) AS sum_qty
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_totalprice > 400000
      |GROUP BY o.o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** q55 — Spark 4 VariantType schema-on-read (SURVEY §1.3's mapping for
    * the reference's nested API JSON): parse once into a variant, typed
    * path extraction via variant_get — the shredded binary encoding reads
    * paths without re-parsing text, unlike q17's get_json_object. */
  def q55VariantExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_id", $"event_type",
        variant_get(parse_json($"props"), "$.k", "long").as("k"))
      .filter($"k" % 7 === 0)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), max($"k").as("max_k"), min($"k").as("min_k"))
      .orderBy($"event_type")
  }

  val q55Oracle: String =
    """SELECT event_type, count(*) AS n, max(k) AS max_k, min(k) AS min_k
      |FROM (SELECT event_type,
      |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |WHERE k % 7 = 0
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q67 — variant SHREDDED STORAGE, the write-once/read-many pair to
    * q55's parse-edge exhibit: `parse_json` runs exactly once at ingest,
    * the variant column persists to parquet in Spark 4's binary variant
    * encoding, and every subsequent reader does `variant_get` path
    * extraction over the stored bytes — no JSON text re-parse, ever.
    * At 100 TB this is THE variant story: q55 re-tokenizes the raw text
    * on every query; this path pays the parse once and reads typed
    * paths at columnar speed thereafter. The oracle extracts the same
    * values from the raw JSON — storage format changes nothing about
    * the answer. */
  def q67VariantStore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the store is keyed by the source dir AND a fingerprint of the
    // source files (sizes + mtimes): reuse serves repeated invocations
    // (bench iterations, plan inspections) the read path only, while
    // regenerated source data at the same path gets a fresh store
    // instead of silently stale results
    val srcFile = new java.io.File(dir, "events.parquet")
    val srcParts =
      if (srcFile.isDirectory)
        Option(srcFile.listFiles()).getOrElse(Array.empty).toSeq
      else Seq(srcFile)
    val fingerprint = dir +
      srcParts.sortBy(_.getName)
        .map(f => s"|${f.getName}:${f.length}:${f.lastModified}").mkString
    def md5hex(v: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // the store lives under the session's OWN warehouse dir (never a
    // world-shared tmpdir where a stale or foreign directory at the
    // hashed path would be trusted as a valid store), two-level keyed:
    // source-dir hash / fingerprint hash. Superseded fingerprints of the
    // same source dir are swept after a successful build, so regenerated
    // source data can't leak an unbounded trail of old stores.
    val whUri = java.net.URI.create(s.conf.get("spark.sql.warehouse.dir"))
    val whLocal =
      if (whUri.getScheme == null) new java.io.File(whUri.toString)
      else if (whUri.getScheme == "file") new java.io.File(whUri.getPath)
      else // non-local warehouse: the store is a node-local cache; scope
           // it per-user under tmp rather than failing the query
        new java.io.File(System.getProperty("java.io.tmpdir"),
          "graft_" + System.getProperty("user.name", "anon"))
    val srcRoot = new java.io.File(
      new java.io.File(whLocal, "graft_varstore"), md5hex(dir))
    val store = new java.io.File(srcRoot, md5hex(fingerprint))
    // trust only a COMPLETE store: parquet's _SUCCESS marker gates reuse,
    // so a directory that exists for any other reason is rebuilt, not read
    if (store.exists() && !new java.io.File(store, "_SUCCESS").exists())
      graft.streaming.VersionedState.deleteTree(store.toPath)
    if (!store.exists()) {
      // ingest: parse once, persist the variant column; build under a
      // scratch name and promote with an atomic rename so a crashed
      // ingest can never leave a half-written store that later reads
      // would trust
      val scratch = new java.io.File(store.getParent,
        store.getName + s".build${ProcessHandle.current.pid}")
      try {
        t(s, dir, "events")
          .select($"event_id", $"event_type", parse_json($"props").as("pv"))
          .write.mode("overwrite").parquet(scratch.toString)
        try java.nio.file.Files.move(scratch.toPath, store.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case e: java.nio.file.FileSystemException =>
            // only a concurrent builder that already promoted its store
            // excuses the failed rename; anything else must surface, not
            // silently leave the query with no store at all
            if (!store.exists()) throw e
        }
      } finally // drop the scratch both after losing the race and on a
                // failed write — never orphan a half-build
        graft.streaming.VersionedState.deleteTree(scratch.toPath)
      // sweep superseded fingerprints of this source dir — ONLY bare
      // 32-hex fingerprint names: a concurrent builder's in-progress
      // "<fp>.build<pid>" scratch must never be deleted out from under
      // its running parquet job (the scratch owner cleans itself up in
      // its own finally). Best-effort: a lost delete race surfaces as
      // NoSuchFile wrapped in UncheckedIOException by Files.walk, so
      // the guard is NonFatal, not IOException alone.
      Option(srcRoot.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName != store.getName &&
          f.getName.matches("[0-9a-f]{32}"))
        .foreach(f =>
          try graft.streaming.VersionedState.deleteTree(f.toPath)
          catch { case scala.util.control.NonFatal(_) => () })
    }
    // read path: typed extraction over stored variant bytes
    s.read.parquet(store.toString)
      .select($"event_type", variant_get($"pv", "$.k", "long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        sum(when($"k" % 2 === 0, $"k")).as("sum_even_k"))
      .orderBy($"event_type")
  }

  val q67Oracle: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(k) AS BIGINT) AS sum_k,
      |       CAST(sum(CASE WHEN k % 2 = 0 THEN k END) AS BIGINT) AS sum_even_k
      |FROM (SELECT event_type,
      |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q56 — distribution-rank window family (ntile / percent_rank /
    * cume_dist): the quantile-bucketing face of the window module. All
    * three are rank arithmetic over exact ints — (rank-1)/(n-1) and
    * rank/n divide identically in both engines, so no rounding needed.
    * The full orderBy tiebreak chain makes row ranks unique (lineitem
    * carries duplicate (orderkey, linenumber) pairs in the fixtures). */
  def q56WindowFamily(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"l_extendedprice".asc, $"l_orderkey".asc, $"l_linenumber".asc,
        $"l_partkey".asc, $"l_suppkey".asc)
    t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
        $"l_returnflag", $"l_extendedprice",
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy($"l_returnflag", $"l_extendedprice", $"l_orderkey",
        $"l_linenumber", $"l_partkey", $"l_suppkey")
  }

  val q56Oracle: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |       l_returnflag, l_extendedprice,
      |       ntile(4) OVER w AS quartile,
      |       percent_rank() OVER w AS pct_rank,
      |       cume_dist() OVER w AS cume
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_returnflag
      |             ORDER BY l_extendedprice ASC, l_orderkey ASC,
      |                      l_linenumber ASC, l_partkey ASC, l_suppkey ASC)
      |ORDER BY l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
      |         l_partkey, l_suppkey""".stripMargin

  /** q57 — salted skew JOIN (the join twin of q41's salted aggregation):
    * event_type has 5 values, so a plain shuffle join lands each type on
    * one reducer. The dim side replicates 16x with a salt column, the
    * fact side derives salt = event_id % 16, and the join key becomes
    * (event_type, salt) — each hot key fans across 16 reducers. The
    * shuffle_hash hint keeps the demo honest (AQE would broadcast a
    * 5-row dim; at 100 TB the dim that needs salting doesn't broadcast).
    * Predicate uses exact longs so the oracle matches bit-for-bit. */
  def q57SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val dim = ev.groupBy($"event_type").agg(max($"event_id").as("max_id"))
      .withColumn("salt", explode(sequence(lit(0), lit(15))))
    val fact = ev.withColumn("salt", ($"event_id" % 16).cast("int"))
    fact.join(dim.hint("shuffle_hash"), Seq("event_type", "salt"))
      .filter($"event_id" * 2 > $"max_id")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_upper"))
      .orderBy($"event_type")
  }

  val q57Oracle: String =
    """WITH d AS (SELECT event_type, max(event_id) AS max_id
      |           FROM events GROUP BY 1)
      |SELECT e.event_type AS event_type, count(*) AS n_upper
      |FROM events e JOIN d ON e.event_type = d.event_type
      |WHERE e.event_id * 2 > d.max_id
      |GROUP BY e.event_type
      |ORDER BY e.event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_explode_outer" -> q62ExplodeOuter _,
    "q58_cube" -> q58Cube _,
    "q54_bloom_join" -> q54BloomJoin _,
    "q55_variant_extract" -> q55VariantExtract _,
    "q67_variant_store" -> q67VariantStore _,
    "q56_window_family" -> q56WindowFamily _,
    "q57_salted_join" -> q57SaltedJoin _,
    "q47_pivot" -> q47Pivot _,
    "q48_fuzzy_match" -> q48FuzzyMatch _,
    "q49_profile" -> q49Profile _,
    "q46_percentiles" -> q46Percentiles _,
    "q45_rollup" -> q45Rollup _,
    "q43_sessionize" -> q43Sessionize _,
    "q41_skew_salted_agg" -> q41SkewSaltedAgg _,
    "q01_flagship_latest_anti" -> q01Flagship _,
    "q02_join_inner_dims" -> q02JoinInner _,
    "q03_join_left_multi" -> q03JoinLeftMulti _,
    "q04_join_anti" -> q04JoinAnti _,
    "q05_join_semi" -> q05JoinSemi _,
    "q06_join_derived_key" -> q06JoinDerivedKey _,
    "q07_join_suffix_theta" -> q07JoinSuffixTheta _,
    "q08_window_latest" -> q08WindowLatest _,
    "q09_window_topk" -> q09WindowTopK _,
    "q10_window_lag_lead" -> q10WindowLagLead _,
    "q11_window_running_sum" -> q11WindowRunningSum _,
    "q12_agg_pricing" -> q12AggPricing _,
    "q13_agg_collect" -> q13AggCollect _,
    "q14_agg_distinct" -> q14AggDistinct _,
    "q15_set_ops" -> q15SetOps _,
    "q16_scalar_chain" -> q16ScalarChain _,
    "q17_json_extract" -> q17JsonExtract _,
    "q18_top_n" -> q18TopN _,
    "q19_time_bucket" -> q19TimeBucket _)

  val oracle: Map[String, String] = Map(
    "q62_explode_outer" -> q62Oracle,
    "q58_cube" -> q58Oracle,
    "q54_bloom_join" -> q54Oracle,
    "q55_variant_extract" -> q55Oracle,
    "q67_variant_store" -> q67Oracle,
    "q56_window_family" -> q56Oracle,
    "q57_salted_join" -> q57Oracle,
    "q47_pivot" -> q47Oracle,
    "q48_fuzzy_match" -> q48Oracle,
    "q49_profile" -> q49Oracle,
    "q46_percentiles" -> q46Oracle,
    "q45_rollup" -> q45Oracle,
    "q43_sessionize" -> q43Oracle,
    "q41_skew_salted_agg" -> q41Oracle,
    "q01_flagship_latest_anti" -> q01Oracle,
    "q02_join_inner_dims" -> q02Oracle,
    "q03_join_left_multi" -> q03Oracle,
    "q04_join_anti" -> q04Oracle,
    "q05_join_semi" -> q05Oracle,
    "q06_join_derived_key" -> q06Oracle,
    "q07_join_suffix_theta" -> q07Oracle,
    "q08_window_latest" -> q08Oracle,
    "q09_window_topk" -> q09Oracle,
    "q10_window_lag_lead" -> q10Oracle,
    "q11_window_running_sum" -> q11Oracle,
    "q12_agg_pricing" -> q12Oracle,
    "q13_agg_collect" -> q13Oracle,
    "q14_agg_distinct" -> q14Oracle,
    "q15_set_ops" -> q15Oracle,
    "q16_scalar_chain" -> q16Oracle,
    "q17_json_extract" -> q17Oracle,
    "q18_top_n" -> q18Oracle,
    "q19_time_bucket" -> q19Oracle)
}
