package graft

import graft.sources.{Bucketing, Tables}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Plan-shape regression guards: the properties that make these operators
  * survive a 100× scale-up, asserted on the actual physical plans so a
  * refactor can't silently lose them. */
class PlanQualitySpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q02 dimension chain joins are all broadcast (no SortMergeJoin)") {
    val p = plan("q02_join_inner_dims")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("SortMergeJoin"), p.take(400))
  }

  test("q06 derived-key join is an equi-join, not a nested loop") {
    val p = plan("q06_join_derived_key")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(400))
  }

  test("q38 attribute filter pushes into the parquet scan") {
    val p = plan("q38_bm25_filtered")
    assert(p.contains("PushedFilters: [In(source"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("q24 scan prunes to the referenced columns only") {
    val p = plan("q24_chunk_fixed")
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("doc_id") && read.contains("text"))
    assert(!read.contains("lang") && !read.contains("source"),
      read)
  }

  test("q113 scores map-side: broadcast centroids, no corpus pre-shuffle") {
    val p = plan("q113_label_outliers")
    // the scoring pass joins the corpus to |labels| centroid rows — that
    // MUST be a broadcast hash join (an SMJ here would shuffle the whole
    // vector table before a single cosine is computed)
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin"), p.take(600))
    // exactly one window, partitioned by label (the bottom-k rank) —
    // cheap structural proof the corpus shuffles once, keyed
    val wins = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(wins.exists(_.contains("partitionBy")) ||
      p.contains("windowspecdefinition(label"), wins.mkString("\n"))
  }

  test("q114 rollups are map-side combined hash aggregates") {
    val p = plan("q114_source_novelty")
    // distinct-shingle reduction + min-owner + source rollups: all hash
    // aggregates with partial (map-side) phases, never a sort aggregate
    assert(!p.contains("SortAggregate"), p.take(600))
    assert(p.contains("partial_min") || p.contains("Partial"),
      p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(600))
  }

  test("partitioned store prunes statically and dynamically (DPP)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part_").toString
    Bucketing.writePartitioned(
      Tables.orders(spark, sfDir).withColumn("o_year", year($"o_orderdate")),
      dir, "o_year")
    val fact = spark.read.parquet(dir)

    // static pruning: a literal partition predicate reads a directory
    // subset (PartitionFilters, not a data filter)
    val static = fact.filter($"o_year" === 1995)
    val sp = static.queryExecution.executedPlan.toString
    assert(sp.contains("PartitionFilters: [isnotnull(o_year"), sp.take(600))

    // dynamic pruning: the predicate arrives through a filtered dim join
    // (dim must be a file scan — a local relation folds the filter away
    // and leaves nothing for the DPP rule to detect)
    val dimPath = s"$dir-dim"
    Seq((1995, "keep"), (1996, "drop"), (1997, "drop"))
      .toDF("o_year", "label").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val dpp = fact.join(dim.filter($"label" === "keep"), Seq("o_year"))
    val dp = dpp.queryExecution.executedPlan.toString
    assert(dp.contains("dynamicpruning"), dp.take(800))
    assert(dpp.count() ==
      Tables.orders(spark, sfDir).filter(year($"o_orderdate") === 1995).count())
  }

  test("q01 latest-pick map-side-combines below the shuffle, no window") {
    // round 22: the W1/QUALIFY "latest child per parent" is an argmax
    // aggregate (max_by over the W1 ordering struct), which must
    // (a) never plan a Window — the window form paid a full local sort
    //     before its partial WindowGroupLimit and a second one after
    //     the exchange — and
    // (b) keep a PARTIAL max_by below the l_orderkey exchange, so the
    //     shuffle carries at most one row per (mapper, orderkey)
    val p = plan("q01_flagship_latest_anti")
    assert(!p.contains("Window"), p.take(900))
    val partial = p.linesIterator.scanLeft(0)(_ + _.length + 1)
      .zip(p.linesIterator.toSeq)
      .collectFirst { case (off, l)
        if l.contains("Aggregate") && l.contains("partial_max_by") => off }
      .getOrElse(-1)
    val exchange = p.indexOf("Exchange hashpartitioning(l_orderkey")
    assert(partial >= 0 && exchange >= 0 && partial > exchange,
      s"partial max_by not below the exchange:\n${p.take(900)}")
  }

  test("q64 KMV sketch is a bounded aggregate, not a window sort") {
    val p = plan("q64_kmv_sketch")
    // the sketch state must aggregate (ObjectHashAggregate hosts the
    // TypedImperativeAggregate) …
    assert(p.contains("ObjectHashAggregate"), p.take(600))
    // … and NOTHING below the partial aggregate may sort or window the
    // hash stream (upper operators print first, so "below" = after the
    // LAST ObjectHashAggregate occurrence)
    val inputSide = p.substring(p.lastIndexOf("ObjectHashAggregate"))
    assert(!inputSide.contains("Window"), inputSide.take(600))
    assert(!inputSide.contains("Sort "), inputSide.take(600))
  }

  test("q28 minhash aggregates hash-based — no sort of the shingle stream") {
    val p = plan("q28_dedup_minhash_lsh")
    // int slots keep min() in HashAggregate; min(string) used to fall
    // back to SortAggregate, sorting every partition's shingles by doc_id
    assert(p.contains("HashAggregate"), p.take(600))
    assert(!p.contains("SortAggregate"), p.take(600))
  }

  test("q28 stop-bucket cap aggregates, it does not window the band table") {
    // the cap was once count().over(Window.partitionBy(band, bkey)) — a
    // per-partition SORT of the full band table (measured 2.2× on this
    // query). The shipped form is groupBy(band, bkey) + broadcast anti
    // join; any WindowExec reappearing in q28 is that regression
    val p = plan("q28_dedup_minhash_lsh")
    assert(!p.contains("Window"), p.take(800))
  }

  test("q54 bloom pruning filters the fact scan below the join") {
    val exec = SparkEntry.queries("q54_bloom_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the native might_contain probe must sit in a Filter under the join
    // (fact rows drop before shuffling), the join stays exact, and no
    // boxed UDF appears anywhere — the probe code-gens
    val joinPos = exec.indexOf("Join")
    val probePos = exec.linesIterator.collectFirst {
      case l if l.contains("Filter") && l.contains("might_contain")
        && l.contains("l_orderkey") => exec.indexOf(l)
    }.getOrElse(-1)
    assert(joinPos >= 0 && probePos > joinPos,
      s"bloom filter not below the join:\n${exec.take(900)}")
    assert(!exec.contains("UDF"), exec.take(900))
  }

  test("q57 salted join shuffle-hash-joins on (event_type, salt)") {
    val p = plan("q57_salted_join")
    assert(p.contains("ShuffledHashJoin [event_type"), p.take(600))
    assert(p.contains("salt"), p.take(600))
    assert(!p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("q73 PII scrub is a pure scan-side projection (zero shuffles)") {
    // the whole scrub must pipeline behind the parquet scan — a shuffle
    // here means someone broke the projection into a wide stage, which
    // at 100 TB turns an I/O-bound pass into a cluster-wide move
    val p = plan("q73_pii_redact")
    assert(!p.contains("Exchange hashpartitioning"), p.take(600))
    assert(!p.contains("UDF"), p.take(600))
  }

  test("q75 block count is map-side combined before its exchange") {
    val p = plan("q75_dup_block_fraction")
    assert(p.contains("partial_"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("q86 k-means assignment is join-free: vectors never fan out") {
    // the model is driver-held literal state (k·64 longs); if a Join of
    // any kind appears, someone reintroduced the crossJoin fan-out that
    // ships every vector k times — the shape that dies at 100 TB
    val p = plan("q86_kmeans_quantized")
    assert(!p.contains("Join"), p.take(800))
    assert(!p.contains("UDF"), p.take(800))
  }

  test("q84 duplicate-gram reduction is map-side combined, scan pruned") {
    val p = plan("q84_dup_span_coverage")
    assert(p.contains("partial_"), p.take(800))
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("lang") && !read.contains("source"), read)
  }

  test("q79 int8 kernel ranks without UDFs and without a global sort") {
    val p = plan("q79_int8_ann")
    assert(!p.contains("UDF"), p.take(800))
    // the only Sort allowed is the windowed per-q_id rank + presentation
    // order; a global Sort over the candidate stream would mean the
    // window lost its partitioning
    assert(p.contains("WindowGroupLimit") || p.contains("Window"),
      p.take(800))
  }

  test("q87 has no unpartitioned window anywhere in its plan") {
    // the round-7 form ran ntile(16) OVER (ORDER BY …) — a single-task
    // global sort of the whole fact table ("WindowExec: No Partition
    // Defined"). The shipped decomposition must keep every window
    // partitioned (per-z rank), whatever refactors come later.
    val df = SparkEntry.queries("q87_zorder_layout")(spark, sfDir)
    val bad = graft.tools.PlanAudit.unpartitionedWindows(
      df.queryExecution.executedPlan)
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("q100 generates pairs per-cluster: keyed join, no cross product") {
    // SemDeDup's entire value is that the near-dup pair space is bucketed
    // by the k-means cluster id — the pair join must be an EQUI-join on
    // cid (doc_id< is a post-filter). A CartesianProduct or
    // BroadcastNestedLoopJoin here means the clustering stopped gating
    // pair generation and the query degenerated to global all-pairs.
    val p = plan("q100_semdedup")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  // Queries whose plans legitimately contain a BroadcastNestedLoopJoin.
  // Membership is NOT the guarantee — the whole-surface fence below
  // asserts, per NLJ, that the broadcast side is actually bounded, in
  // one of two lanes:
  //  - STRUCTURAL: JoinAudit.nljBroadcastEvidence finds a limit /
  //    ungrouped aggregate (1-row corpus stat: avgdl/totals) / grouped
  //    aggregate over a bounded domain / driver local table /
  //    attr=literal point filter in the side's plan;
  //  - RUNTIME-CAPPED (`nljRuntimeCapped`): the side is a
  //    corpus-proportional SAMPLE at fixture scale (1-in-50 query
  //    batches, 1-in-40 IVF centroids, q106's anchors, q40's verify
  //    slice) — each site broadcasts through
  //    Similarity.boundedBroadcast, which `require`s ≤MaxBroadcastBatch
  //    rows before the broadcast exists AND re-applies `.limit(cap)`
  //    so the cap is ALSO visible to the evidence scan as a plan
  //    GlobalLimit (review find: before that, a revert to plain
  //    broadcast() passed the fence on set membership alone — now BOTH
  //    lanes must show structural evidence, so the skip is gone).
  // A NEW nested-loop query must pick a lane consciously: structural
  // evidence, or boundedBroadcast + this set. Regenerate the evidence
  // table with `runMain graft.tools.JoinAudit`.
  private val nljRuntimeCapped = Set(
    "q34_sim_cosine_topk", "q40_dedup_embedding_cosine",
    "q42_sim_topk_aggregate", "q44_sim_ivf_ann", "q79_int8_ann",
    "q96_pq_ann", "q106_hard_negatives", "q124_ivf_recall",
    "q125_pq_recall",
    // q159's two NLJs are its parents' lanes composed: the q44-shape
    // centroid assignment/probe cross joins and the q96-shape broadcast
    // query batch — both through boundedBroadcast (GlobalLimit evidence)
    "q159_ivf_pq_ann",
    // q165 is the METER over that composition: the same q44-shape
    // centroid crossJoins (assignment + probe ranks) plus the q125-
    // shape exact-ground-truth pass against the boundedBroadcast query
    // batch — three NLJs, every broadcast side bounded
    "q165_ivf_pq_recall")

  private val nljAllowed = Set(
    "q07_join_suffix_theta", "q36_bm25_topk",
    "q38_bm25_filtered", "q39_hybrid_search",
    "q72_unigram_perplexity",
    "q74_tfidf_topk", "q76_bigram_perplexity", "q78_lang_kl_divergence",
    "q82_mixture_weights", "q90_rrf_fusion",
    "q91_pmi_collocations", "q92_mixture_draw",
    "q111_dsir_importance", "q112_ngram_novelty",
    // q128's NLJs are q36's (n_docs, avgdl) 1-row-aggregate cross joins
    "q128_search_eval",
    // q108's NLJ is the candidate-count 1-row aggregate riding the
    // final plan (round 21 — replaced the blocking cands.count())
    "q108_lsh_evaluation",
    // q118's only NLJs are 1-row-aggregate cross joins (total tokens +
    // the (rem, source) pool riding a 1-row broadcast — the q112 bounds
    // pattern); both carry one-row-agg structural evidence
    "q118_budget_apportionment",
    // q123's NLJs are the same shape: the (n, budget, cap-pool) bounds
    // frame and the capped-mass frame are both 1-row ungrouped
    // aggregates cross-joined onto the source-sized table
    "q123_epoch_waterfall",
    // q133's NLJs: the max-day frame, three Quantiles.nearestRank
    // bucket-offset pools, and three 1-row threshold frames — all
    // 1-row ungrouped aggregates with structural evidence
    "q133_rfm_segments",
    // q134's NLJ is the 1-row event-type-vocabulary aggregate
    "q134_model_holdout") ++ nljRuntimeCapped

  test("whole surface: no unpartitioned window, no cartesian product, " +
    "nested-loop joins only on the tiny-broadcast allowlist") {
    // q90's candidate ranks are single-partition by design but carry an
    // explicit constant partition key; anything landing here is a new
    // global sort someone must justify.
    // CAVEAT (ADVICE r8): queries with construction-TIME actions — q87's
    // bounded z-histogram collect, q86/q100's k·64 centroid collects,
    // q83's eager bloom build, q96's one-job codebook train, q102/q107's
    // ≤256-row bucket-histogram collects, and the round-21 collect
    // sites (boundedBroadcast's guarded limit-collect, pqQueryTables'
    // bounded batch collect, q94/q127's bounded-report materialization) —
    // run jobs BEFORE the returned DataFrame exists, so those pre-plan
    // jobs are invisible to this sweep (and to PlanAudit's main). Each
    // is bounded by construction and documented at its collect site; a
    // new construction-time action must add itself to this list.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan
      val badWin = graft.tools.PlanAudit.unpartitionedWindows(plan)
      val (cart, nlj) = graft.tools.JoinAudit.scan(plan)
      // allowlisted NLJs must PROVE their tiny-broadcast contract: a
      // structural bound in the side's plan, or membership in the
      // runtime-capped lane (boundedBroadcast require at the site)
      val unproven =
        if (nlj > 0 && nljAllowed(name))
          graft.tools.JoinAudit.nljBroadcastEvidence(plan)
            .count(_.isEmpty)
        else 0
      spark.catalog.clearCache()
      graft.tools.Checkpoints.sweep(spark) // construction-time checkpoints
      Seq(
        if (badWin.nonEmpty) Seq(s"$name: ${badWin.size} unpartitioned window(s)") else Nil,
        if (cart > 0) Seq(s"$name: $cart CartesianProduct(s)") else Nil,
        if (nlj > 0 && !nljAllowed(name))
          Seq(s"$name: $nlj unallowlisted BroadcastNestedLoopJoin(s)") else Nil,
        if (unproven > 0)
          Seq(s"$name: $unproven allowlisted NLJ broadcast side(s) with no " +
            "structural bound (limit/agg/local-table/point-filter) — add " +
            "boundedBroadcast + nljRuntimeCapped, or restore the bound") else Nil
      ).flatten
    }
    assert(offenders.isEmpty, offenders.mkString(", "))
  }

  test("runtime-capped NLJ queries reject an over-cap broadcast batch") {
    // the runtime lane's contract is the require inside
    // Similarity.boundedBroadcast — prove it actually fires: a frame
    // larger than MaxBroadcastBatch must abort, a small one must pass
    import spark.implicits._
    val big = spark.range(graft.operators.Similarity.MaxBroadcastBatch + 1)
      .toDF("vec_id")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Similarity.boundedBroadcast(big, "fence-probe")
    }
    assert(ex.getMessage.contains("tiny-broadcast"), ex.getMessage)
    val small = spark.range(3).toDF("vec_id")
    assert(graft.operators.Similarity.boundedBroadcast(small, "fence-probe")
      .count() == 3)
  }

  test("bucketed orders⋈lineitem joins without any shuffle Exchange") {
    val wh = Files.createTempDirectory("graft_bucketed_").toString
    Bucketing.setupOrderLineitem(spark, sfDir, wh, buckets = 4)
    val joined = spark.table("orders_bucketed")
      .join(spark.table("lineitem_bucketed"), "o_orderkey")
      .where(col("o_totalprice") > 0)
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p.take(800))
    // and it still computes the right thing
    val expected = Tables.orders(spark, sfDir).join(
      Tables.lineitem(spark, sfDir),
      col("o_orderkey") === col("l_orderkey")).count()
    assert(joined.count() == expected)
  }

  test("bucketed pagerank step: edges never shuffle — ≤2 Exchanges vs 4 plain") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_pr_bucketed_").toString
    val pairs = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey").cast("long").as("sn"),
        (col("l_partkey") + 100000L).as("pn")).distinct()
    val edges = pairs.select($"sn".as("src"), $"pn".as("dst"))
      .union(pairs.select($"pn".as("src"), $"sn".as("dst")))
    val be = graft.operators.Graphs.bucketedEdges(edges, "pr_edges_fence", wh, 4)
    try {
      val deg = be.groupBy($"src").agg(count(lit(1)).as("deg"))
      val nodes = deg.select($"src".as("node"), $"deg")
      val r0 = nodes.select($"node", lit(1000000L).as("r"))
      val edB = graft.operators.Graphs.edgesWithDeg(be, deg)
      val stepB = graft.operators.Graphs.contributionStep(edB, r0)
      val pB = stepB.queryExecution.executedPlan.toString
      // the edge lane reads the bucketed layout...
      assert(pB.contains("Bucketed: true") ||
        pB.contains("SelectedBucketsCount"), pB.take(1200))
      // ...and per iteration only the |nodes|-sized rank frame and the
      // map-side-combined contribution sum move — never the edges
      val exB = "Exchange hashpartitioning".r.findAllIn(pB).length
      assert(exB <= 2, s"bucketed step has $exB exchanges:\n" + pB.take(1500))
      // the SAME step over the unbucketed edge list shuffles more (the
      // edge-side join exchange the layout exists to delete)
      val degU = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
      val nodesU = degU.select($"src".as("node"), $"deg")
      val stepU = graft.operators.Graphs.contributionStep(
        graft.operators.Graphs.edgesWithDeg(edges, degU),
        nodesU.select($"node", lit(1000000L).as("r")))
      val exU = "Exchange hashpartitioning".r
        .findAllIn(stepU.queryExecution.executedPlan.toString).length
      assert(exU > exB, s"unbucketed $exU vs bucketed $exB")
      // and the physical layout does not change the answer
      assert(stepB.orderBy($"node").collect().toSeq ==
        stepU.orderBy($"node").collect().toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS pr_edges_fence")
  }
}
