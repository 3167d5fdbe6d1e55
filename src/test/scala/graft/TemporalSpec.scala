package graft

/** Sketch accuracy bound + temporal join sanity (q50/q51 values are
  * oracle-gated; q52 is approximate so it is bounded here instead). */
class TemporalSpec extends SparkSuite {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("HLL union estimate within 5% of exact distinct count per group") {
    val approx = graft.operators.Temporal.q52HllSketch(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").cast("double").as("n"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) / n < 0.05,
        s"$k: approx ${approx(k)} vs exact $n")
    }
  }

  test("q93 KMV Jaccard estimates track the exact pairwise Jaccard") {
    // exact pairwise Jaccard over the same 3-gram shingle sets; KMV
    // stddev is sqrt(J(1-J)/k) ~ 0.02 at J ~ 0.03, k = 64 — bound at
    // ~4 sd. Also pins the estimator's structural range.
    val est = graft.operators.Temporal.q93KmvJaccard(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("j_est"))
      .toMap
    assert(est.nonEmpty)
    val grams = graft.sources.Tables.documents(spark, sfDir)
      .filter($"source".isin("src0", "src1", "src2", "src3", "src4"))
      .select($"source", split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
      .select($"source", explode(expr(
        "transform(sequence(1, size(t) - 2), i -> concat_ws(' ', slice(t, i, 3)))"))
        .as("g"))
      .distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet)
    est.foreach { case ((a, b), j) =>
      assert(j >= 0.0 && j <= 1.0)
      for (ga <- grams.get(a); gb <- grams.get(b)) {
        val exact = (ga & gb).size.toDouble / (ga | gb).size
        assert(math.abs(j - exact) <= 0.08,
          s"($a,$b): est $j vs exact $exact drifts past 4 sd")
      }
    }
  }

  test("KMV groups with fewer than k distinct values drop, not throw") {
    // ANSI mode (Spark 4 default) makes element_at throw past the array
    // end; the sketch must DROP under-filled groups like the window/rn=k
    // form does. 10 distinct values < k=64 → empty result, no exception.
    import graft.functions.BottomKFunctions.bottom_k_distinct
    val df = (1 to 10).map(i => ("g", f"$i%02d")).toDF("g", "h")
    val r = df.groupBy($"g").agg(bottom_k_distinct($"h", 64).as("sk"))
      .withColumn("v", try_element_at($"sk", lit(64)))
      .filter($"v".isNotNull)
    assert(r.isEmpty)
  }

  test("CMS never under-counts and over-counts within the d·N/w bound") {
    val rows = graft.operators.Temporal.q68CmsHeavyHitters(spark, sfDir)
      .collect()
    assert(rows.length == 20)
    val totalTokens = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("t")).count()
    // deterministic CMS property: estimates are upper bounds
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"${r.getString(0)}: CMS under-counted") }
    // expected collision mass per cell is N/w; min over d=4 rows stays
    // well under the single-row Markov bound — assert the loose 4·N/w
    val bound = 4.0 * totalTokens / 1024.0
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") <= bound,
        s"${r.getString(0)}: overcount ${r.getAs[Long]("overcount")} > $bound")
    }
  }

  test("CMS sketches merge: 3-way split cells sum to the corpus cells") {
    import graft.operators.Temporal
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
    val whole = Temporal.cmsCells(toks.select($"token"))
    // build one sketch per disjoint corpus slice, merge by summing cells
    val merged = (0 to 2)
      .map(r => Temporal.cmsCells(
        toks.filter($"doc_id" % 3 === r).select($"token")))
      .reduce(_ unionByName _)
      .groupBy($"j", $"bucket").agg(sum($"c").as("c"))
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
  }

  test("as-of join picks the latest at-or-before error only") {
    val out = graft.operators.Temporal.q51AsOfJoin(spark, sfDir)
    // one row per purchase, even for purchases with no prior error
    val purchases = graft.sources.Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase").count()
    assert(out.count() == purchases)
    assert(out.filter($"asof_e_id" === -1L).count() >= 0)
  }

  test("q130 transition matrix is row-stochastic and conserves pairs") {
    val rows = graft.operators.Analytics
      .q130MarkovTransitions(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every user with k events contributes exactly k−1 adjacent pairs
    val ev = graft.sources.Tables.events(spark, sfDir)
    val expectPairs = ev.count() - ev.select($"user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expectPairs)
    // each row of the matrix sums to ~1 (6-decimal rounding per cell)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (ft, rs) =>
      val sp = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(sp - 1.0) < 1e-4, s"$ft row sums to $sp")
      rs.foreach(r => assert(r.getAs[Double]("p") > 0.0, r.toString))
    }
    // matrix size bounded by the event-type vocabulary squared
    val nTypes = ev.select($"event_type").distinct().count()
    assert(rows.length <= nTypes * nTypes)
  }

  test("q131 dwell quantiles are ordered and its pairs are exactly q130's") {
    val dwell = graft.operators.Analytics
      .q131TransitionDwell(spark, sfDir).collect()
    val markov = graft.operators.Analytics
      .q130MarkovTransitions(spark, sfDir).collect()
    // same adjacency stream ⇒ identical (from, to, n) triples
    val dTriples = dwell.map(r => (r.getAs[String]("from_type"),
      r.getAs[String]("to_type"), r.getAs[Long]("n"))).sorted.toSeq
    val mTriples = markov.map(r => (r.getAs[String]("from_type"),
      r.getAs[String]("to_type"), r.getAs[Long]("n"))).sorted.toSeq
    assert(dTriples == mTriples)
    dwell.foreach { r =>
      val (med, p90) = (r.getAs[Long]("median_gap_s"),
        r.getAs[Long]("p90_gap_s"))
      assert(med >= 0L && p90 >= med, r.toString)
      val mean = r.getAs[Double]("mean_gap_s")
      // the mean of nonnegative gaps sits within [0, max]; vs the
      // quantiles it must be positive whenever p90 is
      assert(mean >= 0.0, r.toString)
    }
  }

  test("q132 anomaly list is the true bottom-10 under the q130 model") {
    val out = graft.operators.Analytics
      .q132SequenceAnomaly(spark, sfDir).collect()
    assert(out.length == 10)
    val lls = out.map(_.getAs[Double]("avg_ll")).toSeq
    assert(lls == lls.sorted, lls.mkString(","))
    assert(lls.forall(_ <= 0.0), lls.mkString(","))
    out.foreach(r => assert(r.getAs[Long]("n_transitions") >= 1L))
    // independent recount: rebuild per-user mean log-likelihood from
    // the pair counts themselves — UNROUNDED ratios, so the tolerance
    // only has to absorb summation-order noise, not q130's 6-decimal
    // display rounding (review find: the rounded-matrix form had
    // worst-case log error approaching its own tolerance)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("nt", org.apache.spark.sql.functions
        .lead($"event_type", 1).over(w))
      .filter($"nt".isNotNull)
      .select($"user_id", $"event_type", $"nt").collect()
    val nFromTo = pairs.groupBy(r => (r.getString(1), r.getString(2)))
      .view.mapValues(_.length.toLong).toMap
    val nFrom = pairs.groupBy(_.getString(1))
      .view.mapValues(_.length.toLong).toMap
    val byUser = pairs.groupBy(_.getLong(0)).view.mapValues { rs =>
      rs.map { r =>
        math.log(nFromTo((r.getString(1), r.getString(2))).toDouble /
          nFrom(r.getString(1)))
      }.sum / rs.length
    }.toMap
    val worst = out.head
    val ref = byUser(worst.getAs[Long]("user_id"))
    // q132 rounds its output to 6 decimals; 1e-6 absorbs that plus
    // float-summation noise with two orders of margin
    assert(math.abs(worst.getAs[Double]("avg_ll") - ref) < 1e-6 + 5e-7,
      s"${worst.getAs[Double]("avg_ll")} vs $ref")
  }

  test("q133 RFM cells partition the purchasers; scores stay in 1..4") {
    val rows = graft.operators.Analytics
      .q133RfmSegments(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val purchasers = graft.sources.Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .select($"user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == purchasers)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Int](c)
        assert(v >= 1 && v <= 4, r.toString)
      }
      assert(r.getAs[Long]("monetary_c") >= 0L, r.toString)
    }
    // data-driven quartiles: each marginal score class is populated
    // (a constant-threshold bug collapses a dimension to one class)
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val classes = rows.map(_.getAs[Int](c)).toSet
      assert(classes.size >= 3, s"$c classes $classes")
    }
  }

  test("q134 holdout eval: splits partition the pairs; train scores ≥ holdout") {
    val rows = graft.operators.Analytics
      .q134ModelHoldout(spark, sfDir).collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Long]("n_transitions"), r.getAs[Double]("avg_ll"))).toMap
    assert(rows.keySet == Set("train", "holdout"))
    val ev = graft.sources.Tables.events(spark, sfDir)
    val totalPairs = ev.count() - ev.select($"user_id").distinct().count()
    assert(rows.values.map(_._1).sum == totalPairs)
    rows.values.foreach { case (_, ll) =>
      assert(ll < 0.0 && !ll.isNaN && !ll.isInfinite, ll.toString) }
    // the model was FIT on train: it must score its own split at least
    // as well as the holdout (a tie is possible in theory; an inverted
    // gap means the split leaked or the join mis-keyed)
    assert(rows("train")._2 >= rows("holdout")._2,
      s"train ${rows("train")._2} < holdout ${rows("holdout")._2}")
  }
}
