package graft

import graft.operators.Curation

/** Properties of the round-5 curation operators that the DuckDB oracles
  * can't express: invariants (KL ≥ 0, ratios in bounds, redaction
  * completeness) and a hand-computed bigram-LM replay on a corpus small
  * enough to evaluate by hand. */
class CurationSpec extends SparkSuite {

  /** Write a minimal documents.parquet with the fixture schema. */
  private def tinyCorpus(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_curfix_").toString
    rows.map { case (id, text, lang, src) =>
      (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q73 redaction is complete: every planted email and IP is found and scrubbed") {
    val rows = Curation.q73PiiRedact(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_emails") == 1L,
        s"doc ${r.get(0)}: expected exactly the planted email")
      assert(r.getAs[Long]("n_ips") == 1L,
        s"doc ${r.get(0)}: expected exactly the planted IP")
    }
    // the scrub must strictly shrink the text: '<EMAIL>'/'<IP>' are
    // shorter than any planted 'userN@example.com' / '10.0.x.y'
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", org.apache.spark.sql.functions.length($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getAs[Number]("n").longValue).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getAs[Long]("n_chars_redacted") < docs(id) + 60,
        s"doc $id: redacted length suggests the PII survived")
    }
  }

  test("q74 ranks are dense and scores non-increasing within each document") {
    val rows = Curation.q74TfidfTopK(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rnk"))
      assert(byRank.map(_.getAs[Int]("rnk")).toSeq == (1 to rs.length),
        s"doc $doc: ranks not dense")
      val scores = byRank.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b },
        s"doc $doc: scores increase down the ranking")
    }
  }

  test("q75 dup-block accounting matches an independent pair-join recount") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Curation.q75DupBlockFraction(spark, sfDir).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("avg_dup_frac") >= 0.0 &&
        r.getAs[Double]("avg_dup_frac") <= r.getAs[Double]("max_dup_frac") &&
        r.getAs[Double]("max_dup_frac") <= 1.0)
    }
    // independent recount of total duplicated block slots, formulated
    // the opposite way round (per-block occurrence table joined to the
    // distinct-doc counts, no per-doc stage)
    val blocks = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 10)
      .select($"doc_id", explode(expr(
        """transform(sequence(0, CAST(floor(size(t) / 10.0) AS INT) - 1),
          |  i -> concat_ws(' ', slice(t, i * 10 + 1, 10)))""".stripMargin))
        .as("blk"))
    val expected = blocks
      .join(blocks.groupBy("blk").agg(countDistinct($"doc_id").as("nd")), "blk")
      .filter($"nd" > 1).count()
    assert(out.map(_.getAs[Long]("total_dup_blocks")).sum == expected)
  }

  test("q76 bigram perplexity matches a hand-evaluated model on a tiny corpus") {
    val dir = tinyCorpus(Seq(
      (0L, "a b a b a", "en", "s0"),
      (1L, "a b c", "en", "s0"),
      (2L, "c c c c", "fr", "s1")))
    // replicate the model by hand
    val docs = Seq(
      (0L, "en", Seq("a", "b", "a", "b", "a")),
      (1L, "en", Seq("a", "b", "c")),
      (2L, "fr", Seq("c", "c", "c", "c")))
    val uni = docs.flatMap(_._3).groupBy(identity).map { case (t, o) => t -> o.size }
    val nTotal = uni.values.sum
    val vSize = uni.size
    val bi = docs.flatMap(d => d._3.zip(d._3.drop(1)))
      .groupBy(identity).map { case (p, o) => p -> o.size }
    def ppl(toks: Seq[String]): Double = {
      val lps = toks.zip(toks.drop(1)).map { case (p, c) =>
        math.log(0.7 * bi((p, c)) / uni(p) +
          0.3 * (uni(c) + 1.0) / (nTotal + vSize)) }
      math.exp(-lps.sum / lps.size)
    }
    val expect = docs.groupBy(_._2).map { case (lang, ds) =>
      val ps = ds.map(d => ppl(d._3))
      lang -> ((ds.size.toLong,
        BigDecimal(ps.sum / ps.size).setScale(2, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(ps.max).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    }
    val got = Curation.q76BigramPerplexity(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_docs"),
        BigDecimal(r.getAs[Double]("avg_ppl")),
        BigDecimal(r.getAs[Double]("max_ppl"))))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (lang, (n, avg, mx)) =>
      val (gn, gavg, gmx) = got(lang)
      assert(gn == n, s"$lang n_docs")
      assert((gavg - avg).abs <= BigDecimal("0.01"), s"$lang avg_ppl $gavg vs $avg")
      assert((gmx - mx).abs <= BigDecimal("0.01"), s"$lang max_ppl $gmx vs $mx")
    }
  }

  test("q77 diversity ratios are bounded; an all-distinct doc scores ttr 1") {
    val rows = Curation.q77LexicalDiversity(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_ttr") > 0.0 && r.getAs[Double]("avg_ttr") <= 1.0)
      assert(r.getAs[Double]("min_ttr") > 0.0 &&
        r.getAs[Double]("min_ttr") <= r.getAs[Double]("avg_ttr"))
      assert(r.getAs[Double]("avg_hapax") >= 0.0 && r.getAs[Double]("avg_hapax") <= 1.0)
    }
    val dir = tinyCorpus(Seq((0L, "x y z", "en", "s0")))
    val tiny = Curation.q77LexicalDiversity(spark, dir).collect()
    assert(tiny.length == 1 && tiny(0).getAs[Double]("avg_ttr") == 1.0 &&
      tiny(0).getAs[Double]("avg_hapax") == 1.0)
  }

  test("q81 contamination recount via inner-join agrees; bounds hold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Curation.q81NgramContamination(spark, sfDir).collect()
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("test", "val"))
    out.foreach { r =>
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_grams"))
      assert(r.getAs[Double]("frac") >= 0.0 && r.getAs[Double]("frac") <= 1.0)
    }
    // independent recount: distinct (split, gram) inner-joined to the
    // train gram set and counted — no semi-join, no left join. The gram
    // derivation is re-declared here ON PURPOSE (not via Curation
    // .splitGrams): this is the differential check that the shared
    // helper computes what the spec says it computes.
    val bucket = substring(md5(concat(lit("split:"), $"doc_id")), 1, 1)
    val grams = graft.sources.Tables.documents(spark, sfDir)
      .withColumn("split",
        when(bucket.isin("c", "d"), "val")
          .when(bucket.isin("e", "f"), "test").otherwise("train"))
      .select($"split", split($"text", " ").as("t"))
      .filter(size($"t") >= 5)
      .select($"split", explode(expr(
        """transform(sequence(1, size(t) - 4),
          |  i -> concat_ws(' ', slice(t, i, 5)))""".stripMargin)).as("gram"))
    val recount = grams.filter($"split" =!= "train").distinct()
      .join(grams.filter($"split" === "train").select($"gram").distinct(),
        "gram")
      .groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_contaminated") ==
        recount.getOrElse(r.getString(0), 0L),
        s"${r.getString(0)}: semi-join and inner-join recounts disagree")
    }
  }

  test("q83 bloom decontamination is one-sided and fpp-bounded vs exact q81") {
    val exact = Curation.q81NgramContamination(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_contaminated")))).toMap
    val bloom = Curation.q83BloomContamination(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_flagged")))).toMap
    assert(bloom.keySet == exact.keySet)
    exact.foreach { case (split, (nGrams, nCont)) =>
      val (bGrams, bFlagged) = bloom(split)
      assert(bGrams == nGrams, s"$split: gram universes differ")
      // one-sided: a bloom filter has NO false negatives — every truly
      // contaminated gram must be flagged
      assert(bFlagged >= nCont, s"$split: bloom missed true positives")
      // overcount bounded by fpp (1% target; 3x slack for a small
      // clean-gram population where the binomial variance is visible)
      val clean = nGrams - nCont
      assert(bFlagged - nCont <= math.max(5L, (clean * 0.03).toLong),
        s"$split: ${bFlagged - nCont} false positives on $clean clean grams")
    }
  }

  test("q82 weights normalize and temperature flattens the distribution") {
    val rows = Curation.q82MixtureWeights(spark, sfDir).collect()
    val ws = rows.map(_.getAs[Double]("w"))
    val ps = rows.map(_.getAs[Double]("p"))
    assert(math.abs(ws.sum - 1.0) < 1e-3, s"weights sum to ${ws.sum}")
    assert(math.abs(ps.sum - 1.0) < 1e-3, s"shares sum to ${ps.sum}")
    assert(math.abs(rows.map(_.getAs[Double]("expected_docs")).sum - 1000.0) < 1.0)
    // α = 0.5 tempering must strictly flatten a non-uniform distribution
    assert(ws.max / ws.min < ps.max / ps.min,
      s"tempering failed to flatten: w-ratio ${ws.max / ws.min} vs p-ratio ${ps.max / ps.min}")
  }

  test("q78 KL is non-negative per slice and exactly zero for a single-slice corpus") {
    val rows = Curation.q78LangKlDivergence(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("kl") >= 0.0,
      s"Gibbs violated for ${r.getString(0)}: ${r.getAs[Double]("kl")}"))
    // one slice == the corpus -> identical distributions -> KL = 0
    val dir = tinyCorpus(Seq(
      (0L, "a b a", "en", "s0"), (1L, "b c", "en", "s0")))
    val tiny = Curation.q78LangKlDivergence(spark, dir).collect()
    assert(tiny.length == 1 && tiny(0).getAs[Double]("kl") == 0.0)
  }

  test("q111 importance weights separate the target domain from the rest") {
    // DSIR's whole premise: documents FROM the target distribution score
    // higher than documents from elsewhere. With target = lang 'en', the
    // mean log-weight of en docs must exceed the mean of every other
    // language (hashed-bigram features at B=64 keep plenty of signal at
    // fixture scale), and weights must cover every bigram-bearing doc.
    val rows = Curation.q111DsirImportance(spark, sfDir).collect()
    assert(rows.length > 0)
    val byLang = rows.groupBy(_.getAs[String]("lang")).map { case (l, rs) =>
      l -> rs.map(_.getAs[Double]("log_weight")).sum / rs.length
    }
    val en = byLang("en")
    byLang.filterNot(_._1 == "en").foreach { case (l, m) =>
      assert(en > m, f"mean log-weight en=$en%.3f not above $l=$m%.3f")
    }
    // weights are finite (smoothing leaves no -inf buckets)
    rows.foreach(r => assert(!r.getAs[Double]("log_weight").isInfinite))
  }

  test("q118 apportionment hits the budget exactly, within 1 of ideal") {
    val rows = Curation.q118BudgetApportionment(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val B = 1000000L
    // the defining property largest-remainder exists for: Σ alloc = B
    // EXACTLY, no rounding drift
    assert(rows.map(_.getAs[Long]("alloc")).sum == B)
    // Hamilton stays within 1 token of the exact rational share
    val totT = rows.map(_.getAs[Long]("est_tokens")).sum
    rows.foreach { r =>
      val ideal = B.toDouble * r.getAs[Long]("est_tokens") / totT
      val alloc = r.getAs[Long]("alloc")
      assert(math.abs(alloc - ideal) <= 1.0, s"$r ideal=$ideal")
      assert(r.getAs[Long]("extra") == 0L || r.getAs[Long]("extra") == 1L)
      assert(alloc == r.getAs[Long]("base") + r.getAs[Long]("extra"))
    }
  }

  test("q123 waterfall matches a sequential reference and fills the budget") {
    val rows = Curation.q123EpochWaterfall(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val totT = rows.map(_.getAs[Long]("n_tok")).sum
    val budget = (3L * totT) / 2L
    // independent SEQUENTIAL waterfall: walk sources by cap ascending;
    // cap a source iff its cap fits under the equal-share level of the
    // budget remaining at that point. This is the semantics the closed
    // form (rank/prefix-sum test) claims to equal — the monotonicity
    // proof in the operator's scaladoc, executed.
    val sorted = rows.sortBy(r =>
      (r.getAs[Long]("cap"), r.getAs[String]("source")))
    var remB = budget
    var remN = n
    val cappedRef = sorted.map { r =>
      val c = r.getAs[Long]("cap")
      if (remN > 0 && c * remN <= remB) { remB -= c; remN -= 1; true }
      else false
    }
    sorted.zip(cappedRef).foreach { case (r, ref) =>
      assert((r.getAs[Long]("capped") == 1L) == ref, r.toString)
    }
    // survivors split the remainder exactly (largest-remainder style):
    // total allocation hits the budget to the token when anyone is
    // uncapped, and uncapped allocations differ by at most 1
    val (capped, uncapped) = rows.partition(_.getAs[Long]("capped") == 1L)
    assert(uncapped.nonEmpty, "fixture should leave some source uncapped")
    assert(capped.nonEmpty, "fixture should cap some source")
    assert(rows.map(_.getAs[Long]("alloc")).sum == budget)
    capped.foreach { r =>
      assert(r.getAs[Long]("alloc") == r.getAs[Long]("cap"), r.toString) }
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc") <= r.getAs[Long]("cap"), r.toString) }
    val ua = uncapped.map(_.getAs[Long]("alloc"))
    assert(ua.max - ua.min <= 1L, ua.mkString(","))
    // water level: every capped source's cap sits at or below what the
    // survivors each receive (that's WHY it capped)
    assert(capped.map(_.getAs[Long]("cap")).max <= ua.min)
  }

  test("q116 trims at most the outlier tails, never the body") {
    val rows = Curation.q116LengthTrim(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach { r =>
      val (n, lo, hi, trimmed) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("lo"), r.getAs[Long]("hi"),
        r.getAs[Long]("n_trimmed"))
      assert(lo <= hi, r.toString)
      // nearest-rank p05/p95: strictly-below-lo docs < ceil(n/20) and
      // strictly-above-hi docs ≤ n - ceil(19n/20), so the trim can never
      // exceed 10% of the language (the filter drops tails, not body)
      assert(trimmed <= n / 10 + 2, s"trimmed $trimmed of $n: $r")
      val frac = r.getAs[Double]("kept_char_frac")
      assert(frac > 0.0 && frac <= 1.0, r.toString)
    }
  }
}
