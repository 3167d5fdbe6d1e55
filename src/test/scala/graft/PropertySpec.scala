package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Property-based checks over SHIPPED kernels with randomized inputs —
  * the axis the fixture oracles can't cover (one corpus = one point in
  * input space). Deterministic seeds: every instance is reproducible
  * from the printed seed, no flakes.
  *
  * Two targets chosen because each has an independent reference that
  * is NOT the implementation:
  *  - the q123 waterfall's closed-form capped-set test vs a sequential
  *    simulation (the scaladoc's monotonicity proof, executed per
  *    instance);
  *  - the custom TopKByScore TypedImperativeAggregate vs the
  *    window+row_number desugar, across partitionings (exercises the
  *    partial/merge/eval paths the single-partition spec never hits).
  */
class PropertySpec extends SparkSuite {

  import spark.implicits._

  test("waterfall closed form == sequential simulation on 25 random instances") {
    val rng = new scala.util.Random(20260814L)
    for (inst <- 1 to 25) {
      val n = 2 + rng.nextInt(24)
      val toks = (0 until n).map { i =>
        // heavy-tailed sizes so instances mix capped and uncapped
        val t = rng.nextInt(5) match {
          case 0 => 1L + rng.nextInt(10)
          case 1 => 1L + rng.nextInt(1000)
          case _ => 1L + rng.nextInt(100)
        }
        (f"s$i%02d", t)
      }
      val out = Curation.waterfallAllocate(toks.toDF("source", "n_tok"))
        .collect().map(r => (r.getAs[String]("source"),
          r.getAs[Long]("n_tok"), r.getAs[Long]("cap"),
          r.getAs[Long]("capped"), r.getAs[Long]("alloc")))
      // sequential reference: walk caps ascending; cap a source iff it
      // fits under the equal-share level of the remaining budget, then
      // split the rest equally with remainder to the lowest ranks
      val budget = 3L * toks.map(_._2).sum / 2L
      val caps = toks.map { case (src, t) => (src, 8L * t / 5L) }
        .sortBy { case (src, c) => (c, src) }
      var remB = budget
      var remN = caps.length.toLong
      val cappedRef = scala.collection.mutable.Map[String, Boolean]()
      caps.foreach { case (src, c) =>
        if (remN > 0 && c * remN <= remB) {
          cappedRef(src) = true; remB -= c; remN -= 1
        } else cappedRef(src) = false
      }
      val uncappedSorted = caps.filter { case (src, _) => !cappedRef(src) }
      val base = if (remN > 0) remB / remN else 0L
      val extra = if (remN > 0) remB % remN else 0L
      val allocRef = (caps.filter { case (s0, _) => cappedRef(s0) }
        .map { case (s0, c) => s0 -> c } ++
        uncappedSorted.zipWithIndex.map { case ((s0, _), i) =>
          s0 -> (base + (if (i < extra) 1L else 0L)) }).toMap
      out.foreach { case (src, _, cap, capped, alloc) =>
        assert((capped == 1L) == cappedRef(src),
          s"seed-inst $inst $src capped mismatch: $capped vs ${cappedRef(src)}\n${out.mkString("\n")}")
        assert(alloc == allocRef(src),
          s"seed-inst $inst $src alloc mismatch: $alloc vs ${allocRef(src)}")
        assert(alloc <= cap, s"seed-inst $inst $src alloc > cap")
      }
      val total = out.map(_._5).sum
      val allCapped = out.forall(_._4 == 1L)
      assert(if (allCapped) total <= budget else total == budget,
        s"seed-inst $inst total $total vs budget $budget (allCapped=$allCapped)")
    }
  }

  test("TopKByScore == window desugar across random data and partitionings") {
    import graft.functions.TopKFunctions.top_k_by_score
    val rng = new scala.util.Random(42424242L)
    for (inst <- 1 to 8) {
      val rows = (0 until (50 + rng.nextInt(400))).map { i =>
        // coarse scores force ties — the (score desc, id asc) total
        // order must break them identically in both implementations
        (rng.nextInt(1 + rng.nextInt(12)).toLong, // group
          (rng.nextInt(20) / 4.0), // score with many ties
          i.toLong) // unique id
      }
      val k = 1 + rng.nextInt(7)
      for (parts <- Seq(1, 3, 7)) {
        val df = rows.toDF("g", "score", "id").repartition(parts)
        val agg = df.groupBy($"g")
          .agg(top_k_by_score($"score", $"id", k).as("top"))
          .select($"g", posexplode($"top").as(Seq("pos", "t")))
          .select($"g", ($"pos" + 1).cast("long").as("rank"),
            $"t.id".as("id"), $"t.score".as("score"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3))).sortBy(t => (t._1, t._2))
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy($"g").orderBy($"score".desc, $"id".asc)
        val ref = df.withColumn("rank", row_number().over(win))
          .filter($"rank" <= k)
          .select($"g", $"rank".cast("long"), $"id", $"score")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3))).sortBy(t => (t._1, t._2))
        assert(agg.toSeq == ref.toSeq,
          s"inst $inst k=$k parts=$parts:\nagg=${agg.take(8).mkString}\nref=${ref.take(8).mkString}")
      }
    }
  }

  test("BottomKDistinct == distinct-sort-take reference across partitionings") {
    import graft.functions.BottomKFunctions.bottom_k_distinct
    val rng = new scala.util.Random(7777777L)
    for (inst <- 1 to 8) {
      // duplicate-heavy hex-ish strings (the md5-prefix domain the
      // KMV sketch aggregates), multiple groups
      val rows = (0 until (80 + rng.nextInt(300))).map { _ =>
        (rng.nextInt(4).toLong,
          f"${rng.nextInt(60)}%08x") // dupes guaranteed
      }
      val k = 1 + rng.nextInt(9)
      val ref = rows.groupBy(_._1).view.mapValues(
        _.map(_._2).distinct.sorted.take(k).toSeq).toMap
      for (parts <- Seq(1, 5)) {
        val got = rows.toDF("g", "h").repartition(parts)
          .groupBy($"g").agg(bottom_k_distinct($"h", k).as("sk"))
          .collect()
          .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
        assert(got == ref, s"inst $inst k=$k parts=$parts")
      }
    }
  }

  test("Quantiles.nearestRank == driver-side sort on random distributions") {
    import graft.operators.Quantiles
    val rng = new scala.util.Random(13571357L)
    for (inst <- 1 to 10) {
      // mixed shapes: negatives, heavy ties, values straddling the
      // 2^16 coarse-bucket boundary, heavy tails
      val n = 50 + rng.nextInt(500)
      val vals = (0 until n).map { _ =>
        rng.nextInt(4) match {
          case 0 => (rng.nextInt(20) - 10).toLong // tiny, tied, negative
          case 1 => (rng.nextInt(200000) - 100000).toLong // straddles 2^16
          case 2 => rng.nextLong() % 1000000000L // heavy tail
          case _ => 42L // mass point
        }
      }
      val qs = Seq(("q25", 1, 4), ("q50", 2, 4), ("q75", 3, 4),
        ("p05", 1, 20), ("p95", 19, 20))
      val row = Quantiles.nearestRank(vals.toDF("x"), "x", qs).head()
      val sorted = vals.sorted
      qs.foreach { case (name, num, den) =>
        // nearest-rank: the ceil(q·n)-th smallest value (1-indexed)
        val rank = (num.toLong * n + den - 1) / den
        val expect = sorted((rank - 1).toInt)
        assert(row.getAs[Long](s"t_$name") == expect,
          s"inst $inst $name: ${row.getAs[Long](s"t_$name")} != $expect (n=$n)")
      }
    }
  }

  test("vector expressions == independent fold references on random vectors") {
    import graft.functions.VectorFunctions.{cosine_sim, dot_product, dot_product_long}
    val rng = new scala.util.Random(31337L)
    val rows = (0 until 200).map { i =>
      val dim = 64
      val a = Seq.fill(dim)(rng.nextDouble() * 2 - 1)
      val b = Seq.fill(dim)(rng.nextDouble() * 2 - 1)
      val al = Seq.fill(dim)((rng.nextInt(2000001) - 1000000).toLong)
      val bl = Seq.fill(dim)((rng.nextInt(2000001) - 1000000).toLong)
      (i.toLong, a, b, al, bl)
    }
    val got = rows.toDF("id", "a", "b", "al", "bl").repartition(3)
      .select($"id", dot_product($"a", $"b").as("dp"),
        cosine_sim($"a", $"b").as("cs"),
        dot_product_long($"al", $"bl").as("dl"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    rows.foreach { case (id, a, b, al, bl) =>
      // same left-to-right association as the expressions' loops: the
      // comparison is EXACT equality, not epsilon — the codegen'd
      // kernel must be the same IEEE op sequence as this fold
      val dp = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x * x))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x * x))
      val dl = al.zip(bl).foldLeft(0L) { case (acc, (x, y)) => acc + x * y }
      val (gdp, gcs, gdl) = got(id)
      assert(gdp == dp, s"id $id dot: $gdp != $dp")
      assert(gdl == dl, s"id $id dotLong: $gdl != $dl")
      assert(gcs == dp / (na * nb), s"id $id cos: $gcs != ${dp / (na * nb)}")
    }
  }
}
