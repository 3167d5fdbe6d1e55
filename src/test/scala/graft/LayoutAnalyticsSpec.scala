package graft

import graft.operators.{Analytics, Clustering, Spans}
import org.apache.spark.sql.functions._

/** Invariants of the round-5 span-dedup / clustering / layout-analytics
  * operators that the DuckDB hash-match can't express: structural
  * guarantees (island merge arithmetic, the winnowing density bound,
  * k-means conservation of mass) and the comparative claim q87 exists
  * to make — that a Z-order layout bounds BOTH dimensions where a
  * linear sort bounds only one. */
class LayoutAnalyticsSpec extends SparkSuite {

  test("q84 islands: covered tokens within bounds and >= 10 per span") {
    val rows = Spans.q84DupSpanCoverage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nSpans, nCov) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_spans"), r.getAs[Long]("n_covered"))
      assert(nCov <= nTok, s"doc ${r.get(0)}: coverage exceeds the document")
      // every merged island spans at least one full 10-token gram
      assert(nCov >= 10L * nSpans || nSpans == 0,
        s"doc ${r.get(0)}: an island shorter than a gram")
      val frac = r.getAs[Double]("dup_frac")
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // the fixture plants duplicate spans — the operator must find some
    assert(rows.exists(_.getAs[Long]("n_spans") > 0),
      "no duplicate spans found anywhere: kernel is blind")
  }

  test("q85 winnowing: every doc fingerprinted, density near 2/(w+1)") {
    val rows = Spans.q85Winnowing(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_fp") >= 1, s"doc ${r.get(0)}: no fingerprints")
      assert(r.getAs[Double]("density") <= 1.0)
    }
    // SIGMOD'03: expected selected density for random hashes is
    // 2/(w+1) = 0.4 for w = 4; distinct-collapse pulls it lower, runs
    // of equal minima pull it lower still — but it cannot sit near 0
    // or near 1 on random-ish text
    val mean = rows.map(_.getAs[Double]("density")).sum / rows.length
    assert(mean > 0.15 && mean < 0.6, s"implausible mean density $mean")
  }

  test("q119 stitching: planted split-document pair is found, boundary real") {
    import spark.implicits._
    // plant: doc 900001 ends with exactly the 3-gram doc 900002 starts
    // with (one document split across two records), plus an unrelated doc
    val dir = java.nio.file.Files.createTempDirectory("graft_stitch_").toString
    Seq(
      (900001L, "alpha beta gamma delta epsilon zeta", "en", "s0", 34L),
      (900002L, "delta epsilon zeta eta theta iota", "en", "s0", 33L),
      (900003L, "one two three four five six", "en", "s0", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Spans.q119StitchDetection(spark, dir).collect()
    assert(rows.length == 1, rows.mkString(", "))
    val r = rows.head
    assert(r.getAs[Long]("doc_a") == 900001L &&
      r.getAs[Long]("doc_b") == 900002L)
    assert(r.getAs[String]("boundary") == "delta epsilon zeta")
    // and on the real fixture every reported boundary IS doc_a's
    // trailing and doc_b's leading 3-gram
    val fix = Spans.q119StitchDetection(spark, sfDir).collect()
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").collect()
      .map(r2 => r2.getLong(0) -> r2.getString(1).split(" ")).toMap
    fix.foreach { p =>
      val (a, b) = (texts(p.getAs[Long]("doc_a")), texts(p.getAs[Long]("doc_b")))
      assert(a.takeRight(3).mkString(" ") == p.getAs[String]("boundary"))
      assert(b.take(3).mkString(" ") == p.getAs[String]("boundary"))
    }
  }

  test("q86 k-means conserves mass and moves are consistent") {
    val n = graft.sources.Tables.embeddings(spark, sfDir).count()
    val rows = Clustering.q86KmeansQuantized(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_iter1")).sum == n)
    assert(rows.map(_.getAs[Long]("n_iter2")).sum == n)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_moved_in") <= r.getAs[Long]("n_iter2"),
        s"cluster ${r.get(0)}: more arrivals than members")
    }
  }

  test("q87 Z-order halves the worst-dimension pruning cost of a linear sort") {
    import spark.implicits._
    val out = Analytics.q87ZorderLayout(spark, sfDir).collect()
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    assert(out.map(_.getAs[Long]("n_rows")).sum == li.count(),
      "files do not partition the table")
    // expected number of files whose envelope contains a uniformly
    // random point value, per dimension = sum(width)/256 — the
    // file-skipping cost of a point predicate on that dimension
    def eFiles(rows: Seq[(Long, Long, Long, Long)]): (Double, Double) = (
      rows.map { case (lx, hx, _, _) => (hx - lx + 1).toDouble / 256 }.sum,
      rows.map { case (_, _, ly, hy) => (hy - ly + 1).toDouble / 256 }.sum)
    val (zx, zy) = eFiles(out.toSeq.map(r => (r.getAs[Int]("min_x").toLong,
      r.getAs[Int]("max_x").toLong, r.getAs[Int]("min_y").toLong,
      r.getAs[Int]("max_y").toLong)))
    // same 16-file split, sorted on x alone: perfect on x, blind on y
    val linear = li
      .select(($"l_partkey" % 256).cast("int").as("x"),
        ($"l_orderkey" % 256).cast("int").as("y"),
        $"l_orderkey", $"l_linenumber")
      .withColumn("file_id", ntile(16).over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"x", $"l_orderkey", $"l_linenumber", $"y")))
      .groupBy($"file_id")
      .agg(min($"x").as("lx"), max($"x").as("hx"),
        min($"y").as("ly"), max($"y").as("hy"))
      .collect().map(r => (r.getAs[Int]("lx").toLong, r.getAs[Int]("hx").toLong,
        r.getAs[Int]("ly").toLong, r.getAs[Int]("hy").toLong))
    val (lx, ly) = eFiles(linear.toIndexedSeq)
    assert(math.max(zx, zy) < 0.5 * math.max(lx, ly),
      s"Z worst-dim ${math.max(zx, zy)} not < half of linear ${math.max(lx, ly)}")
  }

  test("z-order via repartitionByRange (the at-scale form) keeps balanced envelopes") {
    // q87's ntile is the oracle-exact exhibit; production lays out via a
    // sampled range exchange on z + one file per task — no global
    // window. The balanced-envelope property must survive that form.
    import spark.implicits._
    val parts = graft.sources.Tables.lineitem(spark, sfDir)
      .select(($"l_partkey" % 256).cast("int").as("x"),
        ($"l_orderkey" % 256).cast("int").as("y"))
      .withColumn("z", expr(Analytics.zExpr("x", "y")))
      .repartitionByRange(16, $"z")
      .select($"x", $"y",
        org.apache.spark.sql.functions.spark_partition_id().as("pid"))
      .groupBy($"pid")
      .agg(min($"x").as("lx"), max($"x").as("hx"),
        min($"y").as("ly"), max($"y").as("hy"))
      .collect()
    assert(parts.length > 1, "range exchange produced a single partition")
    def eFilesDim(widths: Seq[Long]): Double = widths.map(_.toDouble / 256).sum
    val ex = eFilesDim(parts.toSeq.map(r =>
      (r.getAs[Int]("hx") - r.getAs[Int]("lx") + 1).toLong))
    val ey = eFilesDim(parts.toSeq.map(r =>
      (r.getAs[Int]("hy") - r.getAs[Int]("ly") + 1).toLong))
    // a linear x-sort's worst dimension hits ALL files (E = #files);
    // the z range-layout must bound both dims well under that
    assert(math.max(ex, ey) < 0.5 * parts.length,
      s"range-partitioned z layout unbalanced: E_x=$ex E_y=$ey over ${parts.length} files")
  }

  test("q88 funnel is monotone within every cohort") {
    val rows = Analytics.q88Funnel(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, c, p) = (r.getAs[Long]("n_view"), r.getAs[Long]("n_click"),
        r.getAs[Long]("n_purchase"))
      assert(v >= c && c >= p, s"cohort ${r.get(0)}: funnel widens ($v,$c,$p)")
    }
  }

  test("q89 retention never exceeds the cohort's week-0 size") {
    val rows = Analytics.q89CohortRetention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val week0 = rows.filter(_.getAs[Long]("week_offset") == 0L)
      .map(r => r.getAs[Long]("cohort_week") -> r.getAs[Long]("n_users")).toMap
    rows.foreach { r =>
      val cw = r.getAs[Long]("cohort_week")
      assert(week0.contains(cw), s"cohort $cw has no week-0 row")
      assert(r.getAs[Long]("n_users") <= week0(cw),
        s"cohort $cw retains more users than it started with")
    }
  }
}
