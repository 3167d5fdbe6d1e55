package graft

import org.apache.spark.sql.functions._
import graft.operators.Embedding

/** Feature-hashed embeddings (q98): fixed width, quantized unit norm,
  * content-determined (the properties that make them drop-in vectors
  * for the q34/q40-style similarity kernels). */
class EmbeddingSpec extends SparkSuite {

  import spark.implicits._

  test("vectors are 64-wide with quantized unit L2 norm") {
    val rows = Embedding.q98HashEmbed(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val comps = r.getString(2).split(",", -1)
      assert(comps.length == 64, r)
      if (r.getDouble(1) > 0) {
        val norm = math.sqrt(
          comps.iterator.map(_.toDouble).map(x => x * x).sum)
        // each component rounds to 1e-6 fixed point: the quantized norm
        // sits within sqrt-of-accumulated-rounding of exactly 1e6
        assert(math.abs(norm - 1e6) < 100, s"norm $norm for $r")
      }
    }
  }

  test("equal texts embed identically; embeddings are partition-stable") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val v = Embedding.q98HashEmbed(spark, sfDir)
    val perText = docs.join(v, "doc_id")
      .groupBy($"text").agg(countDistinct($"vec").as("nv"))
    assert(perText.filter($"nv" =!= 1).isEmpty)
    // determinism across physical partitionings (integer quantization):
    val a = Embedding.q98HashEmbed(spark, sfDir).collect().toSeq
    val b = Embedding.q98HashEmbed(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("q113 label outliers: bottom-5 per label, ranked, below label mean") {
    val rows = Embedding.q113LabelOutliers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    byLabel.foreach { case (label, rs) =>
      // dense ranks 1..k with cosine non-decreasing in rank (these ARE
      // the k vectors least like their centroid, in order)
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq ==
        (1 to rs.length).toSeq, s"label $label ranks")
      val cos = sorted.map(_.getAs[Double]("cos_centroid"))
      assert(cos.zip(cos.tail).forall { case (x, y) => x <= y },
        s"label $label not sorted: ${cos.toSeq}")
      cos.foreach(c => assert(c >= -1.000001 && c <= 1.000001))
    }
    // the flagged outliers sit strictly below their label's mean
    // cosine-to-centroid — otherwise they would not be outliers
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.dot_product_long
    val q = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(floor(x * 1000.0) AS BIGINT))")
          .as("qv"))
    // label means of the same quantized cosine, computed independently
    val cen = q.select(col("label"),
        posexplode(col("qv")).as(Seq("dim", "c")))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("c")).as("sc"), count(lit(1)).as("n"))
      .select(col("label"), col("dim"), expr("sc div n").as("m"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        p => p.getField("m")).as("cen"))
    val mean = q.join(broadcast(cen), Seq("label"))
      .select(col("label"),
        (dot_product_long(col("qv"), col("cen")) /
          (sqrt(dot_product_long(col("qv"), col("qv")).cast("double")) *
            sqrt(dot_product_long(col("cen"), col("cen")).cast("double"))))
          .as("cos"))
      .groupBy(col("label")).agg(avg(col("cos")).as("mu"))
      .collect().map(r => r.getAs[Int]("label") -> r.getAs[Double]("mu"))
      .toMap
    byLabel.foreach { case (label, rs) =>
      val worst = rs.map(_.getAs[Double]("cos_centroid")).min
      assert(worst < mean(label),
        s"label $label worst $worst !< mean ${mean(label)}")
    }
  }

  test("q115 quadrant cells partition the corpus exactly") {
    val rows = Embedding.q115CurationQuadrant(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val d = graft.sources.Tables.documents(spark, sfDir)
    // the quadrant is a PARTITION of the corpus: doc counts and char
    // mass both sum back to the table's totals
    assert(rows.map(_.getAs[Long]("n_docs")).sum == d.count())
    val totalChars = d.agg(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.col("n_chars"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("char_mass")).sum == totalChars)
    // the kept margin must agree with q110's verdict column
    val keptHere = rows.filter(_.getAs[Int]("kept") == 1)
      .map(_.getAs[Long]("n_docs")).sum
    val keptQ110 = Embedding.q110QualityClassifier(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("kept") === 1).count()
    assert(keptHere == keptQ110, s"$keptHere != $keptQ110")
  }

  test("q121 domain cap: admits exactly top-10 by score, accounts all mass") {
    val rows = Embedding.q121DomainCap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val d = graft.sources.Tables.documents(spark, sfDir)
    // per-source doc counts recount from the table
    val nBySource = d.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val charsBySource = d.groupBy($"source")
      .agg(sum($"n_chars").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // q110 scores, descending per source — the independent admission
    // recount the cutoff must agree with
    val scores = Embedding.q110QualityClassifier(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("score")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.reverse).toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val n = r.getAs[Long]("n_docs")
      assert(n == nBySource(src), r.toString)
      assert(r.getAs[Long]("n_kept") == math.min(10L, n), r.toString)
      // kept + dropped mass partitions the source's chars exactly
      assert(r.getAs[Long]("kept_chars") + r.getAs[Long]("dropped_chars")
        == charsBySource(src), r.toString)
      // the realized admission bar IS the 10th-highest score
      assert(r.getAs[Long]("cutoff_score")
        == scores(src).take(10).last, r.toString)
    }
    // the fixture must actually exercise the cap (25 docs per source)
    assert(rows.exists(r => r.getAs[Long]("dropped_chars") > 0L))
  }

  test("q127 attribution partitions the corpus; stage recounts agree") {
    val rows = Embedding.q127DropAttribution(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val d = graft.sources.Tables.documents(spark, sfDir)
    // exactly one verdict per document, char mass conserved
    assert(rows.map(_.getAs[Long]("n_docs")).sum == d.count())
    val totalChars = d.agg(sum($"n_chars")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("char_mass")).sum == totalChars)
    val reasons = rows.map(_.getAs[String]("drop_reason")).toSet
    assert(reasons.subsetOf(
      Set("dup", "quality", "domain_cap", "length", "kept")))
    // independent recount of the quality stage: non-dup docs scoring < 0
    val dup = d.select($"doc_id", md5($"text").as("dg"))
    val canon = dup.groupBy($"dg").agg(min($"doc_id").as("canon"))
    val nQuality = dup.join(canon, Seq("dg"))
      .filter($"doc_id" === $"canon")
      .join(Embedding.q110QualityClassifier(spark, sfDir)
        .filter($"kept" === 0), Seq("doc_id"))
      .count()
    assert(rows.filter(_.getAs[String]("drop_reason") == "quality")
      .map(_.getAs[Long]("n_docs")).sum == nQuality)
    // kept docs per source can never exceed the cap
    rows.filter(_.getAs[String]("drop_reason") == "kept").foreach { r =>
      assert(r.getAs[Long]("n_docs") <= Embedding.DomainCap.toLong,
        r.toString)
    }
  }
}
