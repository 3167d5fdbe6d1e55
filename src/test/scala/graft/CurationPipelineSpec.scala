package graft

import graft.operators.{Curation, Dedup, Embedding}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The CURATION lifecycle as one composed run — the training-data
  * counterpart to E2ESpec's reference-ingestion lifecycle: exact dedup →
  * model-based quality filter → per-source domain cap → per-language
  * length trim → deterministic
  * shuffle into shards, each stage consuming the PREVIOUS stage's
  * surviving frame (not the fixture), with the stage invariants the
  * per-query oracle gates cannot see because they each run against the
  * full fixture in isolation.
  *
  * The point under test is composability: the library's per-query faces
  * wrap frame-level kernels (classifierScores, noveltyAssemble, the
  * md5-rank shuffle) that a production pipeline chains; this spec chains
  * them and checks the funnel arithmetic end to end. */
class CurationPipelineSpec extends SparkSuite {

  import spark.implicits._

  test("dedup → quality filter → domain cap → length trim → shard: " +
      "funnel accounting") {
    val docs = Tables.documents(spark, sfDir).cache()
    val n0 = docs.count()

    // stage 1 — exact dedup: keep the canonical (min doc_id) per digest
    val canon = docs.withColumn("dg", md5($"text"))
      .withColumn("keep",
        $"doc_id" === min($"doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"dg")))
      .filter($"keep").drop("dg", "keep").cache()
    val n1 = canon.count()
    assert(n1 <= n0 && n1 > 0)
    // canonical set has globally unique texts
    assert(canon.groupBy($"text").count().filter($"count" > 1).isEmpty)

    // stage 2 — model-based quality filter over the SURVIVORS
    val scored = canon.join(
      Embedding.classifierScores(spark, sfDir), Seq("doc_id"))
    assert(scored.count() == n1, "every survivor must get a score")
    val good = scored.filter($"score" >= 0L).cache()
    val n2 = good.count()
    assert(n2 <= n1 && n2 > 0)

    // stage 3 — per-source domain cap on the quality survivors (q121's
    // admission policy applied to the funnel frame, not the fixture):
    // at most 10 docs per source, best classifier score first
    val capped = good.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"source")
          .orderBy($"score".desc, $"doc_id".asc)))
      .filter($"rk" <= Embedding.DomainCap).drop("rk").cache()
    val n2b = capped.count()
    assert(n2b <= n2 && n2b > 0)
    // the cap admits exactly min(10, survivors) per source — never
    // fewer (the cap must not drop below-cap sources)
    val goodBySrc = good.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    capped.groupBy($"source").count().collect().foreach { r =>
      assert(r.getLong(1) ==
        math.min(Embedding.DomainCap.toLong, goodBySrc(r.getString(0))),
        s"${r.getString(0)}: ${r.getLong(1)} kept of " +
          s"${goodBySrc(r.getString(0))}")
    }

    // stage 4 — per-language nearest-rank length trim on stage-3 output
    // (the q116 histogram-cumsum recipe, applied to the funnel frame)
    val hist = capped.groupBy($"lang", $"n_chars").agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum($"c").over(org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"n_chars")
        .rowsBetween(Long.MinValue, 0)))
    val nl = hist.groupBy($"lang").agg(sum($"c").as("nd"))
    val bounds = cum.join(nl, Seq("lang")).groupBy($"lang", $"nd")
      .agg(min(when($"cum" >= expr("(nd + 19) div 20"), $"n_chars")).as("lo"),
        min(when($"cum" >= expr("(19 * nd + 19) div 20"), $"n_chars")).as("hi"))
    val trimmed = capped.join(broadcast(bounds), Seq("lang"))
      .filter($"n_chars".between($"lo", $"hi")).cache()
    val n3 = trimmed.count()
    assert(n3 <= n2b && n3 > 0)
    // per language, the trim drops at most the two 5% tails
    bounds.collect().foreach { b =>
      val lang = b.getAs[String]("lang")
      val kept = trimmed.filter($"lang" === lang).count()
      val had = b.getAs[Long]("nd")
      assert(kept >= had - 2 * ((had + 19) / 20),
        s"$lang kept $kept of $had — trimmed more than the tails")
    }

    // stage 5 — deterministic shuffle of the final corpus into 4 shards
    // (md5-rank order; a global rank window is fine at spec scale —
    // production uses q102's bucketed histogram-offset decomposition of
    // exactly this permutation): every survivor lands in exactly one
    // shard and shard sizes differ by at most 1
    val sharded = trimmed
      .withColumn("h", md5(concat($"doc_id".cast("string"), lit(":42"))))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"h", $"doc_id")))
      .withColumn("shard", expr(s"cast((rk - 1) * 4 div $n3 as int)"))
    val szs = sharded.groupBy($"shard").count().collect()
      .map(r => r.getAs[Int]("shard") -> r.getAs[Long]("count")).toMap
    assert(szs.keySet == Set(0, 1, 2, 3), szs.toString)
    assert(szs.values.sum == n3)
    assert(szs.values.max - szs.values.min <= 1, szs.toString)
    // determinism: a second derivation bit-matches the assignment
    val again = trimmed
      .withColumn("h", md5(concat($"doc_id".cast("string"), lit(":42"))))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"h", $"doc_id")))
      .withColumn("shard", expr(s"cast((rk - 1) * 4 div $n3 as int)"))
      .select($"doc_id", $"shard")
    assert(sharded.select($"doc_id", $"shard").exceptAll(again).isEmpty)

    // funnel is monotone and every stage was non-vacuous
    assert(n0 >= n1 && n1 >= n2 && n2 >= n2b && n2b >= n3,
      s"funnel $n0 → $n1 → $n2 → $n2b → $n3")
  }
}
