package graft

import org.apache.spark.sql.functions._

/** The HOF-dot-product rewrite rule: declarative aggregate(zip_with(...))
  * becomes the native dot_product kernel, bit-exactly. */
class RewriteRuleSpec extends SparkSuite {
  import spark.implicits._

  lazy val installed: Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+
        graft.functions.RewriteHofDotProduct
  }

  // parquet-backed so constant folding can't collapse the whole plan
  def vecs = graft.sources.Tables.embeddings(spark, sfDir)
    .select($"vec_id",
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("a"))
    .withColumn("b", reverse($"a"))

  val hof = expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)")

  test("rule substitutes the native kernel in the optimized plan") {
    installed
    val df = vecs.select($"vec_id", hof.as("dot"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("dot_product"), plan)
    assert(!plan.contains("aggregate("), plan)
  }

  test("rewritten result equals the explicit native kernel bit-for-bit") {
    installed
    import graft.functions.VectorFunctions.dot_product
    val viaRule = vecs.select($"vec_id", hof.as("dot"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val native = vecs.select($"vec_id", dot_product($"a", $"b").as("dot"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaRule.nonEmpty)
    assert(viaRule == native)
  }

  test("non-matching folds are left alone") {
    installed
    // sum of squares (single-array transform) must NOT be rewritten
    val df = vecs.select(
      expr("aggregate(transform(a, x -> x * x), 0.0D, (acc, v) -> acc + v)").as("ss"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("dot_product"), plan)
    assert(df.collect().map(_.getDouble(0)).sorted.head > 0)
  }
}
