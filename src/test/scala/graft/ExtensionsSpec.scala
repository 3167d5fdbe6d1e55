package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration via spark.sql.extensions=graft.GraftExtensions:
  * the deploy path for clusters where the library is only on the classpath. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    // extensions apply only at session build, and under sbt test another
    // suite usually built the session first — use the late-bind path
    // (same builders the spark.sql.extensions deploy path injects)
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("ExtensionsSpec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.registerAll(s)
    s
  }

  test("cosine_sim and dot_product usable from SQL") {
    val r = spark.sql(
      """SELECT round(cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS c,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d"""
        .stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
  }

  test("dot_product_long: exact integer dot, codegen ≡ interpreted ≡ HOF") {
    val r = spark.sql(
      """SELECT dot_product_long(array(1000000L, -2L), array(3L, 4000000L)) AS d,
        |       aggregate(zip_with(array(1000000L, -2L), array(3L, 4000000L),
        |         (x, y) -> x * y), 0L, (acc, x) -> acc + x) AS hof"""
        .stripMargin).head()
    assert(r.getLong(0) == 3000000L - 8000000L)
    assert(r.getLong(0) == r.getLong(1))
    // wrong element type is a clear analysis error, not a wrong answer
    val e = intercept[Exception](
      spark.sql("SELECT dot_product_long(array(1.0d), array(2.0d))").collect())
    assert(e.getMessage.contains("array<bigint>"))
  }

  test("text_chunks generates lateral chunk rows from SQL") {
    val rows = spark.sql(
      "SELECT text_chunks('aaaa bbbb cccc dddd', 10, 4)").collect()
    assert(rows.length > 1)
    assert(rows.forall(_.getString(1).length <= 10))
    assert(rows.map(_.getInt(0)).toSeq == rows.indices)
  }

  test("bad arity gives a clear error") {
    val e = intercept[Exception](
      spark.sql("SELECT text_chunks('x', 10)").collect())
    assert(e.getMessage.contains("1 or 3"))
  }
}
