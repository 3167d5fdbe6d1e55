package graft

import graft.functions.{ChunkGenerator, CosineSimilarity, DotProduct, DotProductLong}
import graft.operators.Chunker
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session-extension entry point: registers the engine's native
  * expressions for SQL use, so a cluster deploy needs only
  * `--conf spark.sql.extensions=graft.GraftExtensions` and every session
  * (including Thrift/Connect ones the library never touches
  * programmatically) can call them:
  *
  * {{{
  *   SELECT cosine_sim(a.v, b.v)            -- codegen'd scalar
  *   SELECT dot_product(a.v, b.v)
  *   SELECT text_chunks(text)               -- lateral generator (UDTF)
  *   SELECT text_chunks(text, 512, 64)      -- custom size/overlap
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
    ext.injectOptimizerRule(_ => graft.functions.RewriteHofDotProduct)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"text_chunks $what must be an integer literal, got $other")
  }

  /** The engine's SQL function surface, shared by the build-time
    * extensions path and [[registerAll]]. */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      "cosine_sim(array<double>, array<double>) - cosine similarity",
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))),
    ("dot_product",
      "dot_product(array<double>, array<double>) - dot product",
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
    ("dot_product_long",
      "dot_product_long(array<bigint>, array<bigint>) - exact integer dot",
      (exprs: Seq[Expression]) => DotProductLong(exprs(0), exprs(1))),
    ("text_chunks",
      "text_chunks(text[, chunk_size, overlap]) - recursive character chunks",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(t) =>
          ChunkGenerator(t, Chunker.DefaultChunkSize, Chunker.DefaultOverlap)
        case Seq(t, size, ov) =>
          ChunkGenerator(t, intArg(size, "chunk_size"), intArg(ov, "overlap"))
        case _ => throw new IllegalArgumentException(
          "text_chunks expects 1 or 3 arguments")
      }))

  /** Register on an already-running session (extensions only apply at
    * session build; this is the late-bind path). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
