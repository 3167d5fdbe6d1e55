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
}
