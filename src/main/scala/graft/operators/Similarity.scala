package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions.{cosine_sim, dot_product}
import graft.sources.Tables

/** Approximate-nearest-neighbor similarity search over the embedding
  * column (north-star surface): brute-force cosine top-k as the exact
  * baseline, and a random-hyperplane LSH-bucketed variant as the scale
  * path. Both oracle-checked against DuckDB (the hyperplanes are derived
  * from pure integer arithmetic so every engine computes identical
  * planes).
  *
  * Scale design: brute force is O(Q×N) — fine when Q (the query batch) is
  * small and broadcastable, which is exactly how it's planned here
  * (`broadcast(queries)`, N never shuffles). The LSH variant buckets both
  * sides by signature first, so the candidate join is an equi-join on
  * (bucket) — at 100 TB with 256 buckets the per-bucket product is ~N²/256
  * and each bucket is processed shuffle-locally. Dot products run inside
  * codegen'd higher-order functions (no UDF row boundary).
  */
object Similarity {

  private def emb(s: SparkSession, d: String): DataFrame =
    // the fixture is one small file -> one partition -> pair joins would
    // run single-task; spread rows across the executor slots (a real
    // embeddings table arrives multi-partition and skips this)
    Tables.embeddings(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))

  /** codegen'd native expressions (graft.functions) — identical FP
    * association to the DuckDB oracle's list_sum/list_transform form. */

  /** q34 — brute-force cosine top-k: query batch = vec_id % 50 == 0,
    * top-5 neighbors each (self excluded). */
  def q34CosineTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val q = e.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    val scored = e.join(broadcast(q), $"vec_id" =!= $"q_id")
      .withColumn("cos", cosine_sim($"v", $"qv"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"q_id", $"rank", $"vec_id", round($"cos", 6).as("cos"))
      .orderBy($"q_id", $"rank")
  }

  val q34Oracle: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM n
      |      WHERE vec_id % 50 = 0),
      |scored AS (SELECT q.q_id, n.vec_id,
      |             list_sum(list_transform(generate_series(1, 64),
      |               i -> n.v[i] * q.qv[i])) / (n.nrm * q.qnrm) AS cos
      |           FROM n, q WHERE n.vec_id <> q.q_id),
      |ranked AS (SELECT q_id, vec_id, cos,
      |             row_number() OVER (PARTITION BY q_id
      |               ORDER BY cos DESC, vec_id ASC) AS rank
      |           FROM scored)
      |SELECT q_id, rank, vec_id, round(cos, 6) AS cos
      |FROM ranked WHERE rank <= 5
      |ORDER BY q_id, rank""".stripMargin

  /** Deterministic pseudo-random hyperplane h, pure integer arithmetic →
    * bit-identical across engines:
    * hp(h, j) = ((h*64 + j) * 2654435761 mod 1000003) / 1000003 - 0.5. */
  private def hpExpr(h: Int): String =
    s"transform(sequence(0, 63), j -> (CAST(($h * 64 + j) * 2654435761 % 1000003 AS DOUBLE) / 1000003.0) - 0.5)"

  /** q35 — LSH-bucketed ANN: 8 random-hyperplane sign bits → 256 buckets;
    * neighbors are searched only within the query's bucket (the classic
    * recall/candidate-count trade). Output: top-3 in-bucket neighbors per
    * query vector. */
  def q35CosineLshAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // norms are computed once per vector (sqrt of the self-dot) and
    // reused across every candidate pair; only the dot runs per pair.
    val e = emb(s, dir).withColumn("nrm", sqrt(dot_product($"v", $"v")))
    // all 8 sign bits in ONE projection (no explode, no re-group on an
    // array key): bucket = Σ (dot(v, hp_h) > 0) · 2^h
    val bucketCol = (0 to 7).map(h =>
      when(dot_product($"v", expr(hpExpr(h))) > 0, lit(1L << h))
        .otherwise(0L)).reduce(_ + _)
    val buckets = e.withColumn("bucket", bucketCol)
    val q2 = buckets.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"),
        $"bucket")
    val cands = buckets.join(q2, Seq("bucket"))
      .filter($"vec_id" =!= $"q_id")
      .withColumn("cos", dot_product($"v", $"qv") / ($"nrm" * $"qnrm"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id".asc)
    cands.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"q_id", $"bucket", $"rank", $"vec_id", round($"cos", 6).as("cos"))
      .orderBy($"q_id", $"rank")
  }

  val q35Oracle: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, label, v,
      |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |bits AS (SELECT vec_id,
      |           CASE WHEN list_sum(list_transform(
      |             generate_series(0, 63),
      |             j -> (CAST((h.h * 64 + j) * 2654435761 % 1000003 AS DOUBLE) / 1000003.0 - 0.5)
      |                  * v[j + 1])) > 0
      |             THEN CAST(pow(2, h.h) AS BIGINT) ELSE 0 END AS bit
      |         FROM n, LATERAL (SELECT unnest(generate_series(0, 7)) AS h) h),
      |buckets AS (SELECT n.vec_id, n.v, n.nrm, b.bucket
      |            FROM n JOIN (SELECT vec_id, CAST(sum(bit) AS BIGINT) AS bucket
      |                         FROM bits GROUP BY 1) b
      |              ON n.vec_id = b.vec_id),
      |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, bucket
      |      FROM buckets WHERE vec_id % 50 = 0),
      |cands AS (SELECT q.q_id, c.bucket, c.vec_id,
      |            list_sum(list_transform(generate_series(1, 64),
      |              i -> c.v[i] * q.qv[i])) / (c.nrm * q.qnrm) AS cos
      |          FROM buckets c JOIN q ON c.bucket = q.bucket
      |          WHERE c.vec_id <> q.q_id),
      |ranked AS (SELECT q_id, bucket, vec_id, cos,
      |             row_number() OVER (PARTITION BY q_id
      |               ORDER BY cos DESC, vec_id ASC) AS rank
      |           FROM cands)
      |SELECT q_id, bucket, rank, vec_id, round(cos, 6) AS cos
      |FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin

  /** q42 — same retrieval as q34 but through the custom bounded top-k
    * aggregate (TypedImperativeAggregate) instead of window+row_number:
    * partial aggregation keeps ≤ k pairs per partition, so the shuffle
    * carries k per group per partition rather than all Q×N scored pairs.
    * Oracle identical to q34's (the aggregate uses the same
    * (score desc, id asc) total order). */
  def q42TopKAggregate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TopKFunctions.top_k_by_score
    val e = emb(s, dir)
    val q = e.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    e.join(broadcast(q), $"vec_id" =!= $"q_id")
      .withColumn("cos", cosine_sim($"v", $"qv"))
      .groupBy($"q_id")
      .agg(top_k_by_score($"cos", $"vec_id", 5).as("top"))
      .select($"q_id", posexplode($"top").as(Seq("pos", "t")))
      .select($"q_id", ($"pos" + 1).as("rank"), $"t.id".as("vec_id"),
        round($"t.score", 6).as("cos"))
      .orderBy($"q_id", $"rank")
  }

  /** q42's oracle is q34's logical query — rank desugar of the same
    * top-5-per-query — proving aggregate ≡ window forms. */
  val q42Oracle: String = q34Oracle

  /** q44 — IVF-style ANN (the inverted-file scale path): ~N/40
    * deterministic "centroids" (every 40th vector — a stand-in for
    * k-means centroids that any engine reproduces), every vector assigned
    * to its nearest centroid's cell, queries probe their nprobe=2 nearest
    * cells and rank only those cells' members by exact cosine.
    * At 100 TB: assignment is a broadcast-centroid map pass; the probe
    * join touches ~nprobe/ncells of the corpus instead of all of it. */
  def q44IvfAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).withColumn("nrm", sqrt(dot_product($"v", $"v")))
    val cent = e.filter($"vec_id" % 40 === 0)
      .select($"vec_id".as("c_id"), $"v".as("cv"), $"nrm".as("cnrm"))
    val wAssign = Window.partitionBy($"vec_id")
      .orderBy($"ccos".desc, $"c_id".asc)
    val assigned = e.crossJoin(broadcast(cent))
      .withColumn("ccos", dot_product($"v", $"cv") / ($"nrm" * $"cnrm"))
      .withColumn("rn", row_number().over(wAssign))
      .filter($"rn" === 1)
      .select($"vec_id", $"v", $"nrm", $"c_id".as("cell"))
    val q = e.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val wProbe = Window.partitionBy($"q_id")
      .orderBy($"qcos".desc, $"c_id".asc)
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("qcos", dot_product($"qv", $"cv") / ($"qnrm" * $"cnrm"))
      .withColumn("rn", row_number().over(wProbe))
      .filter($"rn" <= 2)
      .select($"q_id", $"qv", $"qnrm", $"c_id".as("cell"))
    val wRank = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id".asc)
    assigned.join(probes, Seq("cell"))
      .filter($"vec_id" =!= $"q_id")
      .withColumn("cos", dot_product($"v", $"qv") / ($"nrm" * $"qnrm"))
      .withColumn("rank", row_number().over(wRank))
      .filter($"rank" <= 3)
      .select($"q_id", $"rank", $"vec_id", $"cell", round($"cos", 6).as("cos"))
      .orderBy($"q_id", $"rank")
  }

  val q44Oracle: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM n
      |         WHERE vec_id % 40 = 0),
      |assigned AS (SELECT vec_id, v, nrm, c_id AS cell
      |  FROM (SELECT n.vec_id, n.v, n.nrm, c.c_id,
      |          row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |            list_sum(list_transform(generate_series(1, 64),
      |              i -> n.v[i] * c.cv[i])) / (n.nrm * c.cnrm) DESC,
      |            c.c_id ASC) AS rn
      |        FROM n, cent c)
      |  WHERE rn = 1),
      |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM n
      |      WHERE vec_id % 50 = 0),
      |probes AS (SELECT q_id, qv, qnrm, c_id AS cell
      |  FROM (SELECT q.q_id, q.qv, q.qnrm, c.c_id,
      |          row_number() OVER (PARTITION BY q.q_id ORDER BY
      |            list_sum(list_transform(generate_series(1, 64),
      |              i -> q.qv[i] * c.cv[i])) / (q.qnrm * c.cnrm) DESC,
      |            c.c_id ASC) AS rn
      |        FROM q, cent c)
      |  WHERE rn <= 2),
      |cands AS (SELECT p.q_id, a.vec_id, a.cell,
      |            list_sum(list_transform(generate_series(1, 64),
      |              i -> a.v[i] * p.qv[i])) / (a.nrm * p.qnrm) AS cos
      |          FROM assigned a JOIN probes p ON a.cell = p.cell
      |          WHERE a.vec_id <> p.q_id),
      |ranked AS (SELECT q_id, vec_id, cell, cos,
      |             row_number() OVER (PARTITION BY q_id
      |               ORDER BY cos DESC, vec_id ASC) AS rank
      |           FROM cands)
      |SELECT q_id, rank, vec_id, cell, round(cos, 6) AS cos
      |FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin

  /** q65 — int8 embedding quantization: per-vector symmetric scale
    * (127 / max|x|), quantize via floor(x·scale + 0.5) — floor is
    * engine-identical where round() is not (HALF_UP vs HALF_EVEN) — and
    * report the L2 reconstruction error. The storage face of ANN at
    * scale: 64 doubles → 64 bytes (8× smaller shuffle/scan footprint)
    * before the q35/q44 candidate joins. All arithmetic is identical-
    * order HOF folds, so even the error column hash-matches DuckDB. */
  def q65EmbedQuantize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    emb(s, dir)
      .withColumn("mx", array_max(transform($"v", x => abs(x))))
      .filter($"mx" > 0)
      .withColumn("scale", lit(127.0) / $"mx")
      .withColumn("q",
        transform($"v", x => floor(x * $"scale" + lit(0.5)).cast("long")))
      .withColumn("err", expr(
        """aggregate(zip_with(v, q, (x, qi) ->
          |  (x - qi / scale) * (x - qi / scale)),
          |  0D, (acc, e) -> acc + e)""".stripMargin))
      .select($"vec_id", round($"mx", 6).as("mx"),
        element_at($"q", 1).as("q1"), element_at($"q", 2).as("q2"),
        element_at($"q", 3).as("q3"), element_at($"q", 4).as("q4"),
        round($"err", 8).as("err"))
      .orderBy($"vec_id")
  }

  val q65Oracle: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |m AS (SELECT vec_id, v,
      |        list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
      |s AS (SELECT vec_id, v, mx, CAST(127 AS DOUBLE) / mx AS scale
      |      FROM m WHERE mx > 0),
      |q AS (SELECT vec_id, v, mx, scale,
      |        list_transform(v, x ->
      |          CAST(floor(x * scale + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS qv
      |      FROM s)
      |SELECT vec_id, round(mx, 6) AS mx,
      |       qv[1] AS q1, qv[2] AS q2, qv[3] AS q3, qv[4] AS q4,
      |       round(list_sum(list_transform(generate_series(1, 64),
      |         i -> (v[i] - qv[i] / scale) * (v[i] - qv[i] / scale))), 8) AS err
      |FROM q
      |ORDER BY vec_id""".stripMargin

  /** q79 — ANN over int8-quantized vectors: the search face of q65's
    * storage story. Vectors are quantized per-vector (symmetric scale,
    * floor(x·s + 0.5) — the engine-identical rounding), then candidates
    * are ranked by the cosine of the QUANTIZED vectors: dot(qa,qb) /
    * (√dot(qa,qa)·√dot(qb,qb)). The per-vector scales cancel out of the
    * cosine, so the entire ranking key derives from INTEGER dot products
    * (≤ 64·127² ≈ 10⁶, exact in both engines) — no transcendental-
    * function parity risk anywhere in the order. At 100 TB this is the
    * memory-bound win: the candidate side streams 64-byte codes instead
    * of 512-byte doubles (8× less shuffle/scan), and SimilaritySpec
    * measures the recall cost vs exact q34 (≥ 0.9 on the fixture). */
  def q79Int8Ann(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val quant = emb(s, dir)
      .withColumn("mx", array_max(transform($"v", x => abs(x))))
      .filter($"mx" > 0)
      .withColumn("q", transform($"v",
        x => floor(x * (lit(127.0) / $"mx") + lit(0.5)).cast("long")))
      .withColumn("self", expr(
        "aggregate(q, 0L, (acc, x) -> acc + x * x)"))
      .select($"vec_id", $"q", $"self")
    val qs = quant.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"q".as("qq"), $"self".as("qself"))
    val scored = quant.join(broadcast(qs), $"vec_id" =!= $"q_id")
      .withColumn("dot", expr(
        "aggregate(zip_with(q, qq, (x, y) -> x * y), 0L, (acc, e) -> acc + e)"))
      .withColumn("acos",
        $"dot" / (sqrt($"self".cast("double")) * sqrt($"qself".cast("double"))))
    val w = Window.partitionBy($"q_id").orderBy($"acos".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"q_id", $"rank", $"vec_id", round($"acos", 6).as("acos"))
      .orderBy($"q_id", $"rank")
  }

  val q79Oracle: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |m AS (SELECT vec_id, v,
      |        list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
      |q AS (SELECT vec_id,
      |        list_transform(v, x -> CAST(floor(
      |          x * (CAST(127 AS DOUBLE) / mx) + CAST(0.5 AS DOUBLE))
      |          AS BIGINT)) AS q
      |      FROM m WHERE mx > 0),
      |sf AS (SELECT vec_id, q,
      |         list_sum(list_transform(q, x -> x * x)) AS self FROM q),
      |qs AS (SELECT vec_id AS q_id, q AS qq, self AS qself FROM sf
      |       WHERE vec_id % 50 = 0),
      |scored AS (SELECT qs.q_id, sf.vec_id,
      |             CAST(list_sum(list_transform(generate_series(1, 64),
      |               i -> sf.q[i] * qs.qq[i])) AS DOUBLE)
      |               / (sqrt(CAST(sf.self AS DOUBLE))
      |                  * sqrt(CAST(qs.qself AS DOUBLE))) AS acos
      |           FROM sf, qs WHERE sf.vec_id <> qs.q_id),
      |ranked AS (SELECT q_id, vec_id, acos,
      |             row_number() OVER (PARTITION BY q_id
      |               ORDER BY acos DESC, vec_id ASC) AS rank
      |           FROM scored)
      |SELECT q_id, rank, vec_id, round(acos, 6) AS acos
      |FROM ranked WHERE rank <= 5
      |ORDER BY q_id, rank""".stripMargin

  /** q80 — metadata-filtered ANN (the vector-DB "filtered search"
    * surface: neighbors constrained to the query's tenant/class): top-3
    * cosine neighbors sharing the query's label. The constraint is
    * composed INTO candidate generation as an equi-join on label — the
    * candidate set shrinks ~|label|-fold before any dot product runs and
    * the join is an ordinary hash join on the label key — rather than
    * post-filtering a label-blind top-k (which can return FEWER than k
    * valid neighbors, the classic filtered-ANN correctness bug). At
    * 100 TB this is the partition-pruning form: a corpus bucketed by
    * label turns the equi-join into a co-located per-bucket search. */
  def q80FilteredAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).withColumn("nrm", sqrt(dot_product($"v", $"v")))
    val q = e.filter($"vec_id" % 50 === 0)
      .select($"label", $"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val cands = e.join(broadcast(q), Seq("label"))
      .filter($"vec_id" =!= $"q_id")
      .withColumn("cos", dot_product($"v", $"qv") / ($"nrm" * $"qnrm"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id".asc)
    cands.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"q_id", $"label", $"rank", $"vec_id", round($"cos", 6).as("cos"))
      .orderBy($"q_id", $"rank")
  }

  val q80Oracle: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, label, v,
      |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |q AS (SELECT label, vec_id AS q_id, v AS qv, nrm AS qnrm FROM n
      |      WHERE vec_id % 50 = 0),
      |scored AS (SELECT q.q_id, q.label, n.vec_id,
      |             list_sum(list_transform(generate_series(1, 64),
      |               i -> n.v[i] * q.qv[i])) / (n.nrm * q.qnrm) AS cos
      |           FROM n JOIN q ON n.label = q.label
      |           WHERE n.vec_id <> q.q_id),
      |ranked AS (SELECT q_id, label, vec_id, cos,
      |             row_number() OVER (PARTITION BY q_id
      |               ORDER BY cos DESC, vec_id ASC) AS rank
      |           FROM scored)
      |SELECT q_id, label, rank, vec_id, round(cos, 6) AS cos
      |FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_filtered_ann" -> q80FilteredAnn _,
    "q79_int8_ann" -> q79Int8Ann _,
    "q65_embed_quantize" -> q65EmbedQuantize _,
    "q44_sim_ivf_ann" -> q44IvfAnn _,
    "q34_sim_cosine_topk" -> q34CosineTopK _,
    "q35_sim_lsh_ann" -> q35CosineLshAnn _,
    "q42_sim_topk_aggregate" -> q42TopKAggregate _)

  val oracle: Map[String, String] = Map(
    "q80_filtered_ann" -> q80Oracle,
    "q79_int8_ann" -> q79Oracle,
    "q65_embed_quantize" -> q65Oracle,
    "q44_sim_ivf_ann" -> q44Oracle,
    "q34_sim_cosine_topk" -> q34Oracle,
    "q35_sim_lsh_ann" -> q35Oracle,
    "q42_sim_topk_aggregate" -> q42Oracle)
}
