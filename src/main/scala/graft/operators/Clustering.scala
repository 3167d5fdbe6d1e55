package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Embedding-space clustering — the semantic-dedup / diversity-sampling
  * primitive (SemDeDup, arXiv:2303.09540, clusters embeddings then
  * prunes within clusters; data-mixing recipes cluster to balance
  * topics). One operator: fixed-point QUANTIZED k-means, engineered so
  * every arithmetic step is exact integer math (or a deterministic
  * double division of two integers) and therefore bit-identical across
  * engines — the same trick that makes distributed training-data
  * pipelines reproducible across cluster sizes: centroid accumulation
  * in integers is associative/commutative, so partial aggregation
  * order can't change the result (a float centroid mean would differ
  * run-to-run with partition order).
  *
  * Scale shape: assignment is a JOIN-FREE projection against centroid
  * literals (k·64 longs of driver-held model state, the MLlib k-means
  * pattern — the vectors never shuffle, never fan out); the update
  * step shuffles one (cluster, dim) integer partial sum per input
  * partition after map-side combine — k·64 rows total, independent of
  * corpus size. Lloyd iterations compose by repeating the two stages;
  * two iterations here keep the cross-engine oracle tractable while
  * exercising the full assign→update→reassign cycle.
  */
object Clustering {

  private val K = 8
  private val Scale = 1000.0

  /** q86 — quantized k-means, two Lloyd iterations over the 64-dim
    * embedding fixture. Embeddings quantize to integers via
    * floor(e·1000) (floor, not round: round's tie behavior differs
    * across engines; floor is unambiguous). Initial centroids are the
    * quantized vectors of the K smallest vec_ids (deterministic,
    * engine-independent init — the standard reproducibility trick when
    * k-means++ randomness can't be replayed cross-engine).
    *
    * Iteration-2 distance to a mean centroid (sum_d/cnt per dim) is
    * computed as Σ(v·cnt − sum_d)²/cnt² — numerator pure int64
    * (|v|·cnt ≤ 5·10⁵ at fixture scale, squared 2.5·10¹¹, ×64 dims
    * ≈ 10¹³ ≪ 2⁶³), so the only float op is one division of two exact
    * integers, which IEEE 754 makes identical everywhere. (The integer
    * numerator exists for cross-engine oracle parity; it overflows past
    * cnt ≈ 10⁷ members — a production run at that scale would switch to
    * double mean centroids, keeping determinism per-row because each
    * 64-dim reduction is an ORDERED fold, and losing only the
    * cross-engine bit-equality this gate needs.) Ties broken
    * by centroid id. Output: per-cluster membership after each
    * iteration plus how many members arrived from a different
    * iteration-1 cluster. */
  def q86KmeansQuantized(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions.dot_product_long
    // self-dot attached once: every per-centroid distance below is then
    // self + Σc² − 2·dot with ONE codegen'd primitive loop instead of an
    // interpreted aggregate(zip_with(...)) HOF — identical int64s by the
    // binomial identity in exact integer arithmetic (round 21, guide §4)
    val qv = Tables.embeddings(s, dir)
      .select($"vec_id",
        expr("transform(embedding, e -> CAST(floor(e * 1000.0) AS BIGINT))")
          .as("q"))
      .withColumn("self", dot_product_long($"q", $"q"))

    // Assignment is a PURE PROJECTION against centroid literals — the
    // MLlib k-means shape: model state (k·64 longs) lives on the driver
    // between iterations, vectors never shuffle, join-free plan
    // (PlanQualitySpec pins zero Join nodes). argmin via array_min over
    // (distance, cid) structs: struct ordering compares d first, cid
    // breaks ties.
    def argmin(dists: Seq[(Int, Column)]): Column =
      array_min(array(dists.map { case (cid, d) =>
        struct(d.as("d"), lit(cid).as("cid")) }: _*)).getField("cid")
    def sqDist(c: Seq[Long]): Column =
      $"self" + lit(c.iterator.map(x => x * x).sum) -
        lit(2L) * dot_product_long($"q", typedLit(c))

    val c0: Seq[(Int, Seq[Long])] = qv.filter($"vec_id" < K)
      .select($"vec_id", $"q").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Long](1)))
      .sortBy(_._1).toSeq
    val assign1 = qv.withColumn("cid1",
      argmin(c0.map { case (cid, c) => cid -> sqDist(c) }))

    // update step: the ONLY corpus-sized reduction — k×64 integer
    // partial sums per partition cross the wire, nothing else
    val cent1: Seq[(Int, Long, Seq[Long])] = assign1
      .select($"cid1", posexplode($"q").as(Seq("dim", "v")))
      .groupBy($"cid1", $"dim")
      .agg(sum($"v").as("sv"), count(lit(1)).as("cnt"))
      .collect()
      .groupBy(_.getAs[Int]("cid1")).toSeq
      .map { case (cid, rows) =>
        (cid, rows.head.getAs[Long]("cnt"),
          rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Long]("sv")).toSeq)
      }.sortBy(_._1)

    // iteration-2 distance to the mean centroid (sv/cnt per dim) in the
    // integer-numerator form Σ(v·cnt − sv)²/cnt²: exact int64 numerator,
    // one deterministic double division. Expanded to cnt²·Σv² −
    // 2cnt·Σ(v·sv) + Σsv² (the same exact int64 by the binomial
    // identity; same documented overflow domain) so the per-row term is
    // one codegen'd dot instead of an interpreted HOF (round 21)
    def sqDist2(sv: Seq[Long], cnt: Long): Column =
      ($"self" * lit(cnt * cnt) -
        lit(2L * cnt) * dot_product_long($"q", typedLit(sv)) +
        lit(sv.iterator.map(x => x * x).sum))
        .cast("double") / lit(cnt * cnt)

    val assign2 = assign1.withColumn("cid2",
      argmin(cent1.map { case (cid, cnt, sv) => cid -> sqDist2(sv, cnt) }))

    // join-free rollup: tag each assignment row once per iteration and
    // sum — keeps the WHOLE query plan free of Join nodes (pinned)
    assign2.select($"cid1".as("cid"), lit(1L).as("i1"), lit(0L).as("i2"),
        lit(0L).as("mv"))
      .union(assign2.select($"cid2".as("cid"), lit(0L), lit(1L),
        when($"cid1" =!= $"cid2", 1L).otherwise(0L)))
      .groupBy($"cid")
      .agg(sum($"i1").as("n_iter1"), sum($"i2").as("n_iter2"),
        sum($"mv").as("n_moved_in"))
      .orderBy($"cid")
  }

  /** q100 — SemDeDup (Abbas et al., arXiv:2303.09540) composed end-to-end
    * from in-engine parts: q98's hashed embeddings → q86-style quantized
    * k-means (assign → integer-mean update → reassign) → WITHIN-CLUSTER
    * cosine near-dup pruning with q40's dot kernel. A doc is pruned when
    * a smaller-id doc in the SAME final cluster has quantized cosine
    * ≥ 0.9 (vectors are L2-normalized ×10⁶, so cosine is the exact
    * integer dot against a 9·10¹¹ threshold — no float drift anywhere:
    * components ≤10⁶ in magnitude, dot ≤ 64·10¹² ≪ 2⁶³).
    *
    * Scale shape — the whole point of SemDeDup: pair generation is an
    * EQUI-join on the cluster id (plus doc_id< as a post-filter), never a
    * global cross product (PlanQualitySpec pins no
    * CartesianProduct/NestedLoop in the plan). At fixture scale k=8 cuts
    * the pair space 5.6× (22,456 vs 124,750); production sets k ∝ corpus
    * size so clusters stay bounded and the join stays shuffle-local.
    * Cross-cluster near-dups are deliberately NOT found — the paper's
    * documented approximation (here 53 of 111 global ≥0.9 pairs fall
    * within-cluster). Driver state is bounded by construction: the k·64
    * seed components and k·64 centroid sums (k=8).
    *
    * Centroid means are TRUNCATED integer division (sum div count):
    * Scala `Long./`, Spark `div`, and DuckDB `//` all truncate toward
    * zero, so the iteration-2 centroids are bit-identical across all
    * three engines — and distances stay pure int64 (diff ≤2·10⁶,
    * squared ×64 ≈ 2.6·10¹⁴), avoiding q86's float-division step
    * entirely. */
  def q100SemDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val Tau = 900000000000L // 0.9 × (10⁶)² — quantized-cosine threshold
    // ONE pass of the gram-explode embed pipeline fills this cache; the
    // seed collect, the Lloyd-update collect, and the final vector
    // materialization all read it (uncached, each of those re-ran the
    // whole embed — ~4× the corpus-sized work per execution; at 100 TB
    // this cache is the standard "persist the feature table before
    // clustering" step, #docs × 64 longs). The harness sweep releases it
    // once the query's result is consumed.
    val vecs0 = Embedding.hashedComponents(s, dir)
      .select($"doc_id", $"bucket", $"qv")
      .groupBy($"doc_id")
      .agg(transform(array_sort(collect_list(struct($"bucket", $"qv"))),
        p => p.getField("qv")).as("q"))
      .cache()

    def argmin(dists: Seq[(Int, Column)]): Column =
      array_min(array(dists.map { case (cid, d) =>
        struct(d.as("d"), lit(cid).as("cid")) }: _*)).getField("cid")
    // self + Σc² − 2·dot against centroid literals — identical int64s to
    // the aggregate(zip_with(...)) it replaces, one codegen'd loop per
    // (row, centroid) (round 21; the q86 rewrite, same identity)
    import graft.functions.VectorFunctions.dot_product_long
    def sqDist(c: Seq[Long]): Column =
      $"self" + lit(c.iterator.map(x => x * x).sum) -
        lit(2L) * dot_product_long($"q", typedLit(c))

    // seeds: the K smallest doc_ids' vectors (deterministic init; K·64
    // longs of driver-held model state — the q86 pattern)
    val c0: Seq[(Int, Seq[Long])] = vecs0.filter($"doc_id" < K).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Long](1)))
      .sortBy(_._1).toSeq
    val assign1 = vecs0
      .withColumn("self", dot_product_long($"q", $"q"))
      .withColumn("cid1",
        argmin(c0.map { case (cid, c) => cid -> sqDist(c) }))

    // Lloyd update: k×64 integer partial sums after map-side combine —
    // the only corpus-sized reduction; mean = truncated integer division.
    // posexplode over the cached vector table (q[i] IS bucket i — the
    // grid densified all 64 buckets before the sort) replaces the old
    // join back against the raw component stream, so no second embed
    // pass and no join at all.
    val c1: Seq[(Int, Seq[Long])] = assign1
      .select($"cid1", posexplode($"q").as(Seq("bucket", "qv")))
      .groupBy($"cid1", $"bucket")
      .agg(sum($"qv").as("sv"), count(lit(1)).as("cnt"))
      .collect()
      .groupBy(_.getAs[Int]("cid1")).toSeq
      .map { case (cid, rows) =>
        (cid, rows.sortBy(_.getAs[Int]("bucket"))
          .map(r => r.getAs[Long]("sv") / r.getAs[Long]("cnt")).toSeq)
      }.sortBy(_._1)
    // materialize once: the self-join below would otherwise recompute the
    // whole embed→assign chain on BOTH pair sides plus the output side
    // (3× — visible in the pre-checkpoint plan); at 100 TB this is the
    // "persist the vectors before pairing" step every SemDeDup run does.
    // localCheckpoint (distributed, per-executor blocks — not driver
    // state) also cuts the argmin-literal lineage. LAZY so that
    // plan-only inspection (PlanAudit sweep) stays free of corpus-sized
    // construction-time jobs; the first real action materializes it once.
    val vecs = assign1.withColumn("cid",
        argmin(c1.map { case (cid, cv) => cid -> sqDist(cv) }))
      .select($"doc_id", $"cid", $"q")
      .localCheckpoint(eager = false)

    // within-cluster pairs ONLY: equi-join on cid, doc_id< as the
    // dedup-direction filter; exact integer dot = quantized cosine
    val b = vecs.select($"doc_id".as("doc_b"), $"cid".as("cid_b"),
      $"q".as("qb"))
    // codegen'd exact-integer dot (DotProductLong) — the interpreted
    // aggregate(zip_with(...)) pair would keep the O(pairs×64) hot loop
    // out of whole-stage codegen
    val dups = vecs.join(b, $"cid" === $"cid_b" && $"doc_id" < $"doc_b")
      .select($"doc_b",
        graft.functions.VectorFunctions.dot_product_long($"q", $"qb")
          .as("dot"))
      .filter($"dot" >= Tau)
      .groupBy($"doc_b").agg(count(lit(1)).as("n"))
    vecs.join(dups, $"doc_id" === $"doc_b", "left")
      .select($"doc_id", $"cid",
        coalesce($"n", lit(0L)).as("n_dups"),
        when($"n".isNull, 1).otherwise(0).as("kept"))
      .orderBy($"doc_id")
  }

  val q100Oracle: String =
    """WITH toks AS (SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
      |              FROM documents),
      |w AS (SELECT doc_id,
      |        CAST('0x' || substr(h, 1, 2) AS INT) % 64 AS bucket,
      |        CAST(sum(CASE WHEN substr(h, 3, 1)
      |                        IN ('8','9','a','b','c','d','e','f')
      |                      THEN 1 ELSE -1 END) AS BIGINT) AS w
      |      FROM toks GROUP BY 1, 2),
      |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
      |grid AS (SELECT d.doc_id, g.bucket
      |         FROM documents d,
      |              LATERAL (SELECT unnest(generate_series(0, 63))
      |                       AS bucket) g),
      |qc AS (SELECT grid.doc_id, grid.bucket,
      |        CASE WHEN nrm.nrm = 0 THEN 0
      |             ELSE CAST(round(COALESCE(w.w, 0) * 1000000.0 / nrm.nrm, 0)
      |                       AS BIGINT) END AS qv
      |      FROM grid
      |      LEFT JOIN w ON grid.doc_id = w.doc_id AND grid.bucket = w.bucket
      |      JOIN nrm ON grid.doc_id = nrm.doc_id),
      |c0 AS (SELECT CAST(doc_id AS INT) AS cid, bucket, qv AS cv
      |       FROM qc WHERE doc_id < 8),
      |d1 AS (SELECT qc.doc_id, c0.cid,
      |         sum((qc.qv - c0.cv) * (qc.qv - c0.cv)) AS d
      |       FROM qc JOIN c0 USING (bucket) GROUP BY 1, 2),
      |a1 AS (SELECT doc_id, cid AS cid1 FROM (
      |         SELECT doc_id, cid,
      |           row_number() OVER (PARTITION BY doc_id ORDER BY d, cid) AS rn
      |         FROM d1) WHERE rn = 1),
      |c1 AS (SELECT a1.cid1 AS cid, qc.bucket,
      |         CAST(sum(qc.qv) // count(*) AS BIGINT) AS cv
      |       FROM qc JOIN a1 USING (doc_id) GROUP BY 1, 2),
      |d2 AS (SELECT qc.doc_id, c1.cid,
      |         sum((qc.qv - c1.cv) * (qc.qv - c1.cv)) AS d
      |       FROM qc JOIN c1 USING (bucket) GROUP BY 1, 2),
      |a2 AS (SELECT doc_id, cid AS cid2 FROM (
      |         SELECT doc_id, cid,
      |           row_number() OVER (PARTITION BY doc_id ORDER BY d, cid) AS rn
      |         FROM d2) WHERE rn = 1),
      |vecs AS (SELECT qc.doc_id, a2.cid2 AS cid,
      |           list(qc.qv ORDER BY qc.bucket) AS q
      |         FROM qc JOIN a2 USING (doc_id) GROUP BY 1, 2),
      |pairs AS (SELECT b.doc_id AS doc_b,
      |            list_sum(list_transform(generate_series(1, 64),
      |              i -> a.q[i] * b.q[i])) AS dot
      |          FROM vecs a JOIN vecs b
      |            ON a.cid = b.cid AND a.doc_id < b.doc_id),
      |dups AS (SELECT doc_b AS doc_id, count(*) AS n FROM pairs
      |         WHERE dot >= 900000000000 GROUP BY 1)
      |SELECT v.doc_id, v.cid,
      |       CAST(coalesce(d.n, 0) AS BIGINT) AS n_dups,
      |       CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END AS kept
      |FROM vecs v LEFT JOIN dups d ON v.doc_id = d.doc_id
      |ORDER BY v.doc_id""".stripMargin

  val q86Oracle: String =
    """WITH qv AS (SELECT vec_id,
      |              list_transform(embedding,
      |                e -> CAST(floor(e * 1000.0) AS BIGINT)) AS q
      |            FROM embeddings),
      |dims AS (SELECT unnest(generate_series(1, 64)) AS dim),
      |vd AS (SELECT vec_id, dim, q[dim] AS v FROM qv, dims),
      |c0 AS (SELECT CAST(vec_id AS INT) AS cid, dim, q[dim] AS cv
      |       FROM qv, dims WHERE vec_id < 8),
      |d1 AS (SELECT vd.vec_id, c0.cid,
      |         sum((vd.v - c0.cv) * (vd.v - c0.cv)) AS d
      |       FROM vd JOIN c0 USING (dim) GROUP BY 1, 2),
      |a1 AS (SELECT vec_id, cid AS cid1 FROM (
      |         SELECT vec_id, cid,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      |         FROM d1) WHERE rn = 1),
      |c1 AS (SELECT a1.cid1 AS cid, vd.dim,
      |         sum(vd.v) AS sv, count(*) AS cnt
      |       FROM vd JOIN a1 USING (vec_id) GROUP BY 1, 2),
      |d2 AS (SELECT vd.vec_id, a1.cid1, c1.cid,
      |         CAST(sum((vd.v * c1.cnt - c1.sv) * (vd.v * c1.cnt - c1.sv))
      |              AS DOUBLE) / (max(c1.cnt) * max(c1.cnt)) AS d
      |       FROM vd JOIN a1 USING (vec_id) JOIN c1 USING (dim)
      |       GROUP BY 1, 2, 3),
      |a2 AS (SELECT vec_id, cid1, cid AS cid2 FROM (
      |         SELECT vec_id, cid1, cid,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      |         FROM d2) WHERE rn = 1),
      |n1 AS (SELECT cid1 AS cid, count(*) AS n_iter1 FROM a1 GROUP BY 1),
      |n2 AS (SELECT cid2 AS cid, count(*) AS n_iter2,
      |         sum(CASE WHEN cid1 <> cid2 THEN 1 ELSE 0 END) AS n_moved_in
      |       FROM a2 GROUP BY 1)
      |SELECT coalesce(n1.cid, n2.cid) AS cid,
      |       CAST(coalesce(n1.n_iter1, 0) AS BIGINT) AS n_iter1,
      |       CAST(coalesce(n2.n_iter2, 0) AS BIGINT) AS n_iter2,
      |       CAST(coalesce(n2.n_moved_in, 0) AS BIGINT) AS n_moved_in
      |FROM n1 FULL OUTER JOIN n2 ON n1.cid = n2.cid
      |ORDER BY cid""".stripMargin

  // ------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q86_kmeans_quantized" -> q86KmeansQuantized _,
    "q100_semdedup" -> q100SemDedup _)

  val oracle: Map[String, String] = Map(
    "q86_kmeans_quantized" -> q86Oracle,
    "q100_semdedup" -> q100Oracle)
}
