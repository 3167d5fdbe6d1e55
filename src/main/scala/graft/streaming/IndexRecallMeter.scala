package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q165's recall/cost meter applied to MAINTAINED index state — the
  * round-17 verdict's missing measurement: the streamed indexes
  * ([[IvfIndexStream]], [[PqIndexStream]]) claim ≡-batch state, but
  * their recall after N incremental batches — with pinned-seed drift,
  * BEFORE a rebuild — was unmeasured. This meter reads both state
  * pointers and produces exactly q165's six-row table (nprobe 1/2/4 ×
  * {membership ceiling, adc}) over the STREAMED centroids, cells,
  * codebooks and codes, through the same one-copy kernels
  * ([[Similarity.ivfProbeRanks]] / [[Similarity.pqQueryTables]] /
  * [[Similarity.pqAdcDistance]]) and the same exact integer-L2 ground
  * truth — so its output is DIRECTLY comparable row-for-row with batch
  * q165: after [[IvfIndexStream.rebuild]] + [[PqIndexStream.rebuild]]
  * on a fully-arrived corpus the meter must equal q165 exactly
  * (StreamRecallSpec pins it), and before the rebuild the delta
  * between the two tables is the measured price of the drift the
  * rebuild signals already count (missing centroid seeds, parked or
  * stale-model codes).
  *
  * Scale shape: identical to q165 — one cached candidate pass serves
  * all nested probe depths; the exact ground-truth pass is the
  * explicitly fenced per-tuning-run cost, not a serving path. Like
  * q165, every intermediate cache is released before returning. */
object IndexRecallMeter {

  def meter(spark: SparkSession, ivfStateDir: String,
      pqStateDir: String): DataFrame = {
    val (cent, assign0) = IvfIndexStream.readState(spark, ivfStateDir)
    val (books, codes0, _) = PqIndexStream.readState(spark, pqStateDir)
    require(books.nonEmpty, s"pq index '$pqStateDir' has no trained model")
    val m = Similarity.PqModel.fromRows(books)
    val bCent = Similarity.boundedBroadcast(cent, "recall meter centroid")

    val e = assign0.filter(col("cell") >= 0)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
      .cache() // queries, cell sizes, corpus count
    val qv = codes0.filter(col("c0") >= 0)
      .select(col("vec_id"), col("q"), col("c0"), col("c1"), col("c2"),
        col("c3"))
      .cache() // query tables, ADC side, exact ground truth
    try {
      val cells = e.select(col("vec_id"), col("cell"))
      val cellSizes = cells.groupBy(col("cell")).agg(count(lit(1)).as("csz"))
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qnrm"))
      val pr = Similarity.ivfProbeRanks(q, bCent, nprobe = 4).cache()
      val codes = qv
        .select(col("vec_id"), col("c0"), col("c1"), col("c2"), col("c3"))
        .join(cells, Seq("vec_id"))
      val qTabs = Similarity.pqQueryTables(
        qv.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("q")), m)
      val cand = codes
        .join(Similarity.boundedBroadcast(pr.join(qTabs, Seq("q_id")),
          "recall meter probe"), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("adist", Similarity.pqAdcDistance)
        .select(col("q_id"), col("vec_id"), col("pr"), col("adist"))
        .cache()
      def adcTopAt(p: Int): DataFrame = {
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("adist").asc, col("vec_id").asc)
        cand.filter(col("pr") <= p)
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select(col("q_id"), col("vec_id"), lit(p).as("np"))
      }
      val adcTop = adcTopAt(1).union(adcTopAt(2)).union(adcTopAt(4))
      val qs = qv.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("q").as("qq"))
      val wTrue = Window.partitionBy(col("q_id"))
        .orderBy(col("d").asc, col("vec_id").asc)
      val exact = qv
        .join(Similarity.boundedBroadcast(qs, "recall meter query"),
          col("vec_id") =!= col("q_id"))
        .withColumn("d", expr(
          """aggregate(zip_with(q, qq, (a, b) -> (a - b) * (a - b)),
            |  0L, (acc, x) -> acc + x)""".stripMargin))
        .withColumn("rnk", row_number().over(wTrue))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("vec_id"))
        .cache()
      val memHits = exact.join(cells, Seq("vec_id"))
        .join(pr, Seq("q_id", "cell"), "left")
        .agg(sum(when(col("pr") <= 1, 1L).otherwise(0L)).as("m1"),
          sum(when(col("pr") <= 2, 1L).otherwise(0L)).as("m2"),
          sum(when(col("pr") <= 4, 1L).otherwise(0L)).as("m4"),
          countDistinct(col("q_id")).as("nq"))
      val adcHits = exact.join(adcTop, Seq("q_id", "vec_id"))
        .agg(coalesce(sum(when(col("np") === 1, 1L).otherwise(0L)), lit(0L))
          .as("a1"),
          coalesce(sum(when(col("np") === 2, 1L).otherwise(0L)), lit(0L))
            .as("a2"),
          coalesce(sum(when(col("np") === 4, 1L).otherwise(0L)), lit(0L))
            .as("a4"))
      val scanned = pr.join(cellSizes, Seq("cell"))
        .agg(sum(when(col("pr") <= 1, col("csz")).otherwise(0L)).as("s1"),
          sum(when(col("pr") <= 2, col("csz")).otherwise(0L)).as("s2"),
          sum(when(col("pr") <= 4, col("csz")).otherwise(0L)).as("s4"))
      val nTot = e.agg(count(lit(1)).as("nvec"))
      val result = memHits.crossJoin(adcHits).crossJoin(scanned)
        .crossJoin(nTot)
        .selectExpr(
          "stack(6," +
            " 1, 'membership', m1, s1, 1, 'adc', a1, s1," +
            " 2, 'membership', m2, s2, 2, 'adc', a2, s2," +
            " 4, 'membership', m4, s4, 4, 'adc', a4, s4)" +
            " AS (nprobe, variant, n_hits, n_scanned)",
          "nq", "nvec")
        .select(col("nprobe").cast("int").as("nprobe"), col("variant"),
          col("nq"), col("n_hits"), col("n_scanned"),
          round(col("n_hits") / (col("nq") * lit(5L)).cast("double"), 6)
            .as("recall_at_5"),
          round(col("n_scanned") / (col("nq") * col("nvec")).cast("double"), 6)
            .as("scanned_frac"))
        .orderBy(col("nprobe"), col("variant"))
      try graft.tools.Checkpoints.tracked(result)._1
      finally Seq(pr, cand, exact).foreach(_.unpersist(blocking = false))
    } finally Seq(e, qv).foreach(_.unpersist(blocking = false))
  }
}
