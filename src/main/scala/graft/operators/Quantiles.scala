package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL nearest-rank quantile thresholds without a global
  * window — the reusable form of the decomposition q102/q107/q116 each
  * hand-rolled: Spark plans an unpartitioned `ORDER BY` window as a
  * single-reducer sort of the whole input (the fence bans it), so the
  * global cumulative count is decomposed instead:
  *
  *   1. value HISTOGRAM (distinct int64 value → count) — corpus-scale
  *      work collapses to |distinct values| rows, map-side combined;
  *   2. order-preserving COARSE BUCKET `v >> 16` (arithmetic shift =
  *      FLOOR division, monotone for negatives too) — the cumsum window
  *      partitions by it, so each partition holds ≤ 65536 distinct
  *      values and sorts locally. Floor, not truncating `div`: `div`
  *      rounds toward zero, so its bucket 0 would span [-65535, 65535]
  *      — 2× the documented bound (advisor r12 find);
  *   3. bucket OFFSETS via the 1-row-broadcast pool + array-HOF prefix
  *      (the q112/q118 bounds pattern; pool size = |coarse buckets|,
  *      bounded by the value RANGE / 2¹⁶, not the corpus);
  *   4. global cum = offset + local cum; threshold_q = min v with
  *      cum ≥ ⌈q·n⌉ (nearest-rank, exact integer arithmetic).
  *
  * Returns a 1-ROW frame of thresholds, meant to be broadcast back.
  * PropertySpec pins it against a driver-side sort over random
  * distributions (negatives, ties, heavy tails). */
object Quantiles {

  /** `qs` = (name, num, den): emits column `t_<name>` = the nearest-rank
    * (num/den)-quantile of `valueCol` (int64-castable). */
  def nearestRank(df: DataFrame, valueCol: String,
      qs: Seq[(String, Int, Int)]): DataFrame = {
    val multi = nearestRankMulti(df, Seq(valueCol), qs)
    multi.select(qs.map { case (name, _, _) =>
      col(s"t_${valueCol}_$name").as(s"t_$name") }: _*)
  }

  /** All of `valueCols`' thresholds in ONE decomposed pass (round 22 —
    * q133 ran the kernel three times, once per RFM dimension, each with
    * its own histogram exchange, cumsum window, pool broadcast and
    * 1-row threshold frame): the metrics ride one exploded
    * (metric, value) histogram, the cumsum window partitions by
    * (metric, coarse-bucket), the single pool carries the metric id in
    * its structs, and one aggregate emits `t_<col>_<name>` for every
    * (col, q) pair. Per-metric thresholds are computed from per-metric
    * filtered pool sums — value-identical to the single-column kernel
    * (PropertySpec pins [[nearestRank]], now a wrapper over this). */
  def nearestRankMulti(df: DataFrame, valueCols: Seq[String],
      qs: Seq[(String, Int, Int)]): DataFrame = {
    val entries = valueCols.zipWithIndex.map { case (c, mi) =>
      struct(lit(mi).as("m"), col(c).cast("long").as("v"))
    }
    val hist = df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.m").as("m"), col("e.v").as("v"))
      .groupBy(col("m"), col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cb", expr("shiftright(v, 16)"))
    val local = hist.withColumn("lc", sum(col("c")).over(
      Window.partitionBy(col("m"), col("cb")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val pool = hist.groupBy(col("m"), col("cb")).agg(sum(col("c")).as("bc"))
      .agg(collect_list(struct(col("m"), col("cb"), col("bc"))).as("pool"))
    val cum = local.crossJoin(broadcast(pool))
      .withColumn("n", expr(
        """aggregate(filter(pool, a -> a.m = m),
          |  CAST(0 AS BIGINT), (acc, a) -> acc + a.bc)""".stripMargin))
      .withColumn("cum", col("lc") + expr(
        """aggregate(filter(pool, a -> a.m = m AND a.cb < cb),
          |  CAST(0 AS BIGINT), (acc, a) -> acc + a.bc)""".stripMargin))
    val aggs = for {
      (c, mi) <- valueCols.zipWithIndex
      (name, num, den) <- qs
    } yield min(when(col("m") === mi && col("cum") >=
      expr(s"($num * n + ${den - 1}) div $den"), col("v")))
      .as(s"t_${c}_$name")
    cum.agg(aggs.head, aggs.tail: _*)
  }
}
