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
    val hist = df.select(col(valueCol).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cb", expr("shiftright(v, 16)"))
    val local = hist.withColumn("lc", sum(col("c")).over(
      Window.partitionBy(col("cb")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val pool = hist.groupBy(col("cb")).agg(sum(col("c")).as("bc"))
      .agg(collect_list(struct(col("cb"), col("bc"))).as("pool"),
        sum(col("bc")).as("n"))
    val cum = local.crossJoin(broadcast(pool))
      .withColumn("cum", col("lc") + expr(
        """aggregate(filter(pool, a -> a.cb < cb),
          |  CAST(0 AS BIGINT), (acc, a) -> acc + a.bc)""".stripMargin))
    val aggs = qs.map { case (name, num, den) =>
      min(when(col("cum") >=
        expr(s"($num * n + ${den - 1}) div $den"), col("v")))
        .as(s"t_$name")
    }
    cum.agg(aggs.head, aggs.tail: _*)
  }
}
