package graft

import graft.sources.{Bucketing, Tables}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Plan-shape regression guards: the properties that make these operators
  * survive a 100× scale-up, asserted on the actual physical plans so a
  * refactor can't silently lose them. */
class PlanQualitySpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q02 dimension chain joins are all broadcast (no SortMergeJoin)") {
    val p = plan("q02_join_inner_dims")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("SortMergeJoin"), p.take(400))
  }

  test("q06 derived-key join is an equi-join, not a nested loop") {
    val p = plan("q06_join_derived_key")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(400))
  }

  test("q38 attribute filter pushes into the parquet scan") {
    val p = plan("q38_bm25_filtered")
    assert(p.contains("PushedFilters: [In(source"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("q24 scan prunes to the referenced columns only") {
    val p = plan("q24_chunk_fixed")
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("doc_id") && read.contains("text"))
    assert(!read.contains("lang") && !read.contains("source"),
      read)
  }

  test("bucketed orders⋈lineitem joins without any shuffle Exchange") {
    val wh = Files.createTempDirectory("graft_bucketed_").toString
    Bucketing.setupOrderLineitem(spark, sfDir, wh, buckets = 4)
    val joined = spark.table("orders_bucketed")
      .join(spark.table("lineitem_bucketed"), "o_orderkey")
      .where(col("o_totalprice") > 0)
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p.take(800))
    // and it still computes the right thing
    val expected = Tables.orders(spark, sfDir).join(
      Tables.lineitem(spark, sfDir),
      col("o_orderkey") === col("l_orderkey")).count()
    assert(joined.count() == expected)
  }
}
