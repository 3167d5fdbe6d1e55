package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Graphs
import graft.sources.Tables

/** The generalized N-iteration PageRank loop (Graphs.pagerank):
  * determinism across partitionings at depth, exact fixed-point early
  * stop, and agreement with q94's hand-unrolled 2-iteration form. */
class GraphsSpec extends SparkSuite {

  import spark.implicits._

  /** q94's edge construction: supplier–part bipartite pairs of
    * lineitem, long-keyed and symmetrized. */
  private def q94Edges: DataFrame = {
    val pairs = Tables.lineitem(spark, sfDir)
      .select($"l_suppkey".cast("long").as("sn"),
        ($"l_partkey" + 100000L).as("pn"))
      .distinct()
    pairs.select($"sn".as("src"), $"pn".as("dst"))
      .union(pairs.select($"pn".as("src"), $"sn".as("dst")))
  }

  test("iteration-10 integer ranks are identical across partitionings") {
    // fixed-point arithmetic: partial sums are associative integers, so
    // two different physical partitionings must agree on every bit
    val (a, itA) = Graphs.pagerank(q94Edges.repartition(3), 10)
    val (b, itB) = Graphs.pagerank(q94Edges.repartition(7), 10)
    assert(itA == itB)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("random symmetric graphs match a driver-side integer reference") {
    // exact fixed-point arithmetic means the distributed loop and a
    // 15-line sequential reference must agree on EVERY BIT — the
    // strongest differential check an iterative kernel can get, on
    // graphs the fixture never produces
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 12 + rnd.nextInt(20)
      val raw = Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).distinct
      val sym = (raw ++ raw.map(_.swap)).distinct
      val (ranksDf, iters) = Graphs.pagerank(sym.toDF("src", "dst"), 4)
      val got = ranksDf.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // sequential reference: same contributions (truncating division —
      // all values positive, so / == div), same damped update
      val deg = sym.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
      var ranks = deg.keys.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val contrib = collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        for ((s, d) <- sym) contrib(d) += ranks(s) / deg(s)
        ranks = contrib.map { case (node, cs) =>
          node -> (150000L + (85L * cs) / 100L) }.toMap
      }
      assert(got == ranks, s"n=$n iters=$iters")
    }
  }

  test("a 2-cycle reaches its exact fixed point and stops early") {
    // 1↔2: each node passes its whole rank across; 150000 + 85% of 10⁶
    // is 10⁶ again, so iteration 1 changes nothing and the probe stops
    // the loop long before the cap
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val (r, it) = Graphs.pagerank(e, 10)
    assert(it < 10)
    assert(r.collect().forall(_.getLong(1) == 1000000L))
  }

  test("two generalized iterations reproduce q94's rank2 top-20") {
    val (r, _) = Graphs.pagerank(q94Edges, 2)
    val top = r.select(
        when($"node" < 100000L, concat(lit("s:"), $"node"))
          .otherwise(concat(lit("p:"), $"node" - 100000L)).as("node"),
        $"r".as("rank2"))
      .orderBy($"rank2".desc, $"node".asc)
      .limit(20)
    val q94 = Graphs.q94Pagerank(spark, sfDir).select($"node", $"rank2")
    assert(top.exceptAll(q94).isEmpty && q94.exceptAll(top).isEmpty)
  }

  test("q94 releases its caches: no persisted-RDD growth across two calls") {
    // a library user composing operators in a long-lived session must not
    // accumulate executor storage; q94 materializes its bounded top-20
    // and unpersists pairs/deg/r1 before returning
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Graphs.q94Pagerank(spark, sfDir).count()
    Graphs.q94Pagerank(spark, sfDir).count()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after == before, s"leaked persisted RDDs: ${after -- before}")
  }

  test("pagerank rejects sink-only nodes loudly instead of dropping them") {
    // node 2 appears only as dst: with out-degree 0 it would silently
    // vanish through the inner joins and the probe could declare a false
    // fixed point over the shrunken node set
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] { Graphs.pagerank(e, 5) }
    assert(ex.getMessage.contains("out-degree"))
  }

  test("q140 bucketed layout reproduces q94 exactly") {
    val a = graft.operators.Graphs.q94Pagerank(spark, sfDir).collect().toSeq
    val b = graft.operators.Graphs.q140PagerankBucketed(spark, sfDir)
      .collect().toSeq
    assert(a.nonEmpty && a == b)
  }
}
