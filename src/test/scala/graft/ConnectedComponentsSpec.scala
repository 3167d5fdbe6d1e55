package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** The clustering loop behind q53, exercised on synthetic graphs its
  * fixture query can't produce: deep chains (pointer jumping must beat
  * the iteration cap) and random graphs (against a union-find oracle). */
class ConnectedComponentsSpec extends SparkSuite {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("a 60-deep chain converges (pointer jumping beats the cap)") {
    val chain = (0L until 59L).map(i => (i, i + 1))
    val labels = cc(chain)
    assert(labels.size == 60)
    assert(labels.values.forall(_ == 0L))
  }

  test("random graphs match a union-find oracle") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 200
      val pairs = Seq.fill(150)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      assert(cc(pairs) == unionFind(pairs.flatMap(p => Seq(p, p.swap))),
        s"trial $trial")
    }
  }

  test("two disjoint triangles stay two clusters") {
    val labels = cc(Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L)))
    assert(labels.filter(_._1 < 10L).values.toSet == Set(1L))
    assert(labels.filter(_._1 >= 10L).values.toSet == Set(10L))
  }
}
