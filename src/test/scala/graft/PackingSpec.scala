package graft

import graft.operators.TextStats

/** Invariants of the greedy shard packer (q61) beyond the value-level
  * oracle: capacity respected except for oversized singletons, and shard
  * ids dense from 0 per language. */
class PackingSpec extends SparkSuite {

  private lazy val packed =
    TextStats.queries("q61_pack_shards")(spark, sfDir).collect()

  test("no shard exceeds the cap unless it is a single oversized doc") {
    val rows = packed
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, sumTok) = (r.getLong(2), r.getLong(3))
      assert(sumTok <= 4000L || nDocs == 1L,
        s"overfull shard: lang=${r.getString(0)} shard=${r.getLong(1)} " +
          s"docs=$nDocs tokens=$sumTok")
    }
  }

  test("shard ids are dense from 0 within each language") {
    val byLang = packed.groupBy(_.getString(0))
    byLang.foreach { case (lang, rows) =>
      val shards = rows.map(_.getLong(1)).sorted.toSeq
      assert(shards == (0L until shards.length.toLong),
        s"non-dense shards for $lang: $shards")
    }
  }
}
