package graft

import graft.tools.Checkpoints

/** BlockManager hygiene for the localCheckpoint-using kernels (the
  * BENCH_r10 regression root cause: superseded per-iteration frames were
  * never unpersisted and compounded across the 100-query suite).
  *
  * Contract: a kernel may leave AT MOST the frame(s) backing its lazily
  * returned DataFrame pinned; every superseded loop frame must be
  * released inside the kernel. The harness (Bench/Verify) sweeps the
  * rest between queries once results are consumed — after that sweep,
  * nothing may remain.
  */
class CheckpointHygieneSpec extends SparkSuite {

  private val kernels = Seq(
    "q53_dedup_clusters",   // connected components (per-round frames)
    "q63_dedup_retention",  // CC via the same kernel
    "q94_pagerank",         // per-iteration rank frames
    "q95_bpe_merges",       // periodic vocab checkpoints, driver result
    "q100_semdedup")        // lazily checkpointed vector table

  test("kernels release superseded frames; harness sweep reaches zero") {
    spark.catalog.clearCache()
    Checkpoints.sweep(spark)
    for (q <- kernels) {
      SparkEntry.queries(q)(spark, sfDir).count()
      // loop frames must be gone — only the result's backing frame(s)
      // (≤2: a final label/rank frame, q100's vector table) may remain
      val left = Checkpoints.pinnedCount(spark)
      assert(left <= 2, s"$q left $left RDDs pinned — leak in the loop")
      spark.catalog.clearCache()
      Checkpoints.sweep(spark)
      assert(Checkpoints.pinnedCount(spark) == 0,
        s"$q: sweep did not release everything")
    }
  }
}
