package graft

import graft.sources.Tables
import graft.tools.ConfGuard

/** The stat-derived shuffle-sizing contract for expansion kernels
  * (pair/CC family): width grows with input bytes once grouped state
  * would outrun the heap budget, floors at the core count (fixture
  * corpora keep their plans), caps at 4096, and the ConfGuard raise is
  * one-directional (never narrows a user-set width). This is the
  * engineering answer to the measured single-JVM ceiling in SCALE.md's
  * third probe — sizing from statistics instead of GC-thrashing. */
class SizingSpec extends SparkSuite {

  private val cores = 32
  private val heap = 8L << 30 // 8 GiB executor heap

  test("small inputs floor at the core count — fixture plans unchanged") {
    // sf0.1 documents is ~0.6 MB; even ×128 expansion is far below the
    // per-task budget, so the width must be exactly the core count
    val w = Tables.expansionShuffleWidthFor(600L << 10, 128.0, cores, heap)
    assert(w == cores)
  }

  test("width scales with input bytes once state outruns the budget") {
    // 60 MB on disk × 128 expansion ≈ 7.7 GB grouped state; budget is
    // heap/2/cores = 128 MB per concurrent task → ~60 partitions. The
    // invariant that matters: concurrent resident state (cores × state
    // per partition) stays within half the heap
    val bytes = 60L << 20
    val w = Tables.expansionShuffleWidthFor(bytes, 128.0, cores, heap)
    assert(w > cores)
    val statePerPartition = bytes * 128.0 / w
    assert(cores * statePerPartition <= heap / 2.0 * 1.05)
  }

  test("width is monotone in input bytes and capped at 4096") {
    val ws = Seq(1L << 20, 1L << 28, 1L << 32, 1L << 36, 1L << 44)
      .map(Tables.expansionShuffleWidthFor(_, 128.0, cores, heap))
    assert(ws == ws.sorted, s"not monotone: $ws")
    assert(ws.last == 4096)
  }

  test("a smaller heap demands a wider shuffle for the same input") {
    val big = Tables.expansionShuffleWidthFor(60L << 20, 128.0, cores, heap)
    val small = Tables.expansionShuffleWidthFor(60L << 20, 128.0, cores,
      heap / 4)
    assert(small > big)
  }

  test("ensureShuffleWidth raises but never lowers the session width") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    try {
      spark.conf.set(key, "4")
      ConfGuard.ensureShuffleWidth(spark, 16)
      assert(spark.conf.get(key) == "16")
      ConfGuard.ensureShuffleWidth(spark, 8) // narrower: must be a no-op
      assert(spark.conf.get(key) == "16")
    } finally spark.conf.set(key, before)
  }

  test("fixture-scale pair kernel leaves the session width untouched") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    try {
      // q27 runs the sizing contract internally; at sf0.001 the derived
      // width floors at local[4]'s core count, below the session's
      // setting — the raise must not fire
      spark.conf.set(key, "4")
      graft.SparkEntry.queries("q27_dedup_ngram_jaccard")(spark, sfDir)
        .count()
      assert(spark.conf.get(key) == "4")
    } finally spark.conf.set(key, before)
  }
}
