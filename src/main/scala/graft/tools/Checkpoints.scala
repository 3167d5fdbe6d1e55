package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lifecycle management for `localCheckpoint` blocks.
  *
  * `Dataset.localCheckpoint()` persists the materialized RDD in the
  * BlockManager, but — unlike `cache()` — it is NOT registered with the
  * CacheManager, so neither `Dataset.unpersist()` on derived frames nor
  * `spark.catalog.clearCache()` ever frees it; the blocks sit until the
  * ContextCleaner happens to GC the RDD reference. In the iterative
  * kernels (connected components, PageRank) that checkpoint per round,
  * this compounds across a 100-query suite into GBs of dead blocks — the
  * BENCH_r10 regression signature (q01 samples rising 1.9→18.5 s,
  * `Block rdd_NNNN already exists` warnings). At 100 TB the same leak is
  * executor-storage exhaustion in any long-lived session.
  *
  * Two tools:
  *  - [[tracked]] pairs each checkpoint with a release handle so a loop
  *    can free the superseded frame as soon as the next one is
  *    materialized (peak block residency = O(1) frames, not O(iters)).
  *  - [[sweep]] unpersists every RDD still pinned in the context — the
  *    between-queries backstop for Verify/Bench/specs, covering the one
  *    frame a kernel must leave alive for its (lazy) returned DataFrame.
  *    Only call it AFTER the query's result has been fully consumed: a
  *    swept local checkpoint cannot be recomputed.
  */
object Checkpoints {

  /** Eagerly localCheckpoint `df`; returns the checkpointed frame plus a
    * release handle freeing exactly the RDDs this call pinned. The id
    * diff over `getPersistentRDDs` avoids reaching into Dataset
    * internals; callers are single-threaded per session (Verify/Bench run
    * queries sequentially), so the diff is precise. After release the
    * frame is NOT recomputable — only release a frame no live DataFrame
    * depends on.
    *
    * Caveats of the id-diff (advisor find, accepted trade-off):
    *  - if `df`'s plan contains a not-yet-materialized `.cache()`
    *    upstream, materializing the checkpoint ALSO pins that cache, so
    *    release() unpersists it too. That cache is recomputable (unlike
    *    the checkpoint), so the effect is perf-only — a consumer still
    *    holding the cached frame recomputes instead of reading blocks;
    *  - the diff is imprecise under CONCURRENT persists in the same
    *    session (e.g. two streaming maintainers interleaving): an RDD
    *    pinned by the other thread inside the window is attributed to
    *    this checkpoint. Single-threaded-per-session use is the
    *    documented contract; nothing enforces it. */
  def tracked(df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val ck = df.localCheckpoint()
    val mine = sc.getPersistentRDDs.keySet -- before
    val release = () => mine.foreach { id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    }
    (ck, release)
  }

  /** Unpersist every RDD the context still holds — caches AND local
    * checkpoints. Harness use only, between fully-consumed queries.
    * Also drops any Catalog-registered query views in this session:
    * kernel-backed views are pinned by the very blocks this destroys,
    * and a dropped view fails a later SELECT explicitly
    * (TABLE_OR_VIEW_NOT_FOUND) instead of a block-not-found error
    * mid-scan (advisor find). */
  def sweep(spark: SparkSession): Unit = {
    graft.sources.Catalog.invalidateRegistered(spark)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** Number of RDDs currently pinned (spec assertion hook). */
  def pinnedCount(spark: SparkSession): Int =
    spark.sparkContext.getPersistentRDDs.size
}
