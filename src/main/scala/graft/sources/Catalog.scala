package graft.sources

import org.apache.spark.sql.SparkSession

/** SQL-surface registration: expose the fixture tables and every library
  * query as temp views, so a SQL-only user (the reference's audience —
  * its pipeline is embedded SQL) can drive the whole engine with
  * `spark.sql(...)` and compose library results with plain SQL joins.
  *
  * Cost honesty: most views are pure lazy plans, but building a
  * DataFrame IS running its construction-time work — the bounded
  * collects of q83/q86/q96/q100/q102/q107/q108, and, heavier, the FULL
  * iterative kernels behind q53/q63/q94/q95/q103 (connected components,
  * PageRank, BPE training run to completion at registration). Use
  * `only` to register a subset when that upfront cost is unwanted.
  *
  * Lifetime: the kernel-backed views are SNAPSHOTS pinned by
  * localCheckpoint blocks. `Checkpoints.sweep` (the harness's
  * between-queries cleaner) destroys those blocks and a swept local
  * checkpoint cannot be recomputed — so sweep() DROPS every registered
  * query view in that session (via [[invalidateRegistered]]): a later
  * SELECT fails explicitly with TABLE_OR_VIEW_NOT_FOUND at the view
  * name, not a confusing block-not-found error deep in a scan.
  * Re-register after any sweep. Registration is idempotent
  * (createOrReplaceTempView) and session-scoped, so two sessions can
  * point at different scale factors without interference.
  */
object Catalog {

  /** Query views registered per session (base-table views excluded —
    * they are plain recomputable scans and survive a sweep). WEAK keys
    * (review find): a strong SparkSession key would pin a stopped,
    * never-swept session — its whole session state — for the JVM's
    * lifetime; with weak keys an unreachable session's entry just
    * vanishes (its temp views died with the session anyway). Guarded by
    * its own lock: WeakHashMap is not thread-safe. */
  private val registered =
    new java.util.WeakHashMap[SparkSession, Set[String]]()

  /** Drop every query view [[registerViews]] created in this session and
    * forget them; returns the dropped names. Called by
    * `Checkpoints.sweep` so checkpoint-backed views cannot outlive their
    * blocks as silent time bombs. */
  def invalidateRegistered(spark: SparkSession): Seq[String] = {
    val views = registered.synchronized {
      Option(registered.remove(spark)).getOrElse(Set.empty[String])
    }
    views.toSeq.sorted.map { v => spark.catalog.dropTempView(v); v }
  }

  /** Register the raw fixture tables (`region` … `embeddings`) plus one
    * `<prefix><query>` view per library query, all bound to `dir`.
    * `only` filters queries by substring (None = all). Returns the
    * registered query-view names. */
  def registerViews(spark: SparkSession, dir: String,
      prefix: String = "graft_",
      only: Option[Seq[String]] = None): Seq[String] = {
    Tables.names.foreach { n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }
    val views = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .map { case (name, fn) =>
        val view = s"$prefix$name"
        fn(spark, dir).createOrReplaceTempView(view)
        view
      }
    registered.synchronized {
      registered.put(spark,
        Option(registered.get(spark)).getOrElse(Set.empty[String]) ++ views)
    }
    views
  }
}
