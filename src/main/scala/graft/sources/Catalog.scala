package graft.sources

import org.apache.spark.sql.SparkSession

/** SQL-surface registration: expose the fixture tables and every library
  * query as temp views, so a SQL-only user (the reference's audience —
  * its pipeline is embedded SQL) can drive the whole engine with
  * `spark.sql(...)` and compose library results with plain SQL joins.
  *
  * Most views are pure lazy plans. The handful of queries with
  * documented construction-time actions (q83's bloom build, the
  * codebook/histogram collects of q86/q96/q100/q102/q107, q108's
  * candidate count) run those bounded jobs AT REGISTRATION, because
  * building the DataFrame is what runs them — use `only` to register a
  * subset when that cost is unwanted up front. Registration is
  * idempotent (createOrReplaceTempView) and session-scoped, so two
  * sessions can point at different scale factors without interference.
  */
object Catalog {

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
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .map { case (name, fn) =>
        val view = s"$prefix$name"
        fn(spark, dir).createOrReplaceTempView(view)
        view
      }
  }
}
