package graft

import graft.sources.Catalog

/** SQL-only access to the whole library: every query registers as a
  * temp view, views answer plain SQL, and library results compose with
  * ordinary SQL joins against the base tables. */
class CatalogSpec extends SparkSuite {

  test("every query registers as a view and a sample answers SQL") {
    val views = Catalog.registerViews(spark, sfDir)
    assert(views.size == SparkEntry.queries.size)
    assert(views.forall(_.startsWith("graft_")))
    // base table registered
    assert(spark.sql("SELECT count(*) FROM documents").head().getLong(0) > 0)
    // a relational view and an LLM-pipeline view both answer
    assert(spark.sql(
      "SELECT count(*) FROM graft_q12_agg_pricing").head().getLong(0) > 0)
    assert(spark.sql(
      "SELECT count(*) FROM graft_q30_text_langid").head().getLong(0) > 0)
  }

  test("library views compose with SQL joins against base tables") {
    Catalog.registerViews(spark, sfDir,
      only = Some(Seq("q26_dedup_exact")))
    // join the dedup verdict back to documents: every canonical doc is a
    // real doc and copy counts cover the corpus
    val r = spark.sql(
      """SELECT count(*) AS n, sum(CASE WHEN d.doc_id IS NULL
        |                              THEN 1 ELSE 0 END) AS missing
        |FROM graft_q26_dedup_exact x
        |LEFT JOIN documents d ON x.canonical_id = d.doc_id""".stripMargin)
      .head()
    assert(r.getLong(0) > 0 && r.getLong(1) == 0L)
  }

  test("subset registration registers exactly the asked-for views") {
    val views = Catalog.registerViews(spark, sfDir,
      only = Some(Seq("q104", "q110")))
    assert(views.toSet ==
      Set("graft_q104_length_buckets", "graft_q110_quality_classifier"))
  }
}
