package graft

import graft.sources.{Namespace, Tables}

import java.nio.file.Files

/** Env-prefixed namespacing (reference `epa_ingestion.py:29-55`): name
  * resolution follows the `{ENV}_{name}` rule, and environments are
  * actually isolated — a DEV write is invisible to PROD through both the
  * catalog and the storage root. */
class NamespaceSpec extends SparkSuite {

  test("resolves the reference's config surface per environment") {
    val dev = Namespace("DEV", "/data/graft")
    assert(dev.database("SRC_INGEST") == "DEV_SRC_INGEST")
    assert(dev.table("DP_APP", "docs_chunks") == "DEV_DP_APP.docs_chunks")
    assert(dev.config("PDF_STORE_PATH") ==
      "/data/graft/DEV/SRC_INGEST/EPA_RAW/PDF_STORE/EPA_LABEL_PDF")
    assert(Namespace("PROD", "/data/graft").config("SRC_INGEST_DB") ==
      "PROD_SRC_INGEST")
    intercept[IllegalArgumentException](Namespace("STAGING", "/x"))
  }

  test("DEV and PROD are isolated through catalog and storage root") {
    val root = Files.createTempDirectory("graft_ns_").toString
    val dev = Namespace("DEV", root)
    val prod = Namespace("PROD", root)
    dev.ensureDatabases(spark)
    prod.ensureDatabases(spark)

    val products = Tables.region(spark, sfDir) // any small fixture
    dev.save(products, "SRC_INGEST", "region")
    // DEV sees its table; PROD's namespace has no such table
    assert(dev.load(spark, "SRC_INGEST", "region").count() == products.count())
    assert(!spark.catalog.tableExists(prod.table("SRC_INGEST", "region")))
    // storage roots diverge per env — a DEV path can never alias PROD's
    assert(dev.path("SRC_INGEST", "x") != prod.path("SRC_INGEST", "x"))

    prod.save(products.limit(1), "SRC_INGEST", "region")
    // same logical name, different contents per env — no bleed-through
    assert(prod.load(spark, "SRC_INGEST", "region").count() == 1)
    assert(dev.load(spark, "SRC_INGEST", "region").count() == products.count())
  }
}
