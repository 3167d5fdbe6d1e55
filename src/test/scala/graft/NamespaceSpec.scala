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

  test("location normalization equates encoded URIs with raw paths") {
    import graft.sources.Namespace.normalizeLocation
    // the catalog reports %-ENCODED URIs while the configured storage
    // root is a RAW path — the same location must compare equal, and a
    // URI-illegal raw path (space, %) must not crash the parser
    assert(normalizeLocation("file:/data/ware%20house/x") ==
      normalizeLocation("/data/ware house/x"))
    assert(normalizeLocation("/data/100%done/x")._3 == "/data/100%done/x")
    // remote schemes keep authority + path verbatim, never java.io.File'd
    assert(normalizeLocation("hdfs://nn:8020/wh/db") ==
      (("hdfs", "nn:8020", "/wh/db")))
    assert(normalizeLocation("s3a://bucket/wh/") ==
      (("s3a", "bucket", "/wh")))
    // scheme-less relative paths absolutize like Spark's own resolution
    assert(normalizeLocation("wh/db")._3.startsWith("/"))
  }
}
