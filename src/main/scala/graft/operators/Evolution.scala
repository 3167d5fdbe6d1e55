package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Additive schema evolution — the engine counterpart of the reference's
  * `ALTER TABLE ... ADD COLUMN IF NOT EXISTS COMPANYNAME VARCHAR, ...
  * CATEGORY_EPA_TYPE ARRAY` (/root/reference/epa_ingestion.py:797-805;
  * SURVEY §1.2 "fixed-but-evolving" data model): a live table gains new
  * columns WITHOUT rewriting the data already on disk, and readers see
  * one unified schema over old and new files.
  *
  * Spark-first shape: parquet is immutable, so "ALTER TABLE ADD COLUMN"
  * becomes (1) new files are written with the widened schema alongside
  * the old ones — the old generation is untouched bytes; (2) readers
  * pass `mergeSchema=true`, which unions the per-file schemas (footer
  * metadata only — no data read) and surfaces the added columns as NULL
  * for pre-evolution files; (3) a projection backfills the declared
  * defaults (the reference's columns default to NULL; the query
  * materializes explicit defaults to show the full pattern). The
  * generation lives in the directory name (`gen=N`), so partition
  * discovery exposes it as a queryable column and generation pruning is
  * free.
  *
  * At 100 TB this is THE reason schema evolution is viable at all: the
  * alternative — rewriting every historical file to the new schema — is
  * a full-corpus write. Footer-merge cost scales with file COUNT, not
  * bytes, and Spark samples footers unless schemas actually diverge.
  */
object Evolution {

  /** Per-JVM scratch root: absolute (CWD-independent) under the system
    * temp dir, with a per-process token so two sessions rebuilding the
    * same SF concurrently cannot race each other's delete+write (the
    * round-8 CWD-relative `target/q97_store` did both — an ADVICE find). */
  private lazy val scratchRoot: String = {
    val tok = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getName.replaceAll("[^A-Za-z0-9]", "_") // pid@host — stable per JVM
    s"${System.getProperty("java.io.tmpdir")}/graft_q97_store_$tok"
  }

  /** Exposed for EvolutionSpec, which asserts on-disk generation layout. */
  private[graft] def storeDir(dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    s"$scratchRoot/$tag"
  }

  /** q97 — two-generation store: gen=1 holds the v1 schema (custkey,
    * name, nationkey) for even customers; gen=2 appends odd customers
    * with TWO new columns — a scalar (`c_acctbal`) and an ARRAY
    * (`tags`, mirroring the reference's ARRAY add). The unified
    * mergeSchema read backfills gen-1 rows with explicit defaults.
    * Every value derives from `customer`, so the DuckDB oracle replays
    * the result as a pure UNION ALL without reading the scratch store. */
  def q97SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val store = storeDir(dir)
    val c = Tables.load(s, dir, "customer")
    val v1 = c.filter($"c_custkey" % 2 === 0)
      .select($"c_custkey", $"c_name", $"c_nationkey")
    val v2 = c.filter($"c_custkey" % 2 === 1)
      .select($"c_custkey", $"c_name", $"c_nationkey",
        $"c_acctbal", array($"c_mktsegment").as("tags"))
    // generation 1 is written once and NEVER rewritten by the evolution;
    // (the wipe below only makes this query idempotent across runs)
    val base = new Path(store)
    val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(base, true)
    v1.write.parquet(s"$store/gen=1")
    v2.write.parquet(s"$store/gen=2")
    // unified read: footer-level schema union; gen-1 files surface the
    // two post-evolution columns as NULL, backfilled to declared
    // defaults here. `gen` materializes from partition discovery.
    s.read.option("mergeSchema", "true").parquet(store)
      .select($"c_custkey", $"c_name", $"c_nationkey", $"gen",
        round(coalesce($"c_acctbal", lit(0.0)), 2).as("acctbal_filled"),
        coalesce(array_join($"tags", ","), lit("")).as("tags_str"))
      .orderBy($"c_custkey")
  }

  val q97Oracle: String =
    """SELECT c_custkey, c_name, c_nationkey, 1 AS gen,
      |       CAST(0.0 AS DOUBLE) AS acctbal_filled, '' AS tags_str
      |FROM customer WHERE c_custkey % 2 = 0
      |UNION ALL
      |SELECT c_custkey, c_name, c_nationkey, 2 AS gen,
      |       round(c_acctbal, 2) AS acctbal_filled,
      |       c_mktsegment AS tags_str
      |FROM customer WHERE c_custkey % 2 = 1
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q97_schema_evolution" -> q97SchemaEvolution _)

  val oracle: Map[String, String] = Map(
    "q97_schema_evolution" -> q97Oracle)
}
