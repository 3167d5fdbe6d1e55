package graft

import org.apache.spark.sql.functions._
import graft.operators.Evolution

/** Additive schema evolution (q97): the pre-evolution generation's
  * files are never rewritten, the mergeSchema read surfaces the added
  * columns as NULL for those files, and the backfill projection
  * produces the declared defaults. */
class EvolutionSpec extends SparkSuite {

  import spark.implicits._

  test("q97 unifies both generations with defaults backfilled") {
    val out = Evolution.q97SchemaEvolution(spark, sfDir).cache()
    val total = graft.sources.Tables.load(spark, sfDir, "customer").count()
    assert(out.count() == total)
    // gen-1 rows carry the declared defaults, not nulls
    val g1 = out.filter($"gen" === 1)
    assert(g1.count() > 0)
    assert(g1.filter($"acctbal_filled" =!= 0.0 || $"tags_str" =!= "").isEmpty)
    // gen-2 rows carry real values in the added columns
    assert(out.filter($"gen" === 2).filter($"tags_str" === "").isEmpty)
    out.unpersist()
  }

  test("evolution never rewrites the old generation's files") {
    Evolution.q97SchemaEvolution(spark, sfDir).count()
    // the gen=1 files on disk still have the NARROW v1 schema — the
    // "ALTER TABLE ADD COLUMN without rewriting history" property
    val store = Evolution.storeDir(sfDir)
    val v1Schema = spark.read.parquet(s"$store/gen=1")
      .schema.fieldNames.toSet
    assert(v1Schema == Set("c_custkey", "c_name", "c_nationkey"))
    // and the raw merged read (no backfill) sees them as NULL
    val merged = spark.read.option("mergeSchema", "true").parquet(store)
    assert(merged.filter($"gen" === 1).filter($"c_acctbal".isNotNull).isEmpty)
  }
}
