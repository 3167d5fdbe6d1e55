package graft

import graft.tools.ConfGuard

/** Session hygiene across queries: no query may leak SQLConf mutations or
  * pinned caches into the session it ran in — the round-8 bench anomaly
  * (q83's permanently raised bloom ceilings) is the regression this spec
  * fences. */
class ConfIsolationSpec extends SparkSuite {

  test("ConfGuard restores changed confs and unsets added ones") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val before = spark.conf.get(key)
    ConfGuard.withConfSnapshot(spark) {
      spark.conf.set(key, "12345")
      spark.conf.set("spark.graft.test.added", "x")
      assert(spark.conf.get(key) == "12345")
    }
    assert(spark.conf.get(key) == before)
    assert(!spark.conf.getAll.contains("spark.graft.test.added"))
  }

  test("q83 leaves the bloom ceilings untouched and q54's plan unchanged") {
    // the round-8 form raised the runtime-bloom ceilings for the rest of
    // the session — every later runtime-filter join (q54's machinery)
    // then planned against contaminated limits. The fixed q83 restores
    // them in a finally; q54 must plan bit-identically before and after.
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val itemsBefore = spark.conf.get(itemsKey)
    val bitsBefore = spark.conf.get(bitsKey)
    def q54Plan: String =
      SparkEntry.queries("q54_bloom_join")(spark, sfDir)
        .queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "#x")
        .replaceAll("\\[plan_id=\\d+\\]", "[plan_id=x]")
    val planBefore = q54Plan
    SparkEntry.queries("q83_bloom_contamination")(spark, sfDir).count()
    assert(spark.conf.get(itemsKey) == itemsBefore)
    assert(spark.conf.get(bitsKey) == bitsBefore)
    val planAfter = q54Plan
    assert(planAfter == planBefore,
      s"q54 plan drifted after q83:\n$planAfter")
    spark.catalog.clearCache()
  }

  test("q83 releases its caches: no persisted-RDD growth across two calls") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    SparkEntry.queries("q83_bloom_contamination")(spark, sfDir).count()
    SparkEntry.queries("q83_bloom_contamination")(spark, sfDir).count()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after == before, s"leaked persisted RDDs: ${after -- before}")
  }
}
