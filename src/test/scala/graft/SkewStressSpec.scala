package graft

import graft.tools.ConfGuard
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew stress on a GENERATED hot-key table (one key owns 20% of rows —
  * the q41/q57 fixture skew is mild by comparison): proves, with
  * partition-level and plan-level evidence, that the two skew defenses
  * this library ships actually change the physical layout:
  *  - manual salting (q41/q57's recipe) spreads the hot key across
  *    reducers — asserted by measuring rows per shuffle partition;
  *  - AQE skew-join splits the oversized partition at runtime —
  *    asserted by the `skew=true` marker in the final adaptive plan.
  * Correctness rides along: salted results must equal direct results. */
class SkewStressSpec extends SparkSuite {
  import spark.implicits._

  private val N = 100000
  /** 20% of rows carry key "HOT"; the rest spread over 997 cold keys.
    * The md5 payload is high-entropy so the hot partition's COMPRESSED
    * shuffle bytes (what AQE's skew detector measures) stay proportional
    * to its row count — an all-"HOT" column alone compresses to nothing
    * and would hide the skew from the byte-based detector. */
  private def hotTable: DataFrame =
    spark.range(N).select(
      when($"id" % 5 === 0, "HOT")
        .otherwise(concat(lit("k"), $"id" % 997)).as("key"),
      ($"id" % 89).as("v"),
      md5($"id".cast("string")).as("payload"))

  /** Max fraction of rows in any single post-shuffle partition when
    * hash-partitioning by `cols` — the reducer a straggler would run. */
  private def maxPartitionFraction(df: DataFrame, parts: Int,
      cols: Seq[String]): Double = {
    val counts = df.repartition(parts, cols.map(col): _*)
      .mapPartitions(it => Iterator(it.size))(org.apache.spark.sql.Encoders.scalaInt)
      .collect()
    counts.max.toDouble / counts.sum.toDouble
  }

  test("salting spreads a 20%-hot key across reducers; results unchanged") {
    val t = hotTable
    // layout evidence: keyed by `key` alone, every HOT row lands in ONE
    // partition (≥20% of the table on one reducer — the straggler);
    // keyed by (key, salt) the same rows spread across 16 reducers
    val unsalted = maxPartitionFraction(t, 32, Seq("key"))
    assert(unsalted >= 0.20, f"expected the hot reducer to hold ≥20%% " +
      f"of rows under plain key partitioning, got $unsalted%.3f")
    val salted = maxPartitionFraction(
      t.withColumn("salt", ($"v" % 16).cast("int")), 32, Seq("key", "salt"))
    assert(salted <= 0.06, f"salted partitioning still has a " +
      f"$salted%.3f partition — salt not spreading")

    // correctness: the two-phase salted aggregate (q41's shape) equals
    // the direct groupBy bit-for-bit (long counts/sums are associative)
    val direct = t.groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy($"key").collect()
    val twoPhase = t.withColumn("salt", ($"v" % 16).cast("int"))
      .groupBy($"key", $"salt")
      .agg(count(lit(1)).as("pn"), sum($"v").as("ps"))
      .groupBy($"key")
      .agg(sum($"pn").as("n"), sum($"ps").as("s"))
      .orderBy($"key").collect()
    assert(twoPhase.toSeq == direct.toSeq)
  }

  test("AQE skew-join splits the oversized partition (skew=true in plan)") {
    // thresholds lowered so the generated table's ~400 KB hot partition
    // triggers the same OptimizeSkewedJoin path a 100 TB hot key would;
    // broadcast disabled because the dim that NEEDS salting at scale is
    // the one that does not fit a broadcast
    ConfGuard.withConfSnapshot(spark) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 32 reducers shrink the median partition to ~2.5k rows, so the
      // ~22k-row hot partition is ~9× median — unambiguously skewed
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      val fact = hotTable
      // a PLAIN dim table (no aggregate): OptimizeSkewedJoin only
      // splits an SMJ whose children are Sort-over-shuffle-read — an
      // aggregate between the dim's exchange and the join breaks the
      // pattern, and a key-partitioned operator ABOVE the join makes
      // the split cost an extra exchange (declined by default). Both
      // caveats are exactly why q41/q57 salt MANUALLY for the shapes
      // AQE's skew-join cannot cover.
      val dim = spark.range(997)
        .select(concat(lit("k"), $"id").as("key"), ($"id" % 7).as("w"))
        .union(spark.range(1).select(lit("HOT"), lit(0L)))
      val joined = fact.join(dim, Seq("key"))
      // materialize THIS df (not a derived one) so its adaptive plan
      // finalizes, then read the marker off the executed plan
      val rows = joined.collect()
      assert(rows.length == N) // N:1 join — every fact row exactly once
      assert(rows.count(_.getString(0) == "HOT") == N / 5)
      // the FINAL adaptive plan (post-execution) must carry the skew
      // marker: OptimizeSkewedJoin tags the split join `skew=true`
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(200))
      assert(finalPlan.contains("skew=true"),
        s"no skew=true in the final adaptive plan:\n${finalPlan.take(1200)}")
    }
  }
}
