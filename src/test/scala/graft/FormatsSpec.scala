package graft

import graft.sources.Tables
import java.nio.file.Files

/** Source-format coverage (SURVEY §2.1 S10 and the general source axis):
  * the engine's tables round-trip losslessly through csv, json-lines, and
  * orc — the formats a heterogeneous 100 TB lake actually contains. */
class FormatsSpec extends SparkSuite {
  import spark.implicits._

  lazy val base = Tables.orders(spark, sfDir)
    .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")

  def roundTrip(fmt: String, opts: Map[String, String]): Unit = {
    val dir = Files.createTempDirectory(s"graft_fmt_${fmt}_").toString + "/t"
    base.write.options(opts).format(fmt).save(dir)
    val back = spark.read.options(opts)
      .schema(base.schema) // explicit schema: csv/json would infer otherwise
      .format(fmt).load(dir)
    val a = base.orderBy("o_orderkey").collect().toSeq
    val b = back.orderBy("o_orderkey").collect().toSeq
    assert(a == b, s"$fmt round-trip diverged")
  }

  test("csv round-trip (header, explicit schema)") {
    roundTrip("csv", Map("header" -> "true"))
  }

  test("json-lines round-trip") {
    roundTrip("json", Map.empty)
  }

  test("orc round-trip") {
    roundTrip("orc", Map.empty)
  }
}
