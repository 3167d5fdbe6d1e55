package graft

/** Driver-contract smoke: entry has rows, every declared query runs at
  * sf0.001, and every oracle key has a matching query (the column-name
  * discipline itself is enforced by the DuckDB gate). */
class EntrySpec extends SparkSuite {

  test("entry produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("every query executes and is non-empty at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sfDir).count()
        if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"empty results: $empties")
  }
}
