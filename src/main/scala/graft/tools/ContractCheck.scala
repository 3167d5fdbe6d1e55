package graft.tools

/** One-look audit of the driver contract: every query either has a
  * DuckDB oracle or is a documented rows-only sketch; no oracle is
  * orphaned. Run: `sbt "runMain graft.tools.ContractCheck"`. */
object ContractCheck {
  def main(args: Array[String]): Unit = {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${qs.size} oracles=${os.size}")
    println("rows-only: " + (qs -- os).toSeq.sorted.mkString(", "))
    val orphans = os -- qs
    println("orphan oracles: " + orphans.toSeq.sorted.mkString(", "))
    require(orphans.isEmpty, "oracle entries without a query")
  }
}
