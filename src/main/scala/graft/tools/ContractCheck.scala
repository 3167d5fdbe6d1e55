package graft.tools

/** One-look audit of the driver contract: every query either has a
  * DuckDB oracle or is a SANCTIONED rows-only sketch (named in
  * [[RowsOnly]] with the spec that bounds it); no oracle is orphaned,
  * and no query can silently join the rows-only lane. Run:
  * `sbt "runMain graft.tools.ContractCheck"`. */
object ContractCheck {

  /** The sanctioned rows-only lane — queries with NO exact oracle BY
    * CONSTRUCTION, each bounded by a named spec instead. These surface
    * as `err: no_oracle` in the driver's correctness artifact on every
    * round; that is the designed contract, not a defect:
    *  - q52: DataSketches HLL registers are engine-internal state — no
    *    SQL engine can replay them. CurationSpec/TemporalSpec bound the
    *    estimate within ±5% of the exact distinct count.
    *  - q83: bloom_filter_agg bit layout is engine-internal. CurationSpec
    *    pins one-sidedness (NO false negatives vs exact q81) and an
    *    fpp-bounded overcount.
    * Every other sketch in the suite (q64 KMV, q68 CMS, q93 KMV set ops,
    * q136 phash) derives from md5/integer arithmetic and IS hash-gated. */
  val RowsOnly: Map[String, String] = Map(
    "q52_hll_sketch" ->
      "spec-bounded: TemporalSpec ±5% of exact (HLL registers not replayable)",
    "q83_bloom_contamination" ->
      "spec-bounded: CurationSpec no-false-negatives + fpp overcount bound")

  def main(args: Array[String]): Unit = {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${qs.size} oracles=${os.size}")
    val rowsOnly = qs -- os
    println("rows-only: " + rowsOnly.toSeq.sorted.mkString(", "))
    RowsOnly.foreach { case (q, why) => println(s"  sanctioned: $q — $why") }
    val orphans = os -- qs
    println("orphan oracles: " + orphans.toSeq.sorted.mkString(", "))
    require(orphans.isEmpty, "oracle entries without a query")
    // the rows-only lane is CLOSED: a new oracle-less query must either
    // get an oracle or be explicitly sanctioned here with its bounding
    // spec — silent growth of the unchecked set is the failure mode
    val unsanctioned = rowsOnly -- RowsOnly.keySet
    require(unsanctioned.isEmpty,
      s"unsanctioned rows-only queries: ${unsanctioned.toSeq.sorted.mkString(", ")}")
    val stale = RowsOnly.keySet -- qs
    require(stale.isEmpty,
      s"sanctioned rows-only entries no longer in queries: ${stale.toSeq.sorted.mkString(", ")}")
  }
}
