package graft.tools
import org.apache.spark.sql.SparkSession
/** Dump executed-plan extracts for the plan-evidence doc (PLANS.md). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    // GRAFT_PLANS=q84,q86 overrides the default set for doc refreshes
    val qs = sys.env.get("GRAFT_PLANS").map(_.split(",").toSeq)
      .getOrElse(Seq("q01_flagship_latest_anti", "q02_join_inner_dims",
        "q54_bloom_join", "q57_salted_join", "q24_chunk_fixed",
        "q28_dedup_minhash_lsh"))
    val resolved = qs.map(p =>
      p -> graft.SparkEntry.queries.keys.filter(_.startsWith(p)).toSeq)
    resolved.collect { case (p, Seq()) => p } match {
      case Seq() =>
      case bad => sys.error(
        s"GRAFT_PLANS prefixes match no query: ${bad.mkString(", ")}")
    }
    for (q <- resolved.flatMap(_._2)) {
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString.take(3500))
    }
    spark.stop()
  }
}
