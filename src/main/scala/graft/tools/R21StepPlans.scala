package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-21 plan evidence for the PageRank CONTRIBUTION STEP — q94/q140
  * materialize their bounded report on the driver, so the registered
  * query's plan is just a LocalTableScan; the claim that round 21
  * changed ("one join per iteration instead of the 3-frame re-join")
  * lives in the step plan. Writes the old 3-frame shape and the shipped
  * edgesWithDeg shape side by side, plain and bucketed. */
object R21StepPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val pairs = graft.sources.Tables.lineitem(spark, dir)
      .select($"l_suppkey".cast("long").as("sn"),
        ($"l_partkey" + 100000L).as("pn")).distinct()
    val edges = pairs.select($"sn".as("src"), $"pn".as("dst"))
      .union(pairs.select($"pn".as("src"), $"sn".as("dst")))
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val nodes = deg.select($"src".as("node"), $"deg")
    val r0 = nodes.select($"node", lit(1000000L).as("r"))
    // the r20 step shape: nodes ⋈ ranks ⋈ edges inside every iteration
    val oldStep = nodes
      .join(r0, Seq("node"))
      .join(edges, $"node" === $"src")
      .select($"dst", expr("r div deg").as("c"))
      .groupBy($"dst").agg(sum($"c").as("cs"))
      .select($"dst".as("node"),
        (lit(150000L) + expr("(85 * cs) div 100")).as("r"))
    // the shipped round-21 shape: deg attached once, ONE join per step
    val newStep = graft.operators.Graphs.contributionStep(
      graft.operators.Graphs.edgesWithDeg(edges, deg), r0)
    Files.createDirectories(Paths.get("plans/r21"))
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    Files.writeString(Paths.get("plans/r21/q94_pagerank_step_before.txt"),
      "PageRank contribution step, r20 form (nodes ⋈ ranks ⋈ edges " +
        "re-joined EVERY iteration):\n\n" + fmt(oldStep))
    Files.writeString(Paths.get("plans/r21/q94_pagerank_step_after.txt"),
      "PageRank contribution step, round-21 form (deg attached to the " +
        "edge list once per run; each iteration joins only the rank " +
        "frame):\n\n" + fmt(newStep))
    println("[stepplans] wrote q94 step before/after")
    spark.stop()
  }
}
