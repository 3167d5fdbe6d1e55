package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Whole-surface join-shape audit: which queries plan a cartesian
  * product or a nested-loop join (the two shapes that explode at scale
  * unless one side is provably tiny). Used by PlanQualitySpec's global
  * fence; runnable standalone to regenerate the allowlist. */
object JoinAudit {

  /** AQE-aware: AdaptiveSparkPlanExec is a leaf to collect, descend
    * into inputPlan and subqueries explicitly (same trap as
    * PlanAudit.unpartitionedWindows). */
  def scan(p: SparkPlan): (Int, Int) = {
    val here = p match {
      case _: CartesianProductExec => (1, 0)
      case _: BroadcastNestedLoopJoinExec => (0, 1)
      case _ => (0, 0)
    }
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case _ => p.children
    }
    val sub = p.subqueries
    (inner ++ sub).map(scan).foldLeft(here) {
      case ((c1, n1), (c2, n2)) => (c1 + c2, n1 + n2)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val (cart, nlj) = scan(fn(spark, sfDir).queryExecution.executedPlan)
        if (cart + nlj > 0)
          println(s"[joinaudit] $name cartesian=$cart nestedloop=$nlj")
      } catch {
        case e: Throwable => println(s"[joinaudit] $name ERROR ${e.getMessage}")
      }
      spark.catalog.clearCache()
      Checkpoints.sweep(spark)
    }
    println("[joinaudit] done")
    spark.stop()
  }
}
