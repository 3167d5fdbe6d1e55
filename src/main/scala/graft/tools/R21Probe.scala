package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Round-21 optimization probe: per-QUERY job/stage accounting.
  *
  * For each selected query (GRAFT_ONLY-style prefix list in args(0)),
  * runs one warmup pass then one measured pass with a listener attached,
  * and prints per-job wall time + stage/task counts — the "where do the
  * seconds go" table guide §1 asks for before touching anything. Local
  * diagnostic only; never part of the driver contract.
  */
object R21Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (k <- Seq("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "spark.sql.join.preferSortMergeJoin"))
      println(s"[conf] $k = " +
        scala.util.Try(spark.conf.get(k)).getOrElse("<unset>"))
    val only = args.headOption.map(_.split(",").toSeq).getOrElse(Seq("q165"))
    val names = graft.SparkEntry.queries.keys.toVector.sorted
      .filter(n => only.exists(n.contains))

    final case class JobRec(id: Int, start: Long, var end: Long = -1,
        var stages: Int = 0, var tasks: Int = 0, var desc: String = "")
    val jobs = new scala.collection.mutable.LinkedHashMap[Int, JobRec]
    @volatile var collecting = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (collecting) synchronized {
          val r = JobRec(e.jobId, e.time)
          r.stages = e.stageInfos.size
          r.tasks = e.stageInfos.map(_.numTasks).sum
          r.desc = e.stageInfos.map(_.name).mkString(" | ").take(120)
          jobs(e.jobId) = r
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (collecting) synchronized {
          jobs.get(e.jobId).foreach(_.end = e.time)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      // warmup (codegen/JIT)
      ConfGuard.withConfSnapshot(spark) { fn(spark, sfDir).count() }
      spark.catalog.clearCache(); Checkpoints.sweep(spark)
      // measured
      jobs.clear(); collecting = true
      val t0 = System.nanoTime()
      ConfGuard.withConfSnapshot(spark) { fn(spark, sfDir).count() }
      val dt = (System.nanoTime() - t0) / 1e9
      collecting = false
      spark.catalog.clearCache(); Checkpoints.sweep(spark)
      println(f"===== $name: total $dt%.3f s, ${jobs.size} jobs =====")
      val byTime = jobs.values.toSeq
      var acct = 0L
      byTime.foreach { j =>
        val ms = if (j.end >= 0) j.end - j.start else -1
        if (ms > 0) acct += ms
        println(f"  job ${j.id}%3d  ${ms}%5d ms  stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(60)}")
      }
      println(f"  [sum of job wall ${acct}%5d ms vs total ${(dt * 1000).toLong}%5d ms]")
    }
    spark.stop()
  }
}
