package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Round-22 optimization probe: per-STAGE accounting (R21Probe gave
  * per-job walls, but AQE overlaps jobs, so job walls over-count and
  * the CompletableFuture job names hide which operator a job ran).
  * For each selected query: one warmup pass, one measured pass with a
  * stage listener — prints each stage's wall, summed task time, task
  * count and name, in completion order, plus the between-stages gap
  * (driver planning/scheduling time the stages don't account for).
  * Local diagnostic only; never part of the driver contract. */
object R22Probe {
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
    val only = args.headOption.map(_.split(",").toSeq).getOrElse(Seq("q165"))
    val names = graft.SparkEntry.queries.keys.toVector.sorted
      .filter(n => only.exists(n.contains))

    final case class StageRec(id: Int, sub: Long, done: Long, tasks: Int,
        taskMs: Long, name: String)
    val stages = scala.collection.mutable.ArrayBuffer.empty[StageRec]
    @volatile var collecting = false
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (collecting) synchronized {
          val si = e.stageInfo
          stages += StageRec(si.stageId,
            si.submissionTime.getOrElse(-1L),
            si.completionTime.getOrElse(-1L),
            si.numTasks,
            si.taskMetrics.executorRunTime,
            si.name.take(90))
        }
    }
    spark.sparkContext.addSparkListener(listener)

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      ConfGuard.withConfSnapshot(spark) { fn(spark, sfDir).count() }
      spark.catalog.clearCache(); Checkpoints.sweep(spark)
      stages.clear(); collecting = true
      val t0 = System.nanoTime()
      ConfGuard.withConfSnapshot(spark) { fn(spark, sfDir).count() }
      val dt = (System.nanoTime() - t0) / 1e9
      collecting = false
      spark.catalog.clearCache(); Checkpoints.sweep(spark)
      println(f"===== $name: total $dt%.3f s, ${stages.size} stages =====")
      val ordered = stages.sortBy(_.sub).toSeq
      // union of stage intervals -> how much wall the stages cover;
      // the remainder is driver-side (planning, AQE re-opt, collects)
      var covered = 0L
      var lastEnd = Long.MinValue
      ordered.foreach { s =>
        if (s.sub >= 0 && s.done >= 0) {
          val a = math.max(s.sub, lastEnd)
          if (s.done > a) { covered += s.done - a }
          lastEnd = math.max(lastEnd, s.done)
        }
      }
      ordered.foreach { s =>
        println(f"  stage ${s.id}%4d  wall ${s.done - s.sub}%5d ms  taskSum ${s.taskMs}%6d ms  tasks=${s.tasks}%4d  ${s.name}")
      }
      println(f"  [stage-covered wall ${covered}%5d ms vs total ${(dt * 1000).toLong}%5d ms -> driver gap ${(dt * 1000).toLong - covered}%5d ms]")
    }
    spark.stop()
  }
}
