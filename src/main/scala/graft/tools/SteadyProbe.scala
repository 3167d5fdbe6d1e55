package graft.tools

import org.apache.spark.sql.SparkSession

/** Steady-state growth probe: warm up, then alternate a kernel between
  * two corpus dirs, reporting per-dir min — the growth ratio without
  * the JIT/first-touch noise that polluted single-shot probe pairs.
  * Usage: `sbt "runMain graft.tools.SteadyProbe <query> <dirA> <dirB>"`. */
object SteadyProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dirA = args(1)
    val dirB = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    def once(dir: String): Double = {
      val t0 = System.nanoTime()
      ConfGuard.withConfSnapshot(spark) { fn(spark, dir).count() }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Checkpoints.sweep(spark)
      dt
    }
    once(dirA) // warmup (codegen/JIT)
    val as = Seq.fill(2)(once(dirA))
    val bs = Seq.fill(2)(once(dirB))
    val as2 = once(dirA) +: as // one more A after B: order-independence
    val (a, b) = (as2.min, bs.min)
    println(f"$name%s A=${a}%.2fs B=${b}%.2fs ratio=${b / a}%.2fx " +
      s"(samplesA=${as2.map(x => f"$x%.2f").mkString(",")} " +
      s"samplesB=${bs.map(x => f"$x%.2f").mkString(",")})")
    spark.stop()
  }
}
