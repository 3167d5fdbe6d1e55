package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical scaling probe: replicate the sf0.1 `documents` fixture R×
  * with per-replica-prefixed words (disjoint shingle spaces — each
  * replica keeps the fixture's internal collision structure, replicas
  * share nothing), then time the corpus-scale kernels at 1× and R× and
  * report the measured scaling ratio. A kernel whose ratio tracks R is
  * holding its advertised near-linear shape; a super-linear ratio is a
  * scale bug caught at probe cost instead of cluster cost.
  *
  * Usage: `sbt "runMain graft.tools.ScaleProbe [R]"` (default 10).
  * Writes replicas under /tmp/graft_scaleprobe_{1,R}x; prints one
  * result line per kernel.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val r = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = src.count()
    def buildReplicas(k: Int, out: String): Unit = {
      val reps = (0 until k).map { i =>
        src.select(($"doc_id" + lit(i.toLong * n)).as("doc_id"),
          // per-replica word prefix: shingle spaces are DISJOINT across
          // replicas, so collision structure scales linearly by design
          // and any super-linearity is the kernel's own
          concat_ws(" ", transform(split($"text", " "),
            w => concat(lit(s"r$i"), w))).as("text"),
          $"lang", $"source", $"n_chars")
      }
      reps.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
    }
    val dir1 = "/tmp/graft_scaleprobe_1x"
    val dirR = s"/tmp/graft_scaleprobe_${r}x"
    buildReplicas(1, dir1)
    buildReplicas(r, dirR)

    // documents-only corpus-scale kernels with distinct shuffle shapes
    val kernels = Seq(
      "q26_dedup_exact", "q28_dedup_minhash_lsh", "q27_dedup_ngram_jaccard",
      "q53_dedup_clusters", "q110_quality_classifier", "q95_bpe_merges",
      "q75_dup_block_fraction", "q102_corpus_shuffle", "q114_source_novelty",
      "q101_gopher_repetition")
    println(f"${"kernel"}%-26s ${"t1x(s)"}%8s ${s"t${r}x(s)"}%9s ratio  (R=$r)")
    kernels.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def time(dir: String): Double = {
        // warm-up once, then best-of-2 (the Bench discipline)
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.tools.ConfGuard.withConfSnapshot(spark) {
            fn(spark, dir).count()
          }
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          graft.tools.Checkpoints.sweep(spark)
          dt
        }
        once(); math.min(once(), once())
      }
      val t1 = time(dir1)
      val tR = time(dirR)
      println(f"$name%-26s $t1%8.2f $tR%9.2f ${tR / t1}%5.1fx")
    }
    spark.stop()
  }
}
