package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-benchmark of i<j pair-expansion shapes over the q109 kernel
  * (round 22): (a) current nested-HOF flatten(transform(slice)) single
  * Generate, (b) two chained Generates (posexplode + explode(slice)),
  * (c) one Generate over a pair-index sequence + arithmetic (i,j)
  * decode. All three feed the same groupBy(s_a, s_b).count to keep the
  * downstream identical; timed with the noop sink methodology (§1.4).
  * Local diagnostic only. */
object R22PairBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def grouped(): DataFrame = graft.sources.Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_suppkey")
      .groupBy($"l_partkey")
      .agg(array_sort(collect_set($"l_suppkey")).as("ss"))
      .filter(size($"ss") > 1 && size($"ss") <= 128)
      .repartition(32)
      .select($"ss")

    def hof(df: DataFrame): DataFrame = df
      .select(explode(expr(
        """flatten(transform(ss, (x, i) ->
          |  transform(slice(ss, i + 2, size(ss)),
          |            y -> struct(x AS s_a, y AS s_b))))""".stripMargin)).as("p"))
      .select($"p.s_a".as("s_a"), $"p.s_b".as("s_b"))

    def twoGen(df: DataFrame): DataFrame = df
      .select($"ss", posexplode($"ss").as(Seq("i", "s_a")))
      .select($"s_a",
        explode(slice($"ss", $"i" + lit(2), size($"ss"))).as("s_b"))

    def arith(df: DataFrame): DataFrame = df
      .select($"ss", explode(expr(
        "sequence(0L, (CAST(size(ss) AS BIGINT) * (size(ss) - 1)) div 2 - 1)"))
        .as("k"))
      // decode k -> (i, j) over the upper triangle, exact integer math:
      // i = n - 2 - floor((sqrt(8*(T-1-k)+1) - 1) / 2), with T = n(n-1)/2
      .withColumn("n", size($"ss").cast("long"))
      .withColumn("kk", $"n" * ($"n" - 1) / 2 - 1 - $"k")
      .withColumn("ii", ($"n" - 2 -
        floor((sqrt($"kk" * 8 + 1) - 1) / 2)).cast("int"))
      .withColumn("jj",
        ($"k" - ($"ii" * $"n" - ($"ii" + 1) * $"ii" / 2 - $"ii") + 1).cast("int"))
      .select(element_at($"ss", $"ii" + 1).as("s_a"),
        element_at($"ss", $"jj" + 1).as("s_b"))

    def timeF(tag: String, mk: () => DataFrame): Unit = {
      mk().write.format("noop").mode("overwrite").save() // warmup
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[pairbench] $tag%-12s min ${samples.min}%.3f s  all ${samples.map(s => f"$s%.3f").mkString(",")}")
    }
    def time(tag: String, mk: DataFrame => DataFrame): Unit =
      timeF(tag, () => mk(grouped()).groupBy($"s_a", $"s_b").agg(count(lit(1))))

    // correctness cross-check first: all three must agree
    val a = hof(grouped()).groupBy($"s_a", $"s_b").agg(count(lit(1)).as("c"))
    val b = twoGen(grouped()).groupBy($"s_a", $"s_b").agg(count(lit(1)).as("c"))
    val c = arith(grouped()).groupBy($"s_a", $"s_b").agg(count(lit(1)).as("c"))
    println("[pairbench] hof vs twoGen diff = " +
      a.except(b).count() + " / " + b.except(a).count())
    println("[pairbench] hof vs arith  diff = " +
      a.except(c).count() + " / " + c.except(a).count())

    // pre-repartition by the group key: the raw (pk, sk) stream is 16 B/row
    // and nearly duplicate-free per map task, so the partial collect_set
    // hash maps reduce almost nothing — shuffle raw rows once and build
    // the sets clustered instead
    def groupedPre(): DataFrame = graft.sources.Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_suppkey")
      .repartition(32, $"l_partkey")
      .groupBy($"l_partkey")
      .agg(array_sort(collect_set($"l_suppkey")).as("ss"))
      .filter(size($"ss") > 1 && size($"ss") <= 128)
      .select($"ss")
    // cluster the pair stream before counting: a pair's ~17 copies are
    // scattered over all tasks, so map-side partial count reduces ~27%
    // while building 32 near-full hash maps; hash-repartition first makes
    // the (in-stage) aggregation see each key's copies together
    def timeClustered(tag: String, mk: DataFrame => DataFrame,
        g: () => DataFrame): Unit =
      timeF(tag, () => mk(g()).repartition(32, $"s_a", $"s_b")
        .groupBy($"s_a", $"s_b").agg(count(lit(1))))

    for (round <- 1 to 2) {
      timeF("grouped", () => grouped())
      timeF("groupedPre", () => groupedPre())
      time("hof", hof)
      time("twoGen", twoGen)
      timeClustered("twoGen-clus", twoGen, () => grouped())
      timeClustered("pre+2g+clus", twoGen,
        () => groupedPre().repartition(32))
      timeF("pre+2g+agg", () => twoGen(groupedPre().repartition(32))
        .groupBy($"s_a", $"s_b").agg(count(lit(1))))
      // the pre-repartition is REPARTITION_BY_NUM (not AQE-coalescible),
      // so the expansion can ride its 32-wide partitioning directly
      timeClustered("pre+2g+clus-nospread", twoGen, () => groupedPre())
    }
    spark.stop()
  }
}
