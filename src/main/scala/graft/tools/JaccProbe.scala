package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local-only A/B profiler for q27 kernel variants. Not part of the gate. */
object JaccProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def shingleStream(par: Int): DataFrame =
      graft.sources.Tables.documents(spark, sfDir).repartition(par)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), expr(
          """explode(transform(sequence(1, size(t) - 2),
            |  i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1),
            |                 element_at(t, i + 2))))""".stripMargin).as("shingle"))
        .select(col("doc_id"),
          conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("sh64"))

    def finish(pairs: DataFrame, sizes: DataFrame): DataFrame =
      pairs
        .join(sizes.as("sa"), $"doc_a" === $"sa.doc_id")
        .join(sizes.as("sb"), $"doc_b" === $"sb.doc_id")
        .select($"doc_a", $"doc_b", $"inter", $"sa.n".as("n_a"), $"sb.n".as("n_b"),
          ($"inter" / ($"sa.n" + $"sb.n" - $"inter")).as("jaccard"))
        .filter($"jaccard" >= 0.2)

    def pairExplode(grouped: DataFrame): DataFrame =
      grouped.filter(size($"ds") > 1)
        .select(explode(expr(
          """flatten(transform(ds, (x, i) ->
            |  transform(slice(ds, i + 2, size(ds)),
            |            y -> struct(x AS doc_a, y AS doc_b))))""".stripMargin)).as("p"))
        .select($"p.doc_a", $"p.doc_b")
        .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("inter"))

    // variant A: current shipped (cache + repartition both sides)
    def vA(par: Int): DataFrame = {
      val grouped = shingleStream(par)
        .groupBy($"sh64").agg(array_sort(collect_set($"doc_id")).as("ds"))
        .select($"ds").repartition(par).cache()
      val sizes = grouped.select(explode($"ds").as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      finish(pairExplode(grouped), sizes)
    }
    // variant B: no cache — rely on AQE ReusedExchange for the shared agg
    def vB(par: Int): DataFrame = {
      val grouped = shingleStream(par)
        .groupBy($"sh64").agg(array_sort(collect_set($"doc_id")).as("ds"))
        .select($"ds").repartition(par)
      val sizes = grouped.select(explode($"ds").as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      finish(pairExplode(grouped), sizes)
    }
    // variant C: no cache, sizes straight from the stream (no grouped dep)
    def vC(par: Int): DataFrame = {
      val stream = shingleStream(par)
      val grouped = stream
        .groupBy($"sh64").agg(array_sort(collect_set($"doc_id")).as("ds"))
        .select($"ds").repartition(par)
      val sizes = stream.groupBy($"doc_id").agg(count_distinct($"sh64").as("n"))
      finish(pairExplode(grouped), sizes)
    }

    def timed(label: String)(mk: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime(); mk.count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); dt
      }
      once()
      val best = (0 until 3).map(_ => once()).min
      println(f"[probe] $label%-30s min3=$best%.3fs")
    }

    val parAd = graft.sources.Tables.fanoutParallelism(spark, sfDir, "documents")
    println(s"[probe] adaptive par = $parAd")
    val full = sys.env.contains("JACC_PROBE_FULL")
    if (full) {
    timed("A cache par=32")(vA(32))
    timed(s"A cache par=$parAd")(vA(parAd))
    timed(s"B nocache par=$parAd")(vB(parAd))
    timed(s"C nocache sizes-direct par=$parAd")(vC(parAd))
    timed("B nocache par=4")(vB(4))
    }
    // variant D: B minus the post-agg repartition (explode fuses into the
    // agg reduce stage; serial there but one less barrier)
    def vD(par: Int): DataFrame = {
      val grouped = shingleStream(par)
        .groupBy($"sh64").agg(array_sort(collect_set($"doc_id")).as("ds"))
        .select($"ds")
      val sizes = grouped.select(explode($"ds").as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      finish(pairExplode(grouped), sizes)
    }
    if (full) timed(s"D nocache norepart par=$parAd")(vD(parAd))

    // ---- stage decomposition (variant B shape) ----
    if (full) {
    timed(s"stage: shingle stream only")(shingleStream(parAd))
    timed(s"stage: + groupBy(sh64)")(
      shingleStream(parAd).groupBy($"sh64").agg(count(lit(1)).as("n")))
    timed(s"stage: + collect_set agg")(
      shingleStream(parAd)
        .groupBy($"sh64").agg(array_sort(collect_set($"doc_id")).as("ds"))
        .select($"ds").repartition(parAd))
    timed(s"stage: + pair explode")(pairExplode(
      shingleStream(parAd)
        .groupBy($"sh64").agg(array_sort(collect_set($"doc_id")).as("ds"))
        .select($"ds").repartition(parAd)))
    }

    // ---- connected components cost on precomputed pairs ----
    val pairsDone = {
      val grouped = shingleStream(parAd)
        .groupBy($"sh64").agg(array_sort(collect_set($"doc_id")).as("ds"))
        .select($"ds").repartition(parAd)
      val sizes = grouped.select(explode($"ds").as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      finish(pairExplode(grouped), sizes)
        .select($"doc_a", $"doc_b").localCheckpoint()
    }
    println(s"[probe] edge pairs at sf: ${pairsDone.count()}")
    def timedCc(label: String)(mk: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime(); mk.count()
        val dt = (System.nanoTime() - t0) / 1e9; dt
      }
      once()
      val best = (0 until 3).map(_ => once()).min
      println(f"[probe] $label%-30s min3=$best%.3fs")
    }
    if (full) timedCc("cc on precomputed pairs")(
      graft.operators.Dedup.connectedComponents(pairsDone))

    // variant E: self-join pair generation (codegen'd join instead of HOF)
    def vE(par: Int): DataFrame = {
      val stream = shingleStream(par).dropDuplicates("sh64", "doc_id")
      val pairs = stream.as("a")
        .join(stream.as("b"),
          $"a.sh64" === $"b.sh64" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      val sizes = stream.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      finish(pairs, sizes)
    }
    if (full) timed(s"E selfjoin par=$parAd")(vE(parAd))

    // variant F: HOF explode but packed-long pair key through the agg
    def vF(mapPar: Int, pairPar: Int): DataFrame = {
      val grouped = shingleStream(mapPar)
        .groupBy($"sh64").agg(array_sort(collect_set($"doc_id")).as("ds"))
        .select($"ds").repartition(pairPar)
      val pairs = grouped.filter(size($"ds") > 1)
        .select(explode(expr(
          """flatten(transform(ds, (x, i) ->
            |  transform(slice(ds, i + 2, size(ds)),
            |            y -> x * 4294967296L + y)))""".stripMargin)).as("pk"))
        .groupBy($"pk").agg(count(lit(1)).as("inter"))
        .select(shiftright($"pk", 32).as("doc_a"),
          ($"pk".bitwiseAND(4294967295L)).as("doc_b"), $"inter")
      val sizes = grouped.select(explode($"ds").as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      finish(pairs, sizes)
    }
    if (full) timed(s"F packed m=$parAd p=$parAd")(vF(parAd, parAd))

    // variant G: filter multi-doc groups BEFORE the pair repartition —
    // the pair-stage shuffle then moves only colliding groups, not the
    // whole grouped table; sizes reuses grouped's exchange
    def vG(mapPar: Int, pairPar: Int): DataFrame = {
      val grouped = shingleStream(mapPar)
        .groupBy($"sh64").agg(array_sort(collect_set($"doc_id")).as("ds"))
        .select($"ds")
      val pairs = grouped.filter(size($"ds") > 1).repartition(pairPar)
        .select(explode(expr(
          """flatten(transform(ds, (x, i) ->
            |  transform(slice(ds, i + 2, size(ds)),
            |            y -> x * 4294967296L + y)))""".stripMargin)).as("pk"))
        .groupBy($"pk").agg(count(lit(1)).as("inter"))
        .select(shiftright($"pk", 32).as("doc_a"),
          ($"pk".bitwiseAND(4294967295L)).as("doc_b"), $"inter")
      val sizes = grouped.select(explode($"ds").as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      finish(pairs, sizes)
    }
    if (full) timed(s"G filterfirst m=$parAd p=4")(vG(parAd, 4))

    // variant H: G but sizes from the map-side stream (count_distinct)
    def vH(mapPar: Int, pairPar: Int): DataFrame = {
      val stream = shingleStream(mapPar)
      val grouped = stream
        .groupBy($"sh64").agg(array_sort(collect_set($"doc_id")).as("ds"))
        .select($"ds")
      val pairs = grouped.filter(size($"ds") > 1).repartition(pairPar)
        .select(explode(expr(
          """flatten(transform(ds, (x, i) ->
            |  transform(slice(ds, i + 2, size(ds)),
            |            y -> x * 4294967296L + y)))""".stripMargin)).as("pk"))
        .groupBy($"pk").agg(count(lit(1)).as("inter"))
        .select(shiftright($"pk", 32).as("doc_a"),
          ($"pk".bitwiseAND(4294967295L)).as("doc_b"), $"inter")
      val sizes = stream.groupBy($"doc_id")
        .agg(count_distinct($"sh64").as("n"))
      finish(pairs, sizes)
    }
    if (full) timed(s"H sizes-stream m=$parAd p=$parAd")(vH(parAd, parAd))
    if (full) timedCc(s"q53 shape: G kernel + cc")(
      graft.operators.Dedup.connectedComponents(
        vG(parAd, parAd).select($"doc_a", $"doc_b")))

    // variant I: G + task-local sizes — size(array_distinct(hash array))
    // straight off the doc scan, NO shuffle; sizes then broadcast-joins
    def shArray = {
      val base = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 3)
      base.select(col("doc_id"), expr(
        """transform(sequence(1, size(t) - 2),
          |  i -> cast(conv(substring(md5(concat_ws(' ',
          |         element_at(t, i), element_at(t, i + 1),
          |         element_at(t, i + 2))), 1, 15), 16, 10) AS long))"""
          .stripMargin).as("shs"))
    }
    def vI(mapPar: Int, pairPar: Int): DataFrame = {
      val arr = shArray
      val stream = arr.repartition(mapPar)
        .select(col("doc_id"), explode(col("shs")).as("sh64"))
      val grouped = stream
        .groupBy($"sh64").agg(array_sort(collect_set($"doc_id")).as("ds"))
        .select($"ds")
      val pairs = grouped.filter(size($"ds") > 1).repartition(pairPar)
        .select(explode(expr(
          """flatten(transform(ds, (x, i) ->
            |  transform(slice(ds, i + 2, size(ds)),
            |            y -> x * 4294967296L + y)))""".stripMargin)).as("pk"))
        .groupBy($"pk").agg(count(lit(1)).as("inter"))
        .select(shiftright($"pk", 32).as("doc_a"),
          ($"pk".bitwiseAND(4294967295L)).as("doc_b"), $"inter")
      val sizes = shArray.repartition(mapPar)
        .select(col("doc_id"), size(array_distinct(col("shs"))).cast("long").as("n"))
      finish(pairs, broadcast(sizes))
    }
    // variant J: G shape but struct pair keys (no 2^32 doc_id cap)
    def vJ(mapPar: Int, pairPar: Int): DataFrame = {
      val grouped = shingleStream(mapPar)
        .groupBy($"sh64").agg(array_sort(collect_set($"doc_id")).as("ds"))
        .select($"ds")
      val pairs = grouped.filter(size($"ds") > 1).repartition(pairPar)
        .select(explode(expr(
          """flatten(transform(ds, (x, i) ->
            |  transform(slice(ds, i + 2, size(ds)),
            |            y -> struct(x AS doc_a, y AS doc_b))))""".stripMargin))
          .as("p"))
        .select($"p.doc_a", $"p.doc_b")
        .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("inter"))
      val sizes = grouped.select(explode($"ds").as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      finish(pairs, sizes)
    }
    // vI is the negative exhibit: md5 INSIDE the interpreted HOF lambda
    // ran ~4x slower than md5-after-explode — kept measurable under the
    // full run so the finding stays reproducible
    if (full) timed(s"I localsizes m=$parAd")(vI(parAd, parAd))
    timed(s"J struct-filterfirst m=$parAd")(vJ(parAd, parAd))
    timed(s"G again m=$parAd")(vG(parAd, parAd))
    timedCc(s"q53 shape: J kernel + cc")(
      graft.operators.Dedup.connectedComponents(
        vJ(parAd, parAd).select($"doc_a", $"doc_b")))
    spark.stop()
  }
}
