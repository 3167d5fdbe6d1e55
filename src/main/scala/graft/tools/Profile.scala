package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch per-stage profiler for bench hotspots (local use). */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import spark.implicits._

    val docs = graft.sources.Tables.documents(spark, dir)
    docs.count()
    val sh = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), expr(
        """explode(transform(sequence(1, size(t) - 2),
          |  i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1),
          |                 element_at(t, i + 2))))""".stripMargin).as("shingle"))
      .distinct()
    val mhAggs = (0 to 7).map(k =>
      min(md5(concat(lit(k), lit(":"), col("shingle")))).as(s"mh$k"))
    val wide = sh.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*)
    val sigs = wide.select(col("doc_id"),
      posexplode(array((0 to 7).map(k => col(s"mh$k")): _*))
        .as(Seq("seed", "mh"))).cache()
    time("sigs cache")(sigs.count())
    val bands = sigs
      .withColumn("band", (col("seed") / 2).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(array_join(expr("transform(array_sort(collect_list(struct(seed, mh))), x -> x.mh)"), "|").as("bkey"))
    time("bands")(bands.count())
    val cands = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    time("cands")(cands.count())
    val est = cands
      .join(sigs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sigs.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.seed") === col("sb.seed"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg((sum(when(col("sa.mh") === col("sb.mh"), 1).otherwise(0)) / 8.0).as("est_sim"))
    time("est")(est.count())
    sigs.unpersist()
    spark.stop()
  }
}
