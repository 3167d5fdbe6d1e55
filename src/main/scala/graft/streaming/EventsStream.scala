package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming face of the engine (SURVEY.md §2.10): the
  * reference's only continuous construct is the search service's
  * `TARGET_LAG = '1 minute'` (`epa_ingestion.py:849`) — a declarative
  * freshness SLA over an incrementally-maintained derived table. Spark
  * equivalent: a micro-batch streaming query whose trigger interval is the
  * target lag, watermarking out late data, in update/append mode.
  *
  * Everything here is defined against a streaming DataFrame and shares the
  * transformation code with its batch twin, so
  * streaming-result == batch-result is testable with Trigger.AvailableNow
  * (no wall-clock flakiness — see StreamingSpec).
  *
  * Scale notes: the windowed aggregate state is bounded by
  * (#windows-in-watermark × #event_types); the dedup state by keys within
  * the watermark. Both are the standard 100 TB streaming patterns —
  * watermark bounds state, keys hash-partition across executors.
  */
object EventsStream {

  /** File-replay streaming source over the events fixture: one parquet
    * file treated as an arriving stream. The readStream schema is taken
    * from a footer-only batch read (FileStreamSource needs a declared
    * schema), so fixture drift in the ts type (nanos-as-long vs
    * timestamp[us]) is absorbed by the same branch as the batch loader
    * (`Tables.normalizeEventsTs`). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val rawSchema: StructType = graft.sources.Tables.rawEvents(spark, dir).schema
    // FileStreamSource requires a directory; stage one holding a symlink
    // to the fixture file (the fixture tree is read-only).
    val staged = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_stream_" + dir.replaceAll("[^a-zA-Z0-9.]", "_"))
    java.nio.file.Files.createDirectories(staged)
    val link = staged.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(dir, "events.parquet"))
    graft.sources.Tables.normalizeEventsTs(
      spark.readStream
        .schema(rawSchema)
        .parquet(staged.toString))
  }

  /** Tumbling-window aggregate with watermark — the maintained "search
    * freshness" table. Pure function of a (streaming or batch) events
    * DataFrame, so the batch twin is the same call. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"),
        col("sum_value"))

  /** Streaming dedup on event_id within the watermark — the incremental
    * form of exact dedup (anti-join change detection, SURVEY §2.10 (1)).
    * dropDuplicatesWithinWatermark (not plain dropDuplicates, whose state
    * never evicts unless the event-time column is part of the key) keeps
    * the state store bounded by the watermark horizon. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases matched to error events of
    * the same user within ±10 minutes (the correlation shape of
    * "did an error precede this purchase"). Watermarks on BOTH sides plus
    * the time-bound condition let Spark expire join state — without them
    * a stream-stream join buffers forever. Works identically on batch
    * DataFrames (the spec's equivalence oracle). */
  def purchaseErrorJoin(purchasesSrc: DataFrame, errorsSrc: DataFrame): DataFrame = {
    val purchases = purchasesSrc
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
      .withWatermark("p_ts", "1 hour")
    val errors = errorsSrc
      .filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("e_id"))
      .withWatermark("e_ts", "1 hour")
    purchases.join(errors,
      expr("""p_user = e_user AND
              e_ts BETWEEN p_ts - INTERVAL 10 MINUTES
                       AND p_ts + INTERVAL 10 MINUTES"""))
      .select(col("p_id"), col("e_id"), col("p_user").as("user_id"))
  }

  /** Run `transform` over the event stream into an in-memory table named
    * `queryName`, processing everything currently available (the test /
    * local-verification harness; a production deploy would use
    * `Trigger.ProcessingTime("1 minute")` ≈ TARGET_LAG).
    * In append mode a finite replay never flushes the final open window
    * (the watermark stops advancing), so aggregate tests use "complete";
    * row-wise transforms (dedup) use "append". */
  def runAvailableNow(spark: SparkSession, dir: String, queryName: String,
      outputMode: String)(
      transform: DataFrame => DataFrame): StreamingQuery =
    transform(readEvents(spark, dir))
      .writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        s"${System.getProperty("java.io.tmpdir")}/graft_ckpt_${queryName}_" +
          java.util.UUID.randomUUID().toString.take(8))
      .start()
}
