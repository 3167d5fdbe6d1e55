package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** REST JSON ingestion (SURVEY.md §2.1 S2/S9): the reference fetches one
  * product document per key from the EPA API, throttled to 1 request / 5 s
  * (`epa_ingestion.py:107-116,424`), with per-item fault isolation
  * (`:426-427`). The HTTP edge is an injectable `fetch: key => json` (this
  * environment is zero-egress; production drops in a real client).
  *
  * Two execution shapes:
  *  - [[fetchDriver]] — the reference's own shape: a sequential throttled
  *    driver loop. Correct when the rate limit is global and small (87
  *    keys × 5 s — the API, not the engine, is the bottleneck).
  *  - [[fetchDistributed]] — the 100 TB shape: keys distributed via
  *    `mapPartitions`, each partition throttling independently (per-host
  *    budget = global budget / #partitions). No driver round-trip; results
  *    land as a DataFrame of (key, json, error) ready for Shred.parse.
  */
object RestSource {

  /** Sequential driver-side fetch with a minimum gap between requests.
    * Failed keys produce (key, null, error) rows — run continues. */
  def fetchDriver(spark: SparkSession, keys: Seq[String],
      fetch: String => String, minGapMs: Long = 0L): DataFrame = {
    import spark.implicits._
    var last = 0L
    val rows = keys.map { k =>
      val wait = last + minGapMs - System.currentTimeMillis()
      if (wait > 0) Thread.sleep(wait)
      last = System.currentTimeMillis()
      try (k, fetch(k), null: String)
      catch { case scala.util.control.NonFatal(e) => (k, null: String, e.getMessage) }
    }
    rows.toDF("key", "json", "error")
  }

  /** Distributed fetch: each partition rate-limits itself. `fetch` must be
    * serializable (a plain function object). */
  def fetchDistributed(keys: Dataset[String], fetch: String => String,
      minGapMsPerPartition: Long = 0L): DataFrame = {
    import keys.sparkSession.implicits._
    keys.mapPartitions { it =>
      var last = 0L
      it.map { k =>
        val wait = last + minGapMsPerPartition - System.currentTimeMillis()
        if (wait > 0) Thread.sleep(wait)
        last = System.currentTimeMillis()
        try (k, fetch(k), null: String)
        catch { case scala.util.control.NonFatal(e) => (k, null: String, e.getMessage) }
      }
    }.toDF("key", "json", "error")
  }
}
