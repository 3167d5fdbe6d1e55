package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Incrementally-maintained search-index statistics — the engine's
  * faithful form of the reference's `CORTEX SEARCH SERVICE ... TARGET_LAG
  * '1 minute'` (`epa_ingestion.py:838-865`): as new documents arrive, the
  * BM25 index-side statistics (per-token document frequency, per-doc
  * length) are upserted within the trigger interval, instead of the whole
  * index being rebuilt.
  *
  * State lives as parquet tables swapped atomically per micro-batch
  * (overwrite-by-swap — the D6 transaction analog). The merge is additive:
  * micro-batches carry disjoint new documents, so `df' = df + Δdf` and
  * doc-lengths union in. BM25 queries then read the maintained tables and
  * score only the query terms' postings.
  *
  * Scale notes: each micro-batch shuffles only the batch's tokens (Δ),
  * never the corpus; the state tables are hash-partitionable by token /
  * doc_id. Trigger interval == TARGET_LAG.
  */
object SearchIndexStream {

  /** Read current state (empty frames on first batch). */
  def readState(spark: SparkSession, stateDir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val tokPath = s"$stateDir/token_stats"
    val docPath = s"$stateDir/doc_stats"
    val tok =
      if (Files.exists(Paths.get(tokPath)))
        spark.read.parquet(tokPath)
      else Seq.empty[(String, Long)].toDF("token", "df")
    val doc =
      if (Files.exists(Paths.get(docPath)))
        spark.read.parquet(docPath)
      else Seq.empty[(Long, Long)].toDF("doc_id", "dl")
    (tok, doc)
  }

  /** Merge one micro-batch of new documents into the state (additive df,
    * union dl) and swap the state dirs atomically. */
  def mergeBatch(batch: DataFrame, stateDir: String): Unit = {
    val spark = batch.sparkSession
    val (tok, doc) = readState(spark, stateDir)
    val toks = batch.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
    val dTok = toks.select(col("doc_id"), col("token")).distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val dDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val newTok = tok.unionByName(dTok)
      .groupBy("token").agg(sum("df").as("df"))
    val newDoc = doc.unionByName(dDoc)
      .groupBy("doc_id").agg(sum("dl").as("dl"))
    swapWrite(newTok, s"$stateDir/token_stats")
    swapWrite(newDoc, s"$stateDir/doc_stats")
  }

  /** Overwrite-by-swap: write to `<path>__tmp`, then move into place —
    * readers never observe a half-written table (D6). */
  private def swapWrite(df: DataFrame, path: String): Unit = {
    val tmp = path + "__tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val target = Paths.get(path)
    if (Files.exists(target)) {
      val trash = Paths.get(path + "__old")
      deleteRecursive(trash)
      Files.move(target, trash, StandardCopyOption.ATOMIC_MOVE)
      Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursive(trash)
    } else {
      Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  private def deleteRecursive(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }

  /** Run the maintenance query over a document stream (micro-batched via
    * maxFilesPerTrigger), updating `stateDir` per batch. */
  def maintain(spark: SparkSession, inDir: String, stateDir: String):
      StreamingQuery = {
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, stateDir)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        stateDir + "/_ckpt_" + java.util.UUID.randomUUID().toString.take(8))
      .start()
  }
}
