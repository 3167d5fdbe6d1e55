package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Incrementally-maintained search-index statistics — the engine's
  * faithful form of the reference's `CORTEX SEARCH SERVICE ... TARGET_LAG
  * '1 minute'` (`epa_ingestion.py:838-865`): as new documents arrive, the
  * BM25 index-side statistics (per-token document frequency, per-doc
  * length) are upserted within the trigger interval, instead of the whole
  * index being rebuilt.
  *
  * Exactly-once discipline (the additive merge is NOT naturally
  * idempotent, so both halves matter):
  *  - the streaming checkpoint lives at a STABLE location inside the
  *    state dir — a re-run resumes from the last committed offset and
  *    only ever sees new files, never a full replay;
  *  - each micro-batch is guarded by its batchId: a marker commits
  *    with the state swap, so a foreachBatch retry (at-least-once)
  *    skips a batch whose delta already landed.
  *
  * State tables are versioned directories behind an atomically-replaced
  * CURRENT pointer file — a crash at any instant leaves either the old or
  * the new version fully visible (the D6 transaction analog; a plain
  * move-aside/move-in-place pair has a window where the table vanishes).
  *
  * Scale notes: each micro-batch shuffles only the batch's tokens (Δ),
  * never the corpus; the state tables are hash-partitionable by token /
  * doc_id. Trigger interval == TARGET_LAG.
  */
object SearchIndexStream {

  // ---- versioned state tables (pointer-file commit) ----

  private def currentPointer(path: String): Path = Paths.get(path + ".current")

  private def readVersion(path: String): Option[String] = {
    val p = currentPointer(path)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
    else None
  }

  private def readTable(spark: SparkSession, path: String): Option[DataFrame] =
    readVersion(path).map(v => spark.read.parquet(s"${path}__$v"))

  /** Write `df` as the next version and atomically repoint CURRENT. */
  private def commitTable(df: DataFrame, path: String): Unit = {
    val next = readVersion(path).map(_.toLong + 1).getOrElse(0L).toString
    df.coalesce(1).write.mode("overwrite").parquet(s"${path}__$next")
    val tmp = Paths.get(path + s".current.tmp$next")
    Files.write(tmp, next.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentPointer(path), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    // best-effort cleanup of the superseded version
    readVersion(path).filter(_ == next).foreach { _ =>
      val prev = next.toLong - 1
      if (prev >= 0) deleteRecursive(Paths.get(s"${path}__$prev"))
    }
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }

  /** Read current state (empty frames before the first commit). */
  def readState(spark: SparkSession, stateDir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val tok = readTable(spark, s"$stateDir/token_stats")
      .getOrElse(Seq.empty[(String, Long)].toDF("token", "df"))
    val doc = readTable(spark, s"$stateDir/doc_stats")
      .getOrElse(Seq.empty[(Long, Long)].toDF("doc_id", "dl"))
    (tok, doc)
  }

  // ---- merge ----

  private def batchMarker(stateDir: String, batchId: Long): Path =
    Paths.get(s"$stateDir/_applied_$batchId")

  /** Merge one micro-batch of new documents into the state (additive df,
    * union dl). Idempotent per batchId: a retry of an already-applied
    * batch is a no-op. */
  def mergeBatch(batch: DataFrame, stateDir: String, batchId: Long): Unit = {
    if (Files.exists(batchMarker(stateDir, batchId))) return
    val spark = batch.sparkSession
    val (tok, doc) = readState(spark, stateDir)
    // first-writer-wins: a doc_id already indexed contributes nothing —
    // the additive df/dl merge would otherwise double-count a doc that
    // re-arrives in a NEW file (the checkpoint only guards replays of
    // the same file). Documents are immutable in the reference (PDFs;
    // MERGE dedupes on key), so first-wins is the faithful contract.
    val fresh = batch.join(doc.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val toks = fresh.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
    val dTok = toks.select(col("doc_id"), col("token")).distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val dDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val newTok = tok.unionByName(dTok)
      .groupBy("token").agg(sum("df").as("df"))
    val newDoc = doc.unionByName(dDoc)
      .groupBy("doc_id").agg(sum("dl").as("dl"))
    commitTable(newTok, s"$stateDir/token_stats")
    commitTable(newDoc, s"$stateDir/doc_stats")
    Files.createDirectories(Paths.get(stateDir))
    Files.write(batchMarker(stateDir, batchId), Array.emptyByteArray)
  }

  /** Run the maintenance query over a document stream (micro-batched via
    * maxFilesPerTrigger), updating `stateDir` per batch. The checkpoint
    * is stable under stateDir, so repeated invocations RESUME (consume
    * only newly arrived files) rather than replaying the corpus. */
  def maintain(spark: SparkSession, inDir: String, stateDir: String):
      StreamingQuery = {
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, stateDir, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .start()
  }
}
