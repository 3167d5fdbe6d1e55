package graft.streaming

import graft.operators.Temporal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Incrementally-maintained count-min sketch — the streaming member of
  * the mergeable-sketch family (q68 is its batch twin): per micro-batch
  * the batch documents' tokens build a Δ cell grid, and cells merge by
  * per-(j,bucket) SUM into the accumulated sketch. Only the fixed
  * d×w = 4096-cell grid ever re-reads or rewrites — the historical
  * token stream is never touched again, so continuous frequency
  * tracking over a growing 100 TB corpus costs O(batch tokens) per
  * trigger (TemporalSpec proves the merge identity batch-side).
  *
  * The additive merge is NOT naturally idempotent (replaying a batch
  * would double-count), so the exactly-once discipline is the
  * SearchIndexStream pattern verbatim: stable checkpoint (resume, never
  * replay), versioned state directory behind one atomically-replaced
  * CURRENT pointer, per-batch applied marker. */
object CmsStream {

  private def currentPointer(stateDir: String): Path =
    Paths.get(s"$stateDir/CURRENT")

  private def readVersion(stateDir: String): Option[Long] = {
    val p = currentPointer(stateDir)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  /** Read the current accumulated cells (empty before the first commit). */
  def readCells(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    readVersion(stateDir) match {
      case Some(v) => spark.read.parquet(s"$stateDir/v__$v/cells")
      case None => Seq.empty[(Int, Long, Long)].toDF("j", "bucket", "c")
    }
  }

  private def commitCells(cells: DataFrame, stateDir: String): Unit = {
    val next = readVersion(stateDir).map(_ + 1).getOrElse(0L)
    cells.coalesce(1).write.mode("overwrite").parquet(s"$stateDir/v__$next/cells")
    val tmp = Paths.get(s"$stateDir/CURRENT.tmp$next")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentPointer(stateDir),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    if (next > 0) deleteRecursive(Paths.get(s"$stateDir/v__${next - 1}"))
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }

  private def batchMarker(stateDir: String, batchId: Long): Path =
    Paths.get(s"$stateDir/_applied_$batchId")

  /** Merge one micro-batch: Δ cells from the batch's tokens, summed into
    * the accumulated grid. Idempotent per batchId (marker) and under
    * partial-crash retry (the single-pointer commit leaves state fully
    * old or fully new; a retry recomputes the same Δ against whichever
    * snapshot it sees — old: re-merge produces the same result as the
    * lost commit; new: the marker write is all that remains and cells
    * are already correct… which is exactly why the marker must be
    * written ONLY after the state swap, never before). */
  def mergeBatch(batch: DataFrame, stateDir: String, batchId: Long): Unit = {
    if (Files.exists(batchMarker(stateDir, batchId))) return
    val spark = batch.sparkSession
    val state = readCells(spark, stateDir)
    val delta = Temporal.cmsCells(
      batch.select(explode(split(col("text"), " ")).as("token")))
    val merged = state.unionByName(delta)
      .groupBy(col("j"), col("bucket")).agg(sum(col("c")).as("c"))
    commitCells(merged, stateDir)
    Files.createDirectories(Paths.get(stateDir))
    Files.write(batchMarker(stateDir, batchId), Array.emptyByteArray)
  }

  /** Maintain the sketch over a document stream; stable checkpoint under
    * stateDir so repeated invocations resume, not replay. */
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
