package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Incrementally-maintained near-duplicate index — the dedup twin of
  * [[SearchIndexStream]]'s TARGET_LAG semantics: as new documents arrive,
  * their MinHash signatures are computed from THEIR shingles only (Δ
  * work), candidate pairs come from probing the accumulated LSH band
  * index on (band, bkey), and the discovered pairs accumulate. The
  * corpus is never re-shingled and never re-paired: per micro-batch the
  * work is O(batch shingles + matching band buckets), the property that
  * makes continuous dedup of a growing 100 TB corpus feasible where a
  * batch re-run (q28) is O(corpus) every time.
  *
  * Exactly-once discipline is inherited from the SearchIndexStream
  * pattern: stable checkpoint (resume, never replay), per-batch marker
  * (retry of an applied batch is a no-op), versioned state directories
  * behind an atomically-replaced CURRENT pointer.
  *
  * State tables (all hash-partitionable at scale):
  *  - sigs  (doc_id, mh0..mh7)     — 8×4 hex chars per doc
  *  - bands (doc_id, band, bkey)   — 4 rows per doc, the inverted index
  *  - pairs (doc_a, doc_b, est_sim) — accumulated candidates
  */
object DedupIndexStream {

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

  private def commitTable(df: DataFrame, path: String): Unit = {
    val next = readVersion(path).map(_.toLong + 1).getOrElse(0L).toString
    df.coalesce(1).write.mode("overwrite").parquet(s"${path}__$next")
    val tmp = Paths.get(path + s".current.tmp$next")
    Files.write(tmp, next.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentPointer(path), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
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

  private def emptySigs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String, String, String, String, String, String, String, String)]
      .toDF("doc_id" +: (0 to 7).map(k => s"mh$k"): _*)
  }

  /** Read current state (empty frames before the first commit). */
  def readState(spark: SparkSession, stateDir: String):
      (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val sigs = readTable(spark, s"$stateDir/sigs").getOrElse(emptySigs(spark))
    val bands = readTable(spark, s"$stateDir/bands")
      .getOrElse(Seq.empty[(Long, Int, String)].toDF("doc_id", "band", "bkey"))
    val pairs = readTable(spark, s"$stateDir/pairs")
      .getOrElse(Seq.empty[(Long, Long, Double)].toDF("doc_a", "doc_b", "est_sim"))
    (sigs, bands, pairs)
  }

  private def batchMarker(stateDir: String, batchId: Long): Path =
    Paths.get(s"$stateDir/_applied_$batchId")

  /** Merge one micro-batch of new documents: Δ signatures, Δ bands,
    * new candidate pairs (batch×state through the band index, plus
    * batch-internal), verified by signature-slot fraction. Idempotent
    * per batchId. */
  def mergeBatch(batch: DataFrame, stateDir: String, batchId: Long): Unit = {
    if (Files.exists(batchMarker(stateDir, batchId))) return
    val spark = batch.sparkSession
    val (sigs, bands, pairs) = readState(spark, stateDir)
    // intra-batch duplicate ids collapse to one row first — otherwise
    // minhashWide would blend two copies' shingle streams into one
    // signature (harmless for identical text, wrong for differing text)
    val dSigs = Dedup.minhashWide(batch.dropDuplicates("doc_id")).cache()
    val dBands = Dedup.lshBands(dSigs)
    // last-writer-wins merges: a re-arriving doc_id REPLACES its prior
    // signature and all 4 band rows (anti-join keeps only non-batch
    // history), so sigs and bands can never mix two versions of one doc
    // — and the merge stays idempotent under a partial-crash retry
    // (re-running yields the same batch-wins result, no double rows)
    val dDocIds = dSigs.select(col("doc_id"))
    val allSigs = dSigs.unionByName(
      sigs.join(dDocIds, Seq("doc_id"), "left_anti"))
    val allBands = dBands.unionByName(
      bands.join(dDocIds, Seq("doc_id"), "left_anti"))
    // probe: batch bands against the POST-replacement band set — each
    // new doc meets the whole (current-version) history through the
    // bucket equi-join, never a scan; a superseded version's buckets
    // can't produce pairs its current signature wouldn't
    val candKeys = dBands.as("x")
      .join(allBands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(
        least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()
    val newPairs = candKeys
      .join(allSigs.as("a"), col("doc_a") === col("a.doc_id"))
      .join(allSigs.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(Dedup.signatureMatchFraction, 6).as("est_sim"))
    val mergedPairs = pairs.unionByName(newPairs)
      .groupBy("doc_a", "doc_b").agg(max("est_sim").as("est_sim"))
    // commit in dependency order: pairs reads sigs/pairs state, sigs
    // reads sigs state, bands reads bands state — every lazy reference
    // must evaluate before the version it reads is deleted
    commitTable(mergedPairs, s"$stateDir/pairs")
    commitTable(allSigs, s"$stateDir/sigs")
    commitTable(allBands, s"$stateDir/bands")
    dSigs.unpersist()
    Files.createDirectories(Paths.get(stateDir))
    Files.write(batchMarker(stateDir, batchId), Array.emptyByteArray)
  }

  /** Maintain the index over a document stream; stable checkpoint under
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
