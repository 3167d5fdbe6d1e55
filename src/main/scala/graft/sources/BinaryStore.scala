package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Binary-file store: the Spark mapping of the reference's stage +
  * directory table (SURVEY.md §2.1 S7/S8, `epa_ingestion.py:298-301,
  * 485-494,534-549`).
  *
  *  - sink: idempotent overwrite PUT (`AUTO_COMPRESS=FALSE OVERWRITE=TRUE`
  *    ≈ atomic move-into-place);
  *  - source: `spark.read.format("binaryFile")` over the directory,
  *    projected to the directory-table shape
  *    (RELATIVE_PATH/SIZE/LAST_MODIFIED/MD5/FILE_URL).
  *
  * Scale notes: binaryFile is a proper FileFormat scan — file listing is
  * distributed, content is read executor-side, and
  * `pathGlobFilter`/`modifiedAfter` push down. The md5 projection runs
  * per-partition; nothing collects to the driver.
  */
object BinaryStore {

  /** Filename sanitizer (F5, `epa_ingestion.py:523-532`): strip
    * `<>:"/\|?*`, spaces → `_`, truncate to 200 chars. Pure — usable both
    * driver-side and as a column expression via [[sanitizeCol]]. */
  def sanitizeFilename(name: String): String =
    name.replaceAll("[<>:\"/\\\\|?*]", "").replace(' ', '_').take(200)

  def sanitizeCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(translate(regexp_replace(c, "[<>:\"/\\\\|?*]", ""), " ", "_"), 1, 200)

  /** PUT: write bytes under `storeDir/relativePath`, overwriting (the
    * reference's OVERWRITE=TRUE). Parent dirs are created. */
  def put(storeDir: String, relativePath: String, bytes: Array[Byte]): Unit = {
    val target = Paths.get(storeDir, relativePath)
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(target.getParent, ".put", ".tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Directory-table scan: one row per stored file with the reference's
    * directory(@stage) columns. */
  def directoryTable(spark: SparkSession, storeDir: String): DataFrame = {
    val base = storeDir.stripSuffix("/")
    // Pattern.quote: store paths with regex metacharacters ('+', '(',
    // ...) must strip as literals, not patterns
    val prefix = java.util.regex.Pattern.quote(s"file:$base/")
    spark.read.format("binaryFile").load(base + "/*")
      .select(
        regexp_replace(col("path"), "^" + prefix, "")
          .as("relative_path"),
        col("length").as("size"),
        col("modificationTime").as("last_modified"),
        md5(col("content")).as("md5"),
        col("path").as("file_url"),
        col("content"))
  }
}
