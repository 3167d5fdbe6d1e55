package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** DEV/TEST/PROD environment namespacing (reference
  * `epa_ingestion.py:29-55`: `DatabaseConfig.get_database` →
  * `{ENV}_{name}` database names + the env-scoped stage path).
  *
  * Spark-native form: the same `{ENV}_{name}` convention applied to the
  * TWO places a Spark deployment names things — catalog databases
  * (`spark_catalog.DEV_SRC_INGEST.products`) and storage roots for the
  * path-addressed stores (binary store, checkpoint/state dirs). One
  * resolver object is threaded through instead of string-formatting at
  * call sites, so an operator cannot accidentally cross environments:
  * every identifier it sees is already env-scoped.
  *
  * This is deliberately a thin config layer, not an operator — the
  * reference's is too (SURVEY §2.11) — but it is load-bearing for
  * isolation: the spec proves a DEV write never lands in PROD's
  * database or store root.
  */
final case class Namespace(env: String, storageRoot: String) {
  require(Namespace.Envs(env), s"unknown env '$env' (expected DEV|TEST|PROD)")

  /** `{ENV}_{name}` — the reference's database naming rule. */
  def database(name: String): String = s"${env}_$name"

  /** Fully-qualified catalog identifier for a table. */
  def table(db: String, name: String): String = s"${database(db)}.$name"

  /** Env-scoped storage path (file-addressed stores, state dirs). */
  def path(parts: String*): String =
    (storageRoot +: env +: parts).mkString("/")

  /** The reference's resolved-config surface (`epa_ingestion.py:49-55`). */
  def config: Map[String, String] = Map(
    "SRC_INGEST_DB" -> database("SRC_INGEST"),
    "DP_APP_DB" -> database("DP_APP"),
    "PDF_STORE_PATH" -> path("SRC_INGEST", "EPA_RAW", "PDF_STORE", "EPA_LABEL_PDF"))

  /** Create this env's databases (idempotent). Each database is rooted
    * under the env's storage root — managed tables then live inside the
    * env's namespace on disk too (catalog AND storage isolation from one
    * declaration), and nothing leaks into a shared default warehouse.
    *
    * `CREATE DATABASE IF NOT EXISTS ... LOCATION` silently keeps the OLD
    * location for a pre-existing database (e.g. one created by earlier
    * code at the default warehouse), so the location is verified after
    * the fact and a mismatch fails LOUDLY — isolation that silently
    * isn't is worse than an error. */
  def ensureDatabases(spark: SparkSession): Unit =
    Seq("SRC_INGEST", "DP_APP").foreach { db =>
      val loc = path("_catalog", database(db))
      spark.sql(s"CREATE DATABASE IF NOT EXISTS ${database(db)} " +
        s"LOCATION '${loc.replace("'", "''")}'")
      // compare normalized (scheme, authority, path) triples rather
      // than round-tripping through java.io.File — the catalog reports
      // hdfs:// or s3:// locations on a real cluster, and File(URI)
      // throws IllegalArgumentException for any non-file scheme
      val actual =
        Namespace.normalizeLocation(
          spark.catalog.getDatabase(database(db)).locationUri)
      val expected = Namespace.normalizeLocation(loc)
      if (actual != expected) throw new IllegalStateException(
        s"database ${database(db)} exists at '$actual', not the env root " +
          s"'$expected' — environments are NOT isolated; drop or relocate it")
    }

  /** Save a table into this env's namespace (catalog-managed parquet). */
  def save(df: DataFrame, db: String, name: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .saveAsTable(table(db, name))

  /** Load a table from this env's namespace. */
  def load(spark: SparkSession, db: String, name: String): DataFrame =
    spark.table(table(db, name))
}

object Namespace {
  val Envs: Set[String] = Set("DEV", "TEST", "PROD")

  /** Normalize a catalog/storage location to a comparable
    * `(scheme, authority, path)` triple. Scheme-less locations are local
    * paths (made absolute against the working dir, like Spark's own
    * warehouse resolution); `file:` URIs take the same absolute-path
    * normalization; remote schemes (hdfs/s3a/...) keep their authority
    * and path verbatim — never forced through java.io.File. */
  def normalizeLocation(loc: String): (String, String, String) = {
    // Only strings that LOOK like URIs go through the URI parser: a raw
    // local path with a space or '%' is URI-illegal (URI.create throws)
    // or would mis-decode, while the catalog's reported locationUri IS
    // encoded (file:/data/ware%20house) — so the URI side is %-decoded
    // via getPath and the raw-path side is taken verbatim, making the
    // two representations of the same location compare equal.
    val hasScheme = loc.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*")
    val parsed =
      if (hasScheme)
        try Some(new java.net.URI(loc))
        catch { case _: java.net.URISyntaxException => None }
      else None
    parsed match {
      case Some(uri) if uri.getScheme != null =>
        val scheme = uri.getScheme
        val rawPath = // getPath %-decodes; opaque URIs fall back raw
          Option(uri.getPath).filter(_.nonEmpty)
            .getOrElse(uri.getSchemeSpecificPart)
        val path =
          if (scheme == "file")
            java.nio.file.Paths.get(rawPath).toAbsolutePath.normalize.toString
          else rawPath.stripSuffix("/")
        (scheme, Option(uri.getAuthority).getOrElse(""), path)
      case _ => // scheme-less: a plain local path, never URI-parsed
        ("file", "",
          java.nio.file.Paths.get(loc).toAbsolutePath.normalize.toString)
    }
  }
}
