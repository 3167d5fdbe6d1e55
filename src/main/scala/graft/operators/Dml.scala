package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** DML semantics as deterministic join-rewrites (SURVEY.md §2.9).
  *
  * Parquet has no row-level DML, so the reference's MERGE / DELETE USING /
  * UPDATE FROM (`epa_ingestion.py:585-623`, `:744-749`, `:769-775`,
  * `:807-826`) become pure DataFrame→DataFrame functions. Callers persist
  * the result with an atomic overwrite-by-swap (write `_tmp`, rename) —
  * the Spark-file-commit analog of the reference's per-stage transactions
  * (`conn.commit()`/`rollback`, `epa_ingestion.py:628,778`).
  *
  * Scale notes: all three rewrites shuffle both sides once on the merge
  * key — the same cost profile as a warehouse MERGE. When the source is a
  * small delta (the common incremental case) Catalyst/AQE broadcasts it,
  * so the target is never shuffled at all — verified in the plan by the
  * absence of an Exchange over the target scan.
  */
object Dml {

  /** MERGE INTO target USING source ON keys
    * WHEN MATCHED THEN UPDATE (all source columns)
    * WHEN NOT MATCHED THEN INSERT — the reference's metadata upsert (J9).
    * Requires `source` unique on the keys (the reference's temp table is,
    * by construction). */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame =
    source.unionByName(target.join(source, keys, "left_anti"))

  /** DELETE FROM target USING del ON keys (J8/D1): keep the anti set. */
  def deleteUsing(target: DataFrame, del: DataFrame, keys: Seq[String]): DataFrame =
    target.join(del, keys, "left_anti")

  /** UPDATE target SET cols FROM source ON keys (D3/D4): left-join the
    * update source and coalesce(new, old) per updated column. `updates`
    * maps target column name → expression over the joined row. Matched
    * rows take the new value; unmatched keep the old. */
  def updateFrom(target: DataFrame, source: DataFrame, keys: Seq[String],
      updates: Map[String, Column]): DataFrame = {
    val marked = source.select(
      keys.map(col) :+ lit(true).as("__matched"): _*)
    val joined = target.join(marked, keys, "left")
    val outCols = target.columns.map { c =>
      updates.get(c) match {
        case Some(newVal) =>
          when(col("__matched").isNotNull, newVal).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }
    joined.select(outCols.toIndexedSeq: _*)
  }

  /** Dense surrogate-id assignment (the reference's `id INTEGER
    * AUTOINCREMENT`, `epa_ingestion.py:237`): ids `startAt..startAt+N-1`
    * in `orderCols` order. `orderCols` must be a unique key or ids are
    * not reproducible.
    *
    * Why not `monotonically_increasing_id`: its values encode partition
    * ids — sparse (gaps of 2^33), layout-dependent, different on every
    * re-run. When DENSITY and reproducibility matter (state-machine
    * tables keyed by id, stable references from other tables), the id
    * must be a function of the DATA's order, not the cluster's layout.
    *
    * Why not `row_number() OVER (ORDER BY ...)`: a global window is a
    * single-reducer sort — the whole table through one task. This is the
    * scalable form: range-repartition on the order key, sort within
    * partitions, then `zipWithIndex` (one extra count job over partition
    * sizes) assigns globally dense ids with no single-task stage. */
  def withSequentialId(df: DataFrame, orderCols: Seq[String],
      idCol: String = "ID", startAt: Long = 1L): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + startAt)) }
    spark.createDataFrame(rdd, schema)
  }

  /** MERGE with AUTOINCREMENT semantics for the surrogate id: matched
    * rows take the source's data but KEEP the target's id; new rows get
    * dense ids continuing from max(target id), ordered by `orderCols`;
    * unmatched target rows pass through. Re-merging the same source is
    * id-stable (idempotent), so downstream references by id never dangle
    * — the property the reference gets from the warehouse's sequence.
    * The max-id is joined in lazily (broadcast single-row aggregate),
    * never collected to the driver. */
  def mergeWithAutoId(target: DataFrame, source: DataFrame,
      keys: Seq[String], orderCols: Seq[String],
      idCol: String = "ID"): DataFrame = {
    val dataCols = target.columns.filterNot(_ == idCol)
    val src = source.select(dataCols.map(col): _*)
    val matched = src
      .join(target.select((keys :+ idCol).map(col): _*), keys, "inner")
    val fresh = src.join(target.select(keys.map(col): _*), keys, "left_anti")
    val maxId = target.agg(coalesce(max(col(idCol)), lit(0L)).as("__maxid"))
    val freshWithId = withSequentialId(fresh, orderCols, idCol)
      .crossJoin(broadcast(maxId))
      .withColumn(idCol, col(idCol) + col("__maxid"))
      .drop("__maxid")
    val kept = target.join(src.select(keys.map(col): _*), keys, "left_anti")
    val cols = target.columns.map(col).toIndexedSeq
    matched.select(cols: _*)
      .unionByName(freshWithId.select(cols: _*))
      .unionByName(kept.select(cols: _*))
  }

  // ---- fixture-backed query surface (driver correctness gate) ----

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** q20 — J9/D5 MERGE upsert: "source" = re-fetched open orders with a
    * bumped price, "target" = current snapshot; matched rows update, new
    * rows insert (here: all match, exercising the update arm + anti). */
  def q20MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val target = o.filter($"o_orderkey" % 3 === 0)
    // +1000.0 not ×1.1: a multiply would need rounding, and Spark rounds
    // HALF_UP while DuckDB rounds HALF_EVEN — .xx5 cents would diverge.
    val source = o.filter($"o_orderkey" % 2 === 0)
      .withColumn("o_totalprice", $"o_totalprice" + 1000.0)
      .withColumn("o_orderstatus", lit("U"))
    merge(target, source, Seq("o_orderkey"))
      .orderBy($"o_orderkey")
  }

  val q20Oracle: String =
    """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      |  target AS (SELECT * FROM o WHERE o_orderkey % 3 = 0),
      |  source AS (SELECT o_orderkey, 'U' AS o_orderstatus,
      |                    o_totalprice + 1000.0 AS o_totalprice
      |             FROM o WHERE o_orderkey % 2 = 0)
      |SELECT o_orderkey, o_orderstatus, o_totalprice FROM source
      |UNION ALL
      |SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice FROM target t
      |WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM source)
      |ORDER BY o_orderkey""".stripMargin

  /** q21 — J8/D1 DELETE USING: drop lineitems of finalized orders (the
    * re-chunk idempotency delete). */
  def q21DeleteUsing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val finals = t(s, dir, "orders").filter($"o_orderstatus" === "F")
      .select($"o_orderkey".as("l_orderkey"))
    deleteUsing(t(s, dir, "lineitem"), finals, Seq("l_orderkey"))
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
        $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
  }

  val q21Oracle: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
      |FROM lineitem
      |WHERE l_orderkey NOT IN
      |  (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  /** q22 — D3 status-machine UPDATE: orders whose latest lineitem shipped
    * in 1998+ advance PENDING('P')→'CHUNKED'; others keep their status.
    * Mirrors `UPDATE ... SET processing_status='CHUNKED' FROM view`. */
  def q22UpdateStatus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val shipped = t(s, dir, "lineitem")
      .filter(year($"l_shipdate") >= 1998)
      .select($"l_orderkey".as("o_orderkey")).distinct()
    val target = t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    updateFrom(target, shipped, Seq("o_orderkey"),
      Map("o_orderstatus" -> when(col("o_orderstatus") === "P", lit("CHUNKED"))
        .otherwise(col("o_orderstatus"))))
      .orderBy($"o_orderkey")
  }

  val q22Oracle: String =
    """WITH shipped AS (SELECT DISTINCT l_orderkey AS o_orderkey FROM lineitem
      |                 WHERE year(l_shipdate) >= 1998)
      |SELECT o.o_orderkey,
      |       CASE WHEN s.o_orderkey IS NOT NULL AND o.o_orderstatus = 'P'
      |            THEN 'CHUNKED' ELSE o.o_orderstatus END AS o_orderstatus,
      |       o.o_totalprice
      |FROM orders o LEFT JOIN shipped s ON o.o_orderkey = s.o_orderkey
      |ORDER BY o.o_orderkey""".stripMargin

  /** q23 — D4 enrichment UPDATE: copy part/supplier attributes onto the
    * fact rows via the 3-way LEFT JOIN pattern (`epa_ingestion.py:807-826`),
    * null-safe with coalesce defaults. */
  def q23UpdateEnrich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
    val p = t(s, dir, "part").select($"p_partkey", $"p_name", $"p_brand")
    val sup = t(s, dir, "supplier").select($"s_suppkey", $"s_name")
    li.join(broadcast(p), $"l_partkey" === $"p_partkey", "left")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey", "left")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
        coalesce($"p_name", lit("UNKNOWN")).as("part_name"),
        coalesce($"p_brand", lit("UNKNOWN")).as("brand"),
        coalesce($"s_name", lit("UNKNOWN")).as("supplier_name"))
      .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
  }

  val q23Oracle: String =
    """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
      |       coalesce(p.p_name, 'UNKNOWN') AS part_name,
      |       coalesce(p.p_brand, 'UNKNOWN') AS brand,
      |       coalesce(s.s_name, 'UNKNOWN') AS supplier_name
      |FROM lineitem l
      |LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |ORDER BY l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_merge_upsert" -> q20MergeUpsert _,
    "q21_delete_using" -> q21DeleteUsing _,
    "q22_update_status" -> q22UpdateStatus _,
    "q23_update_enrich" -> q23UpdateEnrich _)

  val oracle: Map[String, String] = Map(
    "q20_merge_upsert" -> q20Oracle,
    "q21_delete_using" -> q21Oracle,
    "q22_update_status" -> q22Oracle,
    "q23_update_enrich" -> q23Oracle)
}
