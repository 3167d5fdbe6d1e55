package graft

import graft.operators.Dml
import org.apache.spark.sql.functions._

/** DML join-rewrite semantics (SURVEY.md §2.9): matched/unmatched arms,
  * idempotency under re-run — the properties the reference gets from
  * transactions + MERGE (`epa_ingestion.py:551-637`). */
class DmlSpec extends SparkSuite {
  import spark.implicits._

  def target = Seq(
    (1L, "PENDING", 10.0), (2L, "CHUNKED", 20.0), (3L, "PENDING", 30.0)
  ).toDF("id", "status", "v")

  def source = Seq(
    (2L, "PENDING", 99.0), (4L, "PENDING", 40.0)
  ).toDF("id", "status", "v")

  test("merge: matched rows update, unmatched insert, others survive") {
    val out = Dml.merge(target, source, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, "PENDING", 10.0),   // untouched
      (2L, "PENDING", 99.0),   // updated from source
      (3L, "PENDING", 30.0),   // untouched
      (4L, "PENDING", 40.0)))  // inserted
  }

  test("merge is idempotent on re-run with same source") {
    val once = Dml.merge(target, source, Seq("id"))
    val twice = Dml.merge(once, source, Seq("id"))
    assert(once.orderBy("id").collect().toSeq ==
      twice.orderBy("id").collect().toSeq)
  }

  test("deleteUsing removes exactly the matched keys") {
    val del = Seq(Tuple1(2L), Tuple1(99L)).toDF("id")
    val out = Dml.deleteUsing(target, del, Seq("id"))
      .orderBy("id").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("updateFrom updates matched rows only, via expression") {
    val upd = Seq(Tuple1(1L), Tuple1(3L)).toDF("id")
    val out = Dml.updateFrom(target, upd, Seq("id"),
        Map("status" -> when(col("status") === "PENDING", lit("CHUNKED"))
          .otherwise(col("status"))))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "CHUNKED"), (2L, "CHUNKED"), (3L, "CHUNKED")))
    // row 2 was already CHUNKED (not matched by upd — value untouched)
  }

  test("updateFrom leaves non-updated columns bit-identical") {
    val upd = Seq(Tuple1(1L)).toDF("id")
    val out = Dml.updateFrom(target, upd, Seq("id"),
        Map("status" -> lit("X")))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
  }
}
