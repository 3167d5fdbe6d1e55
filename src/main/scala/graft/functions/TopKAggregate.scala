package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** Bounded top-k aggregate (SURVEY.md §4 (iii) — custom
  * TypedImperativeAggregate): keeps the k best (score, id) pairs per
  * group, ordered (score desc, id asc) — the same total order the
  * window-row_number form uses, so results are interchangeable.
  *
  * Why it matters at 100 TB: the window form shuffles EVERY candidate row
  * to its group's reducer and sorts there; this aggregate keeps ≤ k pairs
  * per partition (partial aggregation), so the shuffle carries k×16 B per
  * group per partition instead of the full candidate stream. For the
  * similarity queries that is the difference between shuffling N×Q scored
  * pairs and shuffling k×Q×partitions.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def trim(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (buf.length > k) {
      val kept = buf.sorted(ord).take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow):
      ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      // amortize the sort: trim only at 4k
      if (buf.length >= 4 * k) trim(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    buf ++= other
    trim(buf)
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = buf.sorted(ord).take(k)
    new GenericArrayData(top.map { case (s, i) => InternalRow(s, i) }.toArray)
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val trimmed = buf.sorted(ord).take(k)
    val bb = ByteBuffer.allocate(4 + trimmed.length * 16)
    bb.putInt(trimmed.length)
    trimmed.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[(Double, Long)]
    var j = 0
    while (j < n) { buf += ((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "top_k_by_score"
}

object TopKFunctions {
  /** `groupBy(g).agg(top_k_by_score($"cos", $"vec_id", 5))` → array of the
    * k best (score, id) structs, ordered (score desc, id asc). */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKByScore(GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(id), k).toAggregateExpression())
}
