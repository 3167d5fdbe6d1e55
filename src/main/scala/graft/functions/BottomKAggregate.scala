package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import scala.collection.mutable

/** Bounded bottom-k DISTINCT aggregate — the KMV sketch's state, kept as
  * sketch state and never as a sorted stream (ascending sibling of
  * [[TopKByScore]]). Keeps the k smallest distinct string values per
  * group in a capped ordered set: partial aggregation bounds every
  * buffer at k values, so the shuffle carries ≤ k×(value bytes) per
  * group per partition and NOTHING ever sorts the full distinct stream.
  *
  * Why it exists: the row_number()-window form of "k-th smallest hash"
  * materializes and sorts ALL distinct hashes per group on one reducer —
  * at 100 TB that is the full distinct column through one task, the
  * exact thing a sketch is meant to avoid. This aggregate IS the KMV
  * sketch: its buffer is the mergeable sketch state (union + re-truncate
  * to k), distinct-ness is inherent (a set), and eval returns the
  * ascending value array whose last element is v_k.
  *
  * Total order is plain lexicographic on the string value — for the
  * fixed-width lowercase-hex md5 prefixes it aggregates, that IS numeric
  * order, and matches the DuckDB oracle's `ORDER BY h`.
  */
case class BottomKDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType)

  // analysis-time guards: a non-string child would otherwise surface as a
  // runtime ClassCastException in update(), and k < 1 as a
  // NoSuchElementException on buf.last — fail both at plan time instead
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"$prettyName requires a STRING child, got " +
        child.dataType.catalogString)
    else if (k < 1)
      TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.TreeSet[String] =
    mutable.TreeSet.empty[String]

  private def add(buf: mutable.TreeSet[String], v: String): Unit = {
    if (buf.size < k) buf += v
    else if (v < buf.last && !buf.contains(v)) {
      buf += v
      buf -= buf.last // evict the now-(k+1)-th smallest
    }
  }

  override def update(buf: mutable.TreeSet[String], input: InternalRow):
      mutable.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: mutable.TreeSet[String],
      other: mutable.TreeSet[String]): mutable.TreeSet[String] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[String]): Any =
    new GenericArrayData(buf.toSeq.map(UTF8String.fromString))

  override def serialize(buf: mutable.TreeSet[String]): Array[Byte] = {
    val bytes = buf.toArray.map(_.getBytes("UTF-8"))
    val bb = ByteBuffer.allocate(4 + bytes.map(4 + _.length).sum)
    bb.putInt(bytes.length)
    bytes.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[String] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.TreeSet.empty[String]
    var j = 0
    while (j < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf += new String(arr, "UTF-8")
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKDistinct =
    copy(child = newChildren(0))
  override def prettyName: String = "bottom_k_distinct"
}

object BottomKFunctions {
  /** `groupBy(g).agg(bottom_k_distinct($"h", 64))` → ascending array of
    * the k smallest distinct values; `element_at(arr, k)` is v_k. */
  def bottom_k_distinct(value: Column, k: Int): Column =
    GraftColumnBridge.column(
      BottomKDistinct(GraftColumnBridge.expression(value), k)
        .toAggregateExpression())
}
