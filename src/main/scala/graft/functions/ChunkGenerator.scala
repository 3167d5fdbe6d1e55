package graft.functions

import graft.operators.Chunker
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The chunker as a true Catalyst Generator — the native form of the
  * reference's TEXT_CHUNKER table function joined laterally
  * (`FROM pdf_to_chunk, TABLE(TEXT_CHUNKER(...))`,
  * `epa_ingestion.py:761-764`). One input row yields N (chunk_index,
  * chunk) rows from a single `Generate` plan node: no UDF→array
  * materialization, no separate explode — each chunk row streams straight
  * into the parent consumer, which matters when a 16 MB document would
  * otherwise buffer its whole chunk array per row.
  */
case class ChunkGenerator(child: Expression, chunkSize: Int, overlap: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_index", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_chunks expects a string argument, got ${child.dataType.simpleString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val chunks = Chunker.chunkText(t.toString, chunkSize, overlap)
      chunks.iterator.zipWithIndex.map { case (c, i) =>
        InternalRow(i, UTF8String.fromString(c))
      }.toSeq
    }
  }

  override def prettyName: String = "text_chunks"

  override protected def withNewChildInternal(newChild: Expression): ChunkGenerator =
    copy(child = newChild)
}

object ChunkFunctions {
  /** `df.select($"id", text_chunks($"text"))` → Generate node fanning each
    * row out to its (chunk_index, chunk) rows. */
  def text_chunks(text: Column,
      chunkSize: Int = Chunker.DefaultChunkSize,
      overlap: Int = Chunker.DefaultOverlap): Column =
    GraftColumnBridge.column(
      ChunkGenerator(GraftColumnBridge.expression(text), chunkSize, overlap))

  /** Generator-based twin of Chunker.chunkDocs (same output schema). */
  def chunkDocsNative(docs: DataFrame, textCol: String = "text",
      chunkSize: Int = Chunker.DefaultChunkSize,
      overlap: Int = Chunker.DefaultOverlap): DataFrame = {
    val others = docs.columns.filter(_ != textCol).map(col)
    docs.select(others.toIndexedSeq :+ text_chunks(col(textCol), chunkSize, overlap): _*)
  }
}
