package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** G1 as a Catalyst Generator: `chunk_text(body, size, overlap)` —
  * SQL-callable one-row→many-rows chunking (LATERAL VIEW / SELECT),
  * SURVEY.md §2.12's "promote to Generator for SQL exposure" step.
  *
  * Semantics are IDENTICAL to graft.etl.Chunker.chunk (starts at
  * i*(size-overlap), ceil-count clamped to [1, 50], SQL substring):
  * ChunkerSpec asserts the equivalence and the sql_chunk query is
  * oracle-verified against the same DuckDB math.
  */
case class ChunkText(child: Expression, size: Expression, overlap: Expression)
    extends Expression with Generator with CodegenFallback {

  val MaxChunks = 50

  override def children: Seq[Expression] = Seq(child, size, overlap)
  override def prettyName: String = "chunk_text"

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    val text = if (raw == null) UTF8String.EMPTY_UTF8 else raw.asInstanceOf[UTF8String]
    val sz = size.eval(input).asInstanceOf[Number].intValue()
    val ov = overlap.eval(input).asInstanceOf[Number].intValue()
    val step = sz - ov
    require(step > 0, "chunk size must exceed overlap")
    val len = text.numChars()
    val numerator = math.max(len, 1) - ov
    val nRaw = if (numerator <= 0) 0 else (numerator + step - 1) / step
    val n = math.min(math.max(nRaw, 1), MaxChunks)
    (0 until n).iterator.map { i =>
      InternalRow(i, text.substringSQL(i * step + 1, sz))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), size = newChildren(1), overlap = newChildren(2))
}
