package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Compiled integer-vector kernels for the PQ/ANN family (round 18
  * optimization — the DotProduct discipline applied to the exact-
  * integer distance tier).
  *
  * What they replace: `transform(embedding, x -> cast(round(x*1000) as
  * bigint))` and `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L,
  * +)` — both HigherOrderFunctions, both CodegenFallback (interpreted
  * expression-tree walk + boxing per element). The quantization runs
  * once per corpus vector, but the squared-distance fold sits inside
  * codebook joins (corpus × M·K rows), where the interpreted walk
  * dominated knn_pq_trained's runtime.
  *
  * Bit-identical semantics: [[IntVecOps.quantizeMilli]] reproduces
  * `round(cast(x as double) * 1000)` exactly (same BigDecimal
  * HALF_UP rounding Spark's Round uses for doubles, same double
  * widening, same long cast); [[IntVecOps.sqDistLong]] is the same
  * left-to-right Σ(x−y)² over longs.
  */
object IntVecOps {

  /** array<float> → array<long> of round(x·1000) in Spark's Round
    * semantics (BigDecimal HALF_UP on the double product).
    */
  def quantizeMilli(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble * 1000.0
      out(i) = java.math.BigDecimal.valueOf(d)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Σ (a_i − b_i)² over the common prefix of two long arrays — the
    * exact integer sub-distance (arrays are equal-length at every call
    * site; min-length matches zip_with there).
    */
  def sqDistLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }
}

/** round(x·1000) per element of an array<float>, as array<long>. */
case class QuantizeMilli(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeBridge.AbstractType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize_milli"

  override protected def nullSafeEval(a: Any): Any =
    IntVecOps.quantizeMilli(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IntVecOps.quantizeMilli($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact integer squared L2 distance between two array<long> vectors. */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeBridge.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq_dist_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(IntVecOps.sqDistLong(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntVecOps.sqDistLong($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntVecFunctions {
  /** Column API: round(x·1000) quantization of an array<float>. */
  def quantizeMilliF(a: Column): Column =
    ColumnBridge.column(QuantizeMilli(ColumnBridge.expression(a)))

  /** Column API: exact integer Σ(a−b)² over array<long> columns. */
  def sqDistLongF(a: Column, b: Column): Column =
    ColumnBridge.column(SqDistLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
