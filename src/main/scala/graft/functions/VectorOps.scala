package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, LongType}

/** Vector kernels for the similarity operators. Native expressions: the
  * Column form (`aggregate(zip_with(transform(...), ...))`) evaluates
  * interpreted per element — the brute-force ANN scan spends its whole
  * budget there. Semantics are pinned to the Column form the DuckDB
  * oracles replay:
  *
  *  - [[QuantizedDot]]: Σ floor(aᵢ·1000)·floor(bᵢ·1000) as exact BIGINT —
  *    multiplication/floor in double (float inputs upcast exactly),
  *    accumulation in long, so the result is engine-neutral.
  *  - [[DotProduct]]: plain double dot, left-to-right accumulation.
  */
object VectorOps {
  /** Integer dot product of two int8 code vectors — the hot kernel of the
    * quantized ANN scan. Pure long arithmetic, no floats until the caller
    * rescales by the two vectors' scales. */
  def int8Dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    acc
  }

  def quantizedDot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += math.floor(x * 1000).toLong * math.floor(y * 1000).toLong
      i += 1
    }
    acc
  }

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

sealed trait VectorBinary extends BinaryExpression {
  protected def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, got ${l.catalogString}, ${r.catalogString}")
  }
}

case class QuantizedDot(left: Expression, right: Expression) extends VectorBinary {
  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.quantizedDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.quantizedDot($a, $b, ${isFloat(left)}, ${isFloat(right)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizedDot =
    copy(left = l, right = r)
}

case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "int8_dot"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ByteType, _), ArrayType(ByteType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<tinyint> arguments, got ${l.catalogString}, ${r.catalogString}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.int8Dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.int8Dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int8Dot =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression) extends VectorBinary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.dot($a, $b, ${isFloat(left)}, ${isFloat(right)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}
