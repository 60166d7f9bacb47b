package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Sign-random-projection LSH bucket of an embedding: bit j =
  * [⟨q(v), plane_j⟩ > 0], with deterministic Rademacher (±1) hyperplane
  * entries over the QUANTIZED vector q(v)ᵢ = ⌊vᵢ·1000⌋ — the projection
  * is an exact BIGINT sum, so bucket assignment is ENGINE-NEUTRAL: order
  * of accumulation cannot flip a sign the way a float sum could, and the
  * DuckDB oracle replays buckets bit-for-bit (same quantization as
  * [[QuantizedDot]]; the plane-sign mix replays as HUGEINT arithmetic —
  * all terms are non-negative, so bit 16 of the wrapped 64-bit product
  * equals bit 16 of the exact product). `table` selects an independent
  * plane family for multi-table LSH.
  *
  * A native expression, not a Column composition: the unrolled form is
  * `planes × dim` `element_at` terms — at 8 tables × 6 planes that is a
  * several-thousand-node tree whose Janino compilation takes minutes.
  * Here it is one static call wrapping a 2-level loop.
  */
object LshBucket {
  /** Deterministic ±1 entry for (plane j, dim d) — integer mixing only. */
  @inline def planeSign(j: Int, d: Int): Int = {
    val x = (j * 1000003L + d * 19349663L + 12289L) * 2654435761L
    if (((x >> 16) & 1L) == 1L) 1 else -1
  }

  def bucket(emb: ArrayData, planes: Int, table: Int, isFloat: Boolean): Long = {
    val n = emb.numElements()
    var sig = 0L
    var j = 0
    while (j < planes) {
      val pj = j + table * 1024
      var proj = 0L
      var d = 0
      while (d < n) {
        val v = if (isFloat) emb.getFloat(d).toDouble else emb.getDouble(d)
        val q = Math.floor(v * 1000.0).toLong
        proj += (if (planeSign(pj, d) > 0) q else -q)
        d += 1
      }
      if (proj > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

case class LshBucket(child: Expression, planes: Int, table: Int) extends UnaryExpression {
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) if planes >= 1 && planes <= 62 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket requires array<float|double> and 1<=planes<=62, got ${other.catalogString}")
  }
  override def prettyName: String = "lsh_bucket"

  override def nullSafeEval(input: Any): Any =
    LshBucket.bucket(input.asInstanceOf[ArrayData], planes, table, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshBucket.bucket($c, $planes, $table, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}
