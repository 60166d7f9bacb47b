package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SimHash over a bag of token hashes (Charikar 2002, the near-dup
  * fingerprint used by large-scale web dedup pipelines): for each bit
  * position, sum +1/-1 over all token hashes depending on that hash's bit,
  * then keep the sign. Token multiplicity is the term weight (duplicates
  * intentionally count).
  *
  * 30 bits, not 64: token hashes come from [[RollingHash]] whose range is
  * `[0, 1e9+7) < 2³⁰` — higher bits carry no entropy. The DuckDB oracle
  * reproduces the signature with per-bit `list_sum` over `(h >> b) & 1`.
  *
  * Near-dup pairs at scale: band the 30 bits into 3×10-bit chunks —
  * hamming distance ≤ 2 guarantees one equal chunk (pigeonhole), so
  * candidates come from three equi-joins, then `bit_count(xor)` verifies.
  */
object SimHash {
  val Bits = 30

  /** Null entries in the array are ignored. Empty/all-null → 0. */
  def hash(arr: ArrayData): Long = {
    val counts = new Array[Int](Bits)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < Bits) {
          counts(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

case class SimHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<bigint>, got ${other.catalogString}")
  }
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any =
    SimHash.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}
