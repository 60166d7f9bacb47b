package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-neutral polynomial rolling hash of a string's code points:
  * `h₀ = cp₀; hᵢ = (hᵢ₋₁·31 + cpᵢ) mod 1_000_000_007`; empty → 0.
  *
  * Used as the document/shingle/token fingerprint for the dedup operators
  * (builder prompt: "document fingerprinting (rolling hash)"). Deliberately
  * NOT Spark's Murmur3 `hash()`: the result must be reproducible by any
  * engine with 64-bit integer arithmetic (the DuckDB oracle recomputes it
  * with `list_reduce`), and the modulus keeps every intermediate < 2³⁵ so
  * no engine can overflow.
  *
  * A native codegen expression (same pattern as [[Unaccent]]) so it rides
  * inside whole-stage codegen in the hot path of shingling explodes.
  */
object RollingHash {
  val Mod: Long = 1000000007L

  /** Reference implementation — called from generated code too. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    var first = true
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = if (first) cp % Mod else (h * 31 + cp) % Mod
      first = false
      i += Character.charCount(cp)
    }
    h
  }
}

case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
