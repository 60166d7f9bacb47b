package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The canonical shared deletion variant of a pair with `lev(a,b) ≤ 1` —
  * computed ARITHMETICALLY in O(|a|+|b|), no neighborhood materialization:
  *
  *   - `a == b`           → `a` (itself — always in both neighborhoods)
  *   - `|a| == |b| ± 1`   → the shorter string if deleting the longer's
  *                          first-mismatch character makes them equal
  *                          (single insert/delete); otherwise `lev ≥ 2` →
  *                          null
  *   - `|a| == |b|, a≠b`  → if the suffixes after the first mismatching
  *                          position `i` agree, the pair is a single
  *                          substitution and deleting `i` from either side
  *                          gives the same string; otherwise `lev ≥ 2` → null
  *   - otherwise          → null (`lev ≥ 2` by length — no witness)
  *
  * Replaces [[MinCommonVariant]] in the hot verify filter of the blocked
  * levenshtein join: both select exactly ONE row per matching pair (any
  * deterministic member of the shared-variant set works — minimality was
  * never required), but MinCommonVariant re-generates BOTH neighborhoods
  * per candidate row (O(|a|²+|b|²) substring allocations + a hash set)
  * while the witness is one string compare and at most one substring.
  */
object Lev1Witness {
  def compute(a: UTF8String, b: UTF8String): UTF8String = {
    val sa = a.toString
    val sb = b.toString
    if (sa == sb) return a
    val la = sa.length
    val lb = sb.length
    // |a| = |b| + 1: the shorter is a witness only if it really is a
    // single deletion of the longer — skip the longer's first mismatching
    // char and require the tails to agree (self-containment for
    // standalone SQL use; lev('abc','xy') must yield null, not 'xy')
    if (math.abs(la - lb) == 1) {
      val (long, short, witness) = if (la > lb) (sa, sb, b) else (sb, sa, a)
      var i = 0
      while (i < short.length && long.charAt(i) == short.charAt(i)) i += 1
      var j = i
      while (j < short.length && long.charAt(j + 1) == short.charAt(j)) j += 1
      return if (j == short.length) witness else null // 2nd mismatch → lev ≥ 2
    }
    if (la != lb) return null // length gap ≥ 2 → lev ≥ 2
    var i = 0
    while (i < la && sa.charAt(i) == sb.charAt(i)) i += 1
    // self-contained for standalone SQL use: a deleted-first-mismatch string
    // is only a shared variant when the tails agree (single substitution);
    // equal-length pairs with lev ≥ 2 must yield null, not a bogus witness.
    // Still O(|a|): one more linear scan over the suffix.
    var j = i + 1
    while (j < la && sa.charAt(j) == sb.charAt(j)) j += 1
    if (j < la) return null // second mismatch → lev ≥ 2
    UTF8String.fromString(sa.substring(0, i) + sa.substring(i + 1))
  }
}

case class Lev1Witness(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lev1_witness requires two string arguments")
  override def prettyName: String = "lev1_witness"

  override def nullSafeEval(a: Any, b: Any): Any =
    Lev1Witness.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  // result is null for non-null inputs when the lengths differ by ≥ 2
  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""${ev.value} = graft.functions.Lev1Witness.compute($a, $b);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Lev1Witness =
    copy(left = l, right = r)
}
