package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for [[Transliterate.ascii]] — the engine's
  * replacement for Postgres `UNACCENT` (`/root/reference/sql/4:32`) and
  * Python `unidecode` (`/root/reference/src/util.py:16`).
  *
  * A real expression (not a ScalaUDF) so it stays inside whole-stage codegen
  * with no closure boxing and null handling inherited from
  * `UnaryExpression.nullSafeEval` — this sits in the hot path of every alias
  * normalization at dataset-generation time.
  */
case class Unaccent(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  // ExpectsInputTypes is off-limits (AbstractDataType is private[sql] in
  // Spark 4), so the input check is spelled out.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unaccent requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "unaccent"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Transliterate.ascii(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Transliterate.ascii($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Unaccent =
    copy(child = newChild)
}
