package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The quality gate's `keep` verdict as ONE boolean kernel — the
  * gate-as-filter form of [[graft.operators.TextAnalysis.qualityGate]]
  * for pipelines that only apply the gate (the audit-grade per-signal
  * columns stay on `qualityGate`).
  *
  * Why a dedicated predicate expression exists at all: a curation stage
  * written as `docs.join(qualityGate(docs).filter($"keep"), id)` hands
  * Catalyst a filter whose condition INLINES the gate's signal columns —
  * predicate pushdown substitutes the full kernel subtree into every
  * conjunct (measured: 22 gate_stats occurrences in the optimized plan),
  * and `FilterExec` evaluates conjuncts independently, so the per-row
  * kernels run ~6× per document and the corpus self-joins on doc_id on
  * top. One opaque boolean expression is structurally immune: a single
  * conjunct, a single evaluation, fused map-side into the scan, no join
  * — the gate costs ZERO shuffle at any corpus size.
  *
  * Value contract: `docs.filter(qualityKeep(text, …))` keeps exactly the
  * rows `qualityGate(…).filter($"keep")` keeps (same thresholds, same
  * per-mille integer arithmetic, same null-text drop) — spec-pinned. */
final class QualityKeepKernel(
    stopwords: Array[String],
    minTokens: Long, maxTokens: Long,
    minMeanTokLenPermille: Long, maxMeanTokLenPermille: Long,
    minStopwordPermille: Long,
    maxTopGramPermille: Long,
    n: Int) extends Serializable {
  private val gate = new GateStatsKernel(stopwords)

  def eval(u: UTF8String): Boolean = {
    // ONE toString + tokenBounds pass shared by the stats and repetition
    // kernels (the lowercase stopword pass inside evalWith is separate by
    // contract — lowercasing can change char counts)
    val s = u.toString
    val bounds = TextHashes.tokenBounds(s)
    // token-count gate FIRST: it needs only the bounds, and the docs it
    // rejects include the over-long ones — exactly the rows where the
    // lowercase copy + stopword scan inside evalWith cost the most
    val nTokens = bounds.length.toLong
    if (nTokens < minTokens || nTokens > maxTokens) return false
    val gs = gate.evalWith(u, s, bounds)
    // perMille semantics: ⌊1000·num / den⌋, 0 when the denominator is 0
    val meanLen = if (nTokens == 0) 0L else 1000L * gs.getLong(1) / nTokens
    if (meanLen < minMeanTokLenPermille || meanLen > maxMeanTokLenPermille) return false
    val swPermille = if (nTokens == 0) 0L else 1000L * gs.getLong(2) / nTokens
    if (swPermille < minStopwordPermille) return false
    val rep = TextHashes.gramRepetition(s, bounds, n)
    val topGram =
      if (rep == null) 0L
      else {
        val nGrams = rep.getLong(0)
        if (nGrams == 0) 0L else 1000L * rep.getLong(2) / nGrams
      }
    topGram <= maxTopGramPermille
  }
}

/** Boolean gate verdict — see [[QualityKeepKernel]]. */
case class QualityKeep(
    child: Expression,
    stopwords: Seq[String],
    minTokens: Long, maxTokens: Long,
    minMeanTokLenPermille: Long, maxMeanTokLenPermille: Long,
    minStopwordPermille: Long,
    maxTopGramPermille: Long,
    n: Int) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quality_keep requires a string argument and n >= 1")
  override def prettyName: String = "quality_keep"
  @transient private lazy val kernel = new QualityKeepKernel(
    stopwords.toArray, minTokens, maxTokens,
    minMeanTokLenPermille, maxMeanTokLenPermille,
    minStopwordPermille, maxTopGramPermille, n)
  override def nullSafeEval(input: Any): Any =
    kernel.eval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qualityKeepKernel", kernel, classOf[QualityKeepKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.eval($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): QualityKeep =
    copy(child = newChild)
}
