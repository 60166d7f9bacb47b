package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Bpe

/** Per-row BPE application kernel — the trained [[Bpe.Model]] ships once
  * per executor as a codegen reference object (like every other kernel
  * in this package); per document it tokenizes whitespace words through
  * the greedy merge loop. Shared by [[BpeTokenCount]] (the pipeline-hot
  * count) and [[BpeTokens]] (the audit-grade token list). */
final class BpeKernel(model: Bpe.Model) extends Serializable {
  // word → token count memo: natural language repeats words Zipf-style
  // ("the" thousands of times per document), and the greedy merge loop
  // is O(L²) per call — the memo cuts the count to one merge loop per
  // TYPE per task. ThreadLocal because a codegen reference object can be
  // shared across a stage's tasks; size-capped so an adversarial
  // all-unique-words corpus bounds memory (the hot Zipf head fits long
  // before the cap).
  @transient private lazy val memo =
    ThreadLocal.withInitial[java.util.HashMap[String, Integer]](
      () => new java.util.HashMap[String, Integer](1 << 12))
  private val MaxMemo = 1 << 16

  private def countWord(w: String): Int = {
    val m = memo.get()
    val hit = m.get(w)
    if (hit != null) hit.intValue()
    else {
      val c = model.countTokens(w)
      if (m.size < MaxMemo) m.put(w, c)
      c
    }
  }

  def countTokens(u: UTF8String): Long = {
    val s = u.toString
    val bounds = TextHashes.tokenBounds(s)
    var total = 0L
    var i = 0
    while (i < bounds.length) {
      val a = (bounds(i) >>> 32).toInt
      total += countWord(s.substring(a, bounds(i).toInt))
      i += 1
    }
    total
  }

  def tokens(u: UTF8String): ArrayData = {
    val s = u.toString
    val bounds = TextHashes.tokenBounds(s)
    val out = Array.newBuilder[Any]
    var i = 0
    while (i < bounds.length) {
      val a = (bounds(i) >>> 32).toInt
      val toks = model.tokenize(s.substring(a, bounds(i).toInt))
      var t = 0
      while (t < toks.length) { out += UTF8String.fromString(toks(t)); t += 1 }
      i += 1
    }
    new GenericArrayData(out.result())
  }
}

/** EXACT token count of a document under a trained BPE merge table —
  * the number the training pipeline's budget/packing stages actually
  * want (compare `TextAnalysis.bpeishCount`'s regex proxy). */
case class BpeTokenCount(child: Expression, model: Bpe.Model) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "bpe_token_count"
  @transient private lazy val kernel = new BpeKernel(model)
  override def nullSafeEval(input: Any): Any =
    kernel.countTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeKernel", kernel, classOf[BpeKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** The document's BPE token sequence (word-major order, `</w>`-marked
  * word finals) — the audit/debug twin of [[BpeTokenCount]]. */
case class BpeTokens(child: Expression, model: Bpe.Model) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "bpe_tokens"
  @transient private lazy val kernel = new BpeKernel(model)
  override def nullSafeEval(input: Any): Any =
    kernel.tokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeKernel", kernel, classOf[BpeKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.tokens($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}
