package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused language-ID kernel: argmax of stopword-evidence counts, ties to
  * the earlier profile (alphabetical), zero evidence → "und" — semantically
  * identical to the Column fold in
  * [[graft.operators.TextAnalysis.langId]]'s previous HOF formulation, but
  * one tokenizing pass per row. The fold form nested every per-language
  * score inside every later comparison (≈2× tree growth per profile) and
  * evaluated interpreted (lambda HOFs leave whole-stage codegen), which
  * made language-ID the dominant cost wherever it was inlined more than
  * once (q36's sampling filter inlines it three times).
  *
  * Lowercasing uses UTF8String.toLowerCase — the exact `lower()` the SQL
  * form applied. Tokenization is Java-regex `\s+` semantics (ASCII
  * whitespace), the same split the Column form and the DuckDB oracle use.
  */
object LangIdKernel {
  private val profiles = graft.operators.TextAnalysis.StopwordProfiles
  private val langNames: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1)).toArray
  private val und = UTF8String.fromString("und")
  /** word → indexes of the profiles containing it (words CAN repeat across
    * profiles: "de"/"la" are stopwords of several languages). */
  private val wordLangs: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    profiles.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val prev = Option(m.get(w)).getOrElse(Array.empty[Int])
        m.put(w, prev :+ i)
      }
    }
    m
  }

  @inline private def isWs(c: Char): Boolean = TextHashes.isWs(c)

  def eval(u: UTF8String): UTF8String = {
    val s = u.toLowerCase.toString
    val counts = new Array[Int](langNames.length)
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) {
        val hit = wordLangs.get(s.substring(start, i))
        if (hit != null) {
          var j = 0
          while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
        }
      }
    }
    var best = 0
    var bestCount = counts(0)
    var k = 1
    while (k < counts.length) {
      if (counts(k) > bestCount) { best = k; bestCount = counts(k) }
      k += 1
    }
    if (bestCount == 0) und else langNames(best)
  }
}

case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "lang_id"
  override def nullSafeEval(input: Any): Any =
    LangIdKernel.eval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdKernel.eval($c)")
  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}
