package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Structural (tokenizer-based) HTML text extraction — the fidelity tier
  * above [[graft.operators.TextAnalysis.stripMarkup]]'s regex chain, with
  * the same contract (drop script/style WITH payload, drop tags, unescape
  * entities, collapse whitespace) plus what only a real tokenizer can do:
  *
  *   - quote-aware attribute scanning: a `>` inside a quoted attribute
  *     value (`<div title="a>b">`) does not end the tag — the regex tier
  *     provably truncates there and leaks `b">` into the prose;
  *   - `<pre>` fidelity: whitespace inside `<pre>` elements is preserved
  *     verbatim (code indentation is content); outside, runs collapse to
  *     one space exactly like the regex tier;
  *   - attribute text: `alt`/`title` values are human-readable prose and
  *     can be emitted as text (`attrText = true`) — attribute-aware
  *     extraction the regex tier cannot express;
  *   - numeric character references (`&#65;`, `&#x1F600;`) decode, along
  *     with the same six named entities as the regex tier (`&amp;` decodes
  *     in-pass, so double-escaped `&amp;lt;` yields literal `&lt;` — the
  *     HTML-correct order falls out of single-pass scanning);
  *   - EOF-in-tag drops the partial tag (HTML5 tokenizer behavior) instead
  *     of leaking `<div class="x` verbatim like an unmatched regex.
  *
  * Hand-rolled single pass, zero dependencies, one `StringBuilder` — no
  * tree building (malformed nesting like `<b><i>x</b></i>` is a tokenizer
  * non-event). Bogus-comment handling follows HTML5: `<!...>`, `<?...>`
  * and `</` + non-letter consume to the next `>`. Rawtext elements
  * (script/style) skip payload to a case-insensitive `</name` closer
  * followed by whitespace, `/` or `>`, even when that closer carries
  * attributes (`</script foo>` still closes).
  */
object HtmlTextKernel {

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
  private def isRawtext(name: String): Boolean =
    name == "script" || name == "style"

  def eval(u: UTF8String, attrText: Boolean): UTF8String = {
    val s = u.toString
    val n = s.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 12))
    var pendingWs = false
    var preDepth = 0

    def emitChar(c: Char): Unit =
      if (isWs(c)) {
        // inside <pre>, real whitespace is content (verbatim) and
        // supersedes any pending tag separator; outside, it collapses
        if (preDepth > 0) { pendingWs = false; out.append(c) }
        else pendingWs = true
      } else {
        if (pendingWs && out.length > 0) out.append(' ')
        pendingWs = false
        out.append(c)
      }

    // a tag is a separator, like the regex tier's tag -> " " replacement;
    // flushed as one space before the next non-ws char (or superseded by
    // real whitespace inside <pre>)
    def emitSep(): Unit = pendingWs = true

    /** Decode the character reference starting at `t(start) == '&'`; emit
      * and return the index after it, or emit a literal '&' on no match. */
    def emitEntity(t: String, start: Int, limit: Int): Int = {
      var j = start + 1
      if (j < limit && t.charAt(j) == '#') {
        j += 1
        val hex = j < limit && (t.charAt(j) == 'x' || t.charAt(j) == 'X')
        if (hex) j += 1
        val dStart = j
        var cp = 0L
        var ok = true
        while (ok && j < limit && j - dStart < 7) {
          val c = t.charAt(j)
          val d =
            if (c >= '0' && c <= '9') c - '0'
            else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
            else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
            else -1
          if (d < 0) ok = false else { cp = cp * (if (hex) 16 else 10) + d; j += 1 }
        }
        if (j < limit && t.charAt(j) == ';' && j > dStart && cp > 0 && cp <= 0x10FFFF
            && !(cp >= 0xD800 && cp <= 0xDFFF)) {
          Character.toChars(cp.toInt).foreach(emitChar)
          j + 1
        } else { emitChar('&'); start + 1 }
      } else {
        var semi = -1
        var k = start + 1
        while (semi < 0 && k < limit && k - start <= 6) {
          if (t.charAt(k) == ';') semi = k else k += 1
        }
        val rep = if (semi < 0) null else t.substring(start + 1, semi) match {
          // the regex tier's named set plus `apos` (the regex tier covers
          // the apostrophe only in numeric form &#39; — a deliberate
          // fidelity divergence of this tier, like numeric char refs)
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case "amp" => "&"
          case "nbsp" => " "
          case _ => null
        }
        if (rep != null) { emitChar(rep.charAt(0)); semi + 1 }
        else { emitChar('&'); start + 1 }
      }
    }

    def emitRun(t: String, from: Int, to: Int): Unit = {
      var k = from
      while (k < to) {
        val c = t.charAt(k)
        if (c == '&') k = emitEntity(t, k, to) else { emitChar(c); k += 1 }
      }
    }

    /** Parse an open/close tag at `s(lt) == '<'`: quote-aware attribute
      * scan to the unquoted `>`, pre-depth bookkeeping, optional alt/title
      * emission, rawtext payload skip. Returns the index after everything
      * consumed. */
    def parseTag(lt: Int): Int = {
      var j = lt + 1
      val closing = s.charAt(j) == '/'
      if (closing) j += 1
      val nameStart = j
      while (j < n && (isAlpha(s.charAt(j)) ||
        (s.charAt(j) >= '0' && s.charAt(j) <= '9') ||
        s.charAt(j) == '-' || s.charAt(j) == '_')) j += 1
      val name = s.substring(nameStart, j).toLowerCase
      var selfClosing = false
      var done = false
      while (!done && j < n) {
        val c = s.charAt(j)
        if (c == '>') { j += 1; done = true }
        else if (c == '/' && j + 1 < n && s.charAt(j + 1) == '>') {
          selfClosing = true; j += 2; done = true
        } else if (isWs(c) || c == '/') j += 1
        else {
          val aStart = j
          while (j < n && !isWs(s.charAt(j)) && s.charAt(j) != '=' &&
            s.charAt(j) != '>' && s.charAt(j) != '/') j += 1
          val aName = s.substring(aStart, j).toLowerCase
          while (j < n && isWs(s.charAt(j))) j += 1
          var vStart = -1
          var vEnd = -1
          if (j < n && s.charAt(j) == '=') {
            j += 1
            while (j < n && isWs(s.charAt(j))) j += 1
            if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
              val q = s.charAt(j); j += 1
              vStart = j
              while (j < n && s.charAt(j) != q) j += 1
              vEnd = j
              if (j < n) j += 1
            } else {
              vStart = j
              while (j < n && !isWs(s.charAt(j)) && s.charAt(j) != '>') j += 1
              vEnd = j
            }
          }
          if (!closing && attrText && vStart >= 0 &&
            (aName == "alt" || aName == "title")) {
            emitSep(); emitRun(s, vStart, vEnd); emitSep()
          }
        }
      }
      emitSep() // EOF-in-tag included: the partial tag itself emits nothing
      // HTML5 IGNORES the self-closing flag on non-void elements:
      // <pre/> opens a pre and <script/> opens a script whose payload
      // runs to the real closer — honoring the slash here leaked script
      // source into the extracted prose on XHTML-style crawl markup
      if (name == "pre") {
        if (closing) preDepth = math.max(0, preDepth - 1)
        else preDepth += 1
      }
      if (!closing && done && isRawtext(name)) skipRawtext(j, name)
      else j
    }

    /** Skip a rawtext payload to its case-insensitive `</name` closer with
      * a legal follow char; the closer itself goes through [[parseTag]]
      * (it may carry attributes and still closes). */
    def skipRawtext(from: Int, name: String): Int = {
      var j = from
      while (j < n) {
        if (s.charAt(j) == '<' && j + 2 + name.length <= n && s.charAt(j + 1) == '/') {
          var k = 0
          while (k < name.length && lower(s.charAt(j + 2 + k)) == name.charAt(k)) k += 1
          if (k == name.length) {
            val after = j + 2 + name.length
            if (after >= n || isWs(s.charAt(after)) ||
              s.charAt(after) == '/' || s.charAt(after) == '>')
              return parseTag(j)
          }
        }
        j += 1
      }
      n
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (isAlpha(c1)) i = parseTag(i)
        else if (c1 == '/' && i + 2 < n && isAlpha(s.charAt(i + 2))) i = parseTag(i)
        else if (c1 == '!' && s.startsWith("<!--", i)) {
          // search from i+2, not past the opener: HTML5 closes the
          // degenerate empty comments <!--> and <!---> immediately (their
          // closer OVERLAPS the opening dashes) — searching from i+4
          // swallowed the whole rest of the document on that common
          // crawl artifact
          val e = s.indexOf("-->", i + 2)
          i = if (e < 0) n else e + 3
          emitSep()
        } else if (c1 == '!' || c1 == '?' || c1 == '/') {
          // bogus comment (HTML5): consume to the next '>'
          val e = s.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
          emitSep()
        } else { emitChar('<'); i += 1 }
      } else if (c == '&') {
        i = emitEntity(s, i, n)
      } else { emitChar(c); i += 1 }
    }
    UTF8String.fromString(out.toString.trim)
  }
}

/** Catalyst surface of [[HtmlTextKernel]] — codegen'd static call, stays
  * inside whole-stage codegen like the regex tier it upgrades. */
case class HtmlText(child: Expression, attrText: Boolean) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_text requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "html_text"
  override def nullSafeEval(input: Any): Any =
    HtmlTextKernel.eval(input.asInstanceOf[UTF8String], attrText)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlTextKernel.eval($c, $attrText)")
  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}
