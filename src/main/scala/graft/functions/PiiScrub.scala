package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass PII scrub — the fused form of [[graft.operators.Pii]]'s
  * three chained `regexp_replace` passes (email → phone → IPv4, each a
  * full regex scan plus a rebuilt intermediate string; at 10M docs the
  * chain was the dominant cost of the scrub+lang-id curation stage).
  * This kernel walks the UTF-8 bytes ONCE and emits placeholders
  * in-stream. Output contract: byte-identical to the staged regex
  * composition for every input (property- and golden-pinned in
  * `PiiSpec`) — the DuckDB oracle keeps replaying the regex chain.
  *
  * Why a priority scan (email > phone > IP at each position) IS the
  * staged composition:
  *  - every phone character (`+`, digits) and IP character (digits,
  *    dots) is also an email local-part character, so an email match
  *    overlapping a phone/IP candidate always extends its start
  *    leftward through that candidate — if the email pass would win
  *    anywhere, the combined scan meets it first;
  *  - after a failed email attempt no email can start inside the same
  *    local-character run (the run reaches the same `@`/domain, so all
  *    starts fail alike) — the scan memoizes the run end and skips
  *    re-attempts, keeping the walk linear;
  *  - `\b` guards are evaluated against the REWRITTEN stream (the
  *    placeholder's `>` creates boundaries the original text lacks —
  *    e.g. `a@b.cc1.2.3.4` scrubs to `<EMAIL><IP>` because the IP's
  *    leading boundary comes from the placeholder), which is exactly
  *    what the later regex passes see; trailing guards may read the
  *    original bytes because a later-pass match can never begin at a
  *    guarded position (the absorption argument above).
  *
  * All pattern characters are ASCII and UTF-8 continuation bytes are
  * ≥ 0x80, so the byte-level walk can never split or misread a
  * multi-byte code point when matching classes; `\b` checks decode the
  * neighbouring codepoint because Java's default word test is
  * Unicode-aware (see [[isWordCp]]). */
object PiiScrubKernel {
  private val Email = "<EMAIL>".getBytes
  private val Phone = "<PHONE>".getBytes
  private val Ip = "<IP>".getBytes

  @inline private def isDigit(c: Byte): Boolean = c >= '0' && c <= '9'
  @inline private def isAlpha(c: Byte): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  // java.util.regex \b is Unicode-aware even WITHOUT
  // UNICODE_CHARACTER_CLASS: its word test is
  // `ch == '_' || Character.isLetterOrDigit(ch)` (so 'é' and '日' are
  // word chars and "é1.2.3.4é" does NOT scrub — probed against the JDK,
  // golden-pinned in PiiSpec). Non-ASCII neighbours therefore need a
  // codepoint decode; ASCII stays on the byte fast path.
  @inline private def isWordAscii(c: Byte): Boolean =
    isAlpha(c) || isDigit(c) || c == '_'
  @inline private def isWordCp(cp: Int): Boolean =
    cp == '_' || (cp >= 0 && Character.isLetterOrDigit(cp))

  /** Codepoint starting at `p` (-1 for truncated/stray bytes — treated
    * non-word, which matches the regex never seeing such a char). */
  private def cpAt(a: Array[Byte], p: Int, n: Int): Int = {
    val b0 = a(p) & 0xFF
    if (b0 < 0x80) b0
    else if (b0 < 0xC0) -1
    else if (b0 < 0xE0) {
      if (p + 1 < n) ((b0 & 0x1F) << 6) | (a(p + 1) & 0x3F) else -1
    } else if (b0 < 0xF0) {
      if (p + 2 < n) ((b0 & 0x0F) << 12) | ((a(p + 1) & 0x3F) << 6) | (a(p + 2) & 0x3F)
      else -1
    } else {
      if (p + 3 < n)
        ((b0 & 0x07) << 18) | ((a(p + 1) & 0x3F) << 12) |
          ((a(p + 2) & 0x3F) << 6) | (a(p + 3) & 0x3F)
      else -1
    }
  }

  /** Word-ness of the char ENDING at index `end - 1` (walks back over
    * UTF-8 continuation bytes). */
  private def wordEndsAt(a: Array[Byte], end: Int): Boolean = {
    val last = a(end - 1)
    if (last >= 0) isWordAscii(last)
    else {
      var s = end - 1
      while (s > 0 && (a(s) & 0xC0) == 0x80) s -= 1
      isWordCp(cpAt(a, s, end))
    }
  }

  /** Word-ness of the char STARTING at `i` (end of string = non-word). */
  @inline private def wordStartsAt(a: Array[Byte], i: Int, n: Int): Boolean =
    i < n && {
      val c = a(i)
      if (c >= 0) isWordAscii(c) else isWordCp(cpAt(a, i, n))
    }
  @inline private def isLocal(c: Byte): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '_' || c == '%' || c == '+' || c == '-'
  @inline private def isDomain(c: Byte): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '-'

  /** [A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,} starting AT `p`:
    * end index (exclusive) or -1. Greedy-with-backtracking domain = the
    * LARGEST dot followed by ≥2 letters inside the domain run; the tld
    * then extends through its whole letter run. */
  private def emailEnd(b: Array[Byte], p: Int, n: Int): Int = {
    var i = p
    while (i < n && isLocal(b(i))) i += 1
    if (i == p || i >= n || b(i) != '@') return -1
    val dStart = i + 1
    var j = dStart
    while (j < n && isDomain(b(j))) j += 1
    if (j == dStart) return -1
    var d = j - 1
    while (d > dStart) { // d >= dStart+1: the A+ before the dot is nonempty
      if (b(d) == '.' && d + 2 < n && isAlpha(b(d + 1)) && isAlpha(b(d + 2))) {
        var k = d + 1
        while (k < n && isAlpha(b(k))) k += 1
        return k
      }
      d -= 1
    }
    -1
  }

  /** \+\d{7,15}\b at `p` (b(p) == '+'): end or -1. A digit run longer
    * than 15 can never satisfy the trailing boundary by backtracking
    * (every shorter prefix ends digit-before-digit), so it fails whole. */
  private def phoneEnd(b: Array[Byte], p: Int, n: Int): Int = {
    var i = p + 1
    while (i < n && isDigit(b(i))) i += 1
    val d = i - (p + 1)
    if (d >= 7 && d <= 15 && !wordStartsAt(b, i, n)) i else -1
  }

  /** (?:\d{1,3}\.){3}\d{1,3}\b at `p` (leading \b checked by caller):
    * end or -1. Inside the first three octets the dot must sit exactly
    * at the end of a ≤3-digit run (a longer run leaves digit-before-dot
    * unreachable by backtracking); the last octet needs a non-word
    * follower the same way the phone tail does. */
  private def ipEnd(b: Array[Byte], p: Int, n: Int): Int = {
    var i = p
    var octet = 0
    while (octet < 3) {
      var r = 0
      while (i + r < n && isDigit(b(i + r))) r += 1
      if (r < 1 || r > 3 || i + r >= n || b(i + r) != '.') return -1
      i += r + 1
      octet += 1
    }
    var r = 0
    while (i + r < n && isDigit(b(i + r))) r += 1
    if (r < 1 || r > 3 || wordStartsAt(b, i + r, n)) return -1
    i + r
  }

  def scrub(u: UTF8String): UTF8String = {
    val b = u.getBytes
    val n = b.length
    var out: Array[Byte] = null // allocated on first match; null = untouched
    var outLen = 0
    def ensure(extra: Int): Unit = {
      if (out.length - outLen < extra) {
        val grown = new Array[Byte](math.max(out.length * 2, outLen + extra + 16))
        System.arraycopy(out, 0, grown, 0, outLen)
        out = grown
      }
    }
    def emit(ph: Array[Byte], pos: Int): Unit = {
      if (out == null) {
        out = new Array[Byte](n + 32)
        System.arraycopy(b, 0, out, 0, pos)
        outLen = pos
      }
      ensure(ph.length)
      System.arraycopy(ph, 0, out, outLen, ph.length)
      outLen += ph.length
    }
    // word-ness of the char preceding `pos` in the REWRITTEN stream
    // (string start counts as a boundary)
    @inline def prevIsWord(pos: Int): Boolean =
      if (out != null) outLen > 0 && wordEndsAt(out, outLen)
      else pos > 0 && wordEndsAt(b, pos)

    var pos = 0
    var emailSkipUntil = 0
    while (pos < n) {
      val c = b(pos)
      var next = -1
      if (isLocal(c)) {
        if (pos >= emailSkipUntil) {
          val e = emailEnd(b, pos, n)
          if (e > 0) { emit(Email, pos); next = e }
          else {
            var i = pos
            while (i < n && isLocal(b(i))) i += 1
            emailSkipUntil = i
          }
        }
        if (next < 0 && c == '+') {
          val e = phoneEnd(b, pos, n)
          if (e > 0) { emit(Phone, pos); next = e }
        }
        if (next < 0 && isDigit(c) && !prevIsWord(pos)) {
          val e = ipEnd(b, pos, n)
          if (e > 0) { emit(Ip, pos); next = e }
        }
      }
      if (next >= 0) pos = next
      else {
        if (out != null) { ensure(1); out(outLen) = c; outLen += 1 }
        pos += 1
      }
    }
    if (out == null) u
    else UTF8String.fromBytes(java.util.Arrays.copyOf(out, outLen))
  }
}

/** Catalyst surface of [[PiiScrubKernel]] — codegen'd static call, stays
  * inside whole-stage codegen like the regex chain it replaces. */
case class PiiScrub(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pii_scrub requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "pii_scrub"
  override def nullSafeEval(input: Any): Any =
    PiiScrubKernel.scrub(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiScrubKernel.scrub($c)")
  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)
}
