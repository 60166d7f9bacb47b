package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → n-gram → [[RollingHash]] kernels. Semantically equal to
  * the Column composition
  * `transform(array_distinct(transform(seq, slice+concat_ws)), rollingHash)`
  * but those higher-order functions evaluate interpreted (no whole-stage
  * codegen), and profiling showed the HOF chain dominating the dedup
  * queries (~2.5 s per pass over 5000 docs at sf0.1, recomputed per join
  * side). One native expression = one tight loop per row.
  *
  * Tokenization matches Java/RE2 `\s+` on ASCII: space, \t, \n, \u000B,
  * \f, \r — the same set the DuckDB oracle's `string_split_regex` uses.
  */
object TextHashes {
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def tokenBounds(s: String): mutable.ArrayBuffer[(Int, Int)] = {
    val bounds = new mutable.ArrayBuffer[(Int, Int)]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) bounds += ((start, i))
    }
    bounds
  }

  /** Rolling-hash fold of s[from,until) continuing from state (h, first). */
  @inline private def foldRange(s: String, from: Int, until: Int, h0: Long, first0: Boolean): (Long, Boolean) = {
    var h = h0
    var first = first0
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      h = if (first) cp % RollingHash.Mod else (h * 31 + cp) % RollingHash.Mod
      first = false
      i += Character.charCount(cp)
    }
    (h, first)
  }

  /** [[RollingHash]] of every whitespace token, duplicates kept (term
    * frequency is the SimHash weight). */
  def tokenHashes(u: UTF8String): ArrayData = {
    val s = u.toString
    val bounds = tokenBounds(s)
    val out = new Array[Any](bounds.length)
    var i = 0
    while (i < bounds.length) {
      val (a, b) = bounds(i)
      out(i) = foldRange(s, a, b, 0L, first0 = true)._1
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct [[RollingHash]] values of all space-joined word n-grams,
    * first-occurrence order (= `array_distinct` semantics). */
  def shingleHashes(u: UTF8String, n: Int): ArrayData = {
    val seen = new mutable.LinkedHashSet[Long]()
    eachShingleHash(u, n)(seen += _)
    new GenericArrayData(seen.toArray.map(_.asInstanceOf[Any]))
  }

  /** [[shingleHashes]] WITHOUT dedup — the occurrence multiset the
    * repetition-quality signals count over. */
  def shingleHashesAll(u: UTF8String, n: Int): ArrayData = {
    val out = new mutable.ArrayBuffer[Any]()
    eachShingleHash(u, n)(h => out += h)
    new GenericArrayData(out.toArray)
  }

  /** Distinct space-joined word n-grams as STRINGS, first-occurrence
    * order — the surface form for boilerplate mining ([[Shingles]]), where
    * the output feeds a human-readable blocklist rather than a hash join.
    * Same tokenization and windowing as [[shingleHashes]]. */
  def shingles(u: UTF8String, n: Int): ArrayData = {
    val s = u.toString
    val bounds = tokenBounds(s)
    if (bounds.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[String]()
    var g = 0
    while (g <= bounds.length - n) {
      val sb = new java.lang.StringBuilder(bounds(g + n - 1)._2 - bounds(g)._1)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        val (a, b) = bounds(g + t)
        sb.append(s, a, b)
        t += 1
      }
      seen += sb.toString
      g += 1
    }
    new GenericArrayData(seen.toArray.map(g => UTF8String.fromString(g): Any))
  }

  /** Rewrite `s` with the token index ranges [startsᵢ, endsᵢ) cut out —
    * the APPLY step of exact-substring dedup
    * ([[graft.operators.Dedup.duplicateSpans]] produces the mask). Kept
    * tokens are re-joined with single spaces (the tokenizer's
    * whitespace-normalized contract); a fully-masked or token-free doc
    * becomes "". Spans may overlap or arrive unsorted (they are sorted by
    * start here); out-of-range indices are harmless; mismatched array
    * lengths throw (a corrupt mask must not pass silently).
    * O(n + k log k). */
  def removeSpans(u: UTF8String, starts: ArrayData, ends: ArrayData): UTF8String = {
    val k = starts.numElements()
    // a corrupt mask must fail loudly — silently ignoring tail spans
    // would let duplicated runs survive the "deduplicated" output
    require(ends.numElements() == k,
      s"remove_token_spans: starts has $k elements, ends has ${ends.numElements()}")
    val s = u.toString
    val bounds = tokenBounds(s)
    val order = Array.range(0, k).sortBy(starts.getLong)
    val sb = new java.lang.StringBuilder(s.length)
    var si = 0
    var activeEnd = Long.MinValue
    var t = 0
    var firstOut = true
    while (t < bounds.length) {
      while (si < k && starts.getLong(order(si)) <= t) {
        val e = ends.getLong(order(si))
        if (e > activeEnd) activeEnd = e
        si += 1
      }
      if (t >= activeEnd) {
        if (!firstOut) sb.append(' ')
        val (a, b) = bounds(t)
        sb.append(s, a, b)
        firstOut = false
      }
      t += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Base-37 twin of [[foldRange]] — the independent second hash. A
    * SALTED base-31 hash is NOT independent: for equal-length strings
    * H(salt+x) is an affine function of the base-31 polynomial of x, so
    * every equal-length collision survives salting (caught by the
    * collision spec). A different base is a genuinely different linear
    * combination of the code points. */
  @inline private def foldRange37(s: String, from: Int, until: Int, h0: Long, first0: Boolean): (Long, Boolean) = {
    var h = h0
    var first = first0
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      h = if (first) cp % RollingHash.Mod else (h * 37 + cp) % RollingHash.Mod
      first = false
      i += Character.charCount(cp)
    }
    (h, first)
  }

  /** [[shingleHashesAll]] in a ~60-bit key space: per gram,
    * h1 · Mod + h2, with h1 the plain base-31 rolling hash and h2 its
    * base-37 twin (both < Mod = 1e9+7, so the combination is exact in
    * a signed 64-bit long AND in the oracle's BIGINT arithmetic).
    *
    * Why it exists: any GLOBAL distinctness test over gram hashes — the
    * duplicate-span criterion "this gram occurs ≥ 2 times in the corpus"
    * — saturates a ~2³⁰ key space by birthday collision long before
    * 100 TB: at 10⁹ grams (a mere 10M docs) nearly EVERY hash value is
    * hit twice, so almost every gram looks duplicated and span removal
    * masks whole documents (measured: 2.2M of 8.4M docs emptied).
    * Threshold-protected consumers (Jaccard/contamination pair counts)
    * tolerate the narrow space; a ≥2-on-a-single-key criterion cannot.
    * Collisions in the ~10¹⁸ combined space need both independent
    * rolling hashes to collide: ~10¹² corpus grams yield ≈ a dozen
    * expected false pairs — noise, not saturation. */
  def shingleHashesWideAll(u: UTF8String, n: Int): ArrayData = {
    val out = new mutable.ArrayBuffer[Any]()
    eachShingleHashWide(u, n)((w: Long) => out += w)
    new GenericArrayData(out.toArray)
  }

  /** One-pass per-document repetition summary over the n-gram occurrence
    * multiset: (n_grams, n_distinct_grams, max_gram_count), or null when
    * the doc has fewer than `n` tokens (the aggregate form's "absent"
    * rows). Same hash space as [[shingleHashesAll]], so it is value-
    * identical to exploding that multiset and counting — but it runs
    * map-side in the scan: the whole repetition signal of a 100 TB gate
    * pass costs ZERO shuffle, vs. the corpus-gram-mass (doc, hash)
    * exchange of the aggregate form. Sort-and-scan over the ~tokens-sized
    * local array, no per-row hash map. */
  def gramRepetition(u: UTF8String, n: Int): InternalRow = {
    val buf = new mutable.ArrayBuilder.ofLong()
    eachShingleHash(u, n)(buf += _)
    val arr = buf.result()
    if (arr.isEmpty) return null
    java.util.Arrays.sort(arr)
    var distinct = 0L
    var maxC = 0L
    var i = 0
    while (i < arr.length) {
      var j = i
      while (j < arr.length && arr(j) == arr(i)) j += 1
      distinct += 1
      if (j - i > maxC) maxC = j - i
      i = j
    }
    new GenericInternalRow(Array[Any](arr.length.toLong, distinct, maxC))
  }

  @inline private def eachShingleHashWide(u: UTF8String, n: Int)(emit: Long => Unit): Unit = {
    val s = u.toString
    val bounds = tokenBounds(s)
    if (bounds.length < n) return
    var g = 0
    while (g <= bounds.length - n) {
      var h1 = 0L
      var first1 = true
      var h2 = 0L
      var first2 = true
      var t = 0
      while (t < n) {
        if (t > 0) { // the joining space, cp 32
          h1 = if (first1) 32L else (h1 * 31 + 32L) % RollingHash.Mod
          first1 = false
          h2 = if (first2) 32L else (h2 * 37 + 32L) % RollingHash.Mod
          first2 = false
        }
        val (a, b) = bounds(g + t)
        val r1 = foldRange(s, a, b, h1, first1)
        h1 = r1._1; first1 = r1._2
        val r2 = foldRange37(s, a, b, h2, first2)
        h2 = r2._1; first2 = r2._2
        t += 1
      }
      emit(h1 * RollingHash.Mod + h2)
      g += 1
    }
  }

  @inline private def eachShingleHash(u: UTF8String, n: Int)(emit: Long => Unit): Unit = {
    val s = u.toString
    val bounds = tokenBounds(s)
    if (bounds.length < n) return
    var g = 0
    while (g <= bounds.length - n) {
      var h = 0L
      var first = true
      var t = 0
      while (t < n) {
        if (t > 0) { // the joining space, cp 32
          h = if (first) 32L else (h * 31 + 32L) % RollingHash.Mod
          first = false
        }
        val (a, b) = bounds(g + t)
        val r = foldRange(s, a, b, h, first)
        h = r._1; first = r._2
        t += 1
      }
      emit(h)
      g += 1
    }
  }
}

/** Occurrence-multiset n-gram hashes in the ~60-bit combined key space —
  * see [[TextHashes.shingleHashesWideAll]] for the saturation rationale. */
case class ShingleHashesWideAll(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes_wide_all requires a string argument and n >= 1")
  override def prettyName: String = "shingle_hashes_wide_all"
  override def nullSafeEval(input: Any): Any =
    TextHashes.shingleHashesWideAll(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.shingleHashesWideAll($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesWideAll =
    copy(child = newChild)
}

/** Struct-typed per-row twin of the explode + (doc, gram) count + doc
  * re-aggregate pipeline behind repetition stats — see
  * [[TextHashes.gramRepetition]] for the scale rationale. */
case class GramRepetition(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = GramRepetition.Schema
  override def nullable: Boolean = true // < n tokens → null, even for non-null text
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_repetition requires a string argument and n >= 1")
  override def prettyName: String = "gram_repetition"
  override def nullSafeEval(input: Any): Any =
    TextHashes.gramRepetition(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.functions.TextHashes.gramRepetition($c, $n);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): GramRepetition =
    copy(child = newChild)
}

object GramRepetition {
  val Schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct_grams", LongType, nullable = false),
    StructField("max_gram_count", LongType, nullable = false)))
}

case class TokenHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_hashes requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "token_hashes"
  override def nullSafeEval(input: Any): Any =
    TextHashes.tokenHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.tokenHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingles requires a string argument and n >= 1")
  override def prettyName: String = "shingles"
  override def nullSafeEval(input: Any): Any =
    TextHashes.shingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

case class RemoveTokenSpans(text: Expression, starts: Expression, ends: Expression)
    extends TernaryExpression {
  override def first: Expression = text
  override def second: Expression = starts
  override def third: Expression = ends
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, starts.dataType, ends.dataType) match {
      case (_: StringType, ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "remove_token_spans requires (string, array<bigint>, array<bigint>)")
    }
  override def prettyName: String = "remove_token_spans"
  override def nullSafeEval(t: Any, ss: Any, ee: Any): Any =
    TextHashes.removeSpans(t.asInstanceOf[UTF8String],
      ss.asInstanceOf[ArrayData], ee.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.TextHashes.removeSpans($a, $b, $c)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RemoveTokenSpans =
    copy(text = f, starts = s, ends = t)
}

case class ShingleHashesAll(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes_all requires a string argument and n >= 1")
  override def prettyName: String = "shingle_hashes_all"
  override def nullSafeEval(input: Any): Any =
    TextHashes.shingleHashesAll(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.shingleHashesAll($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesAll =
    copy(child = newChild)
}

case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string argument and n >= 1")
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    TextHashes.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
