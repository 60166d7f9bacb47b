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
  *
  * Inner-loop discipline (these kernels run once per document of a 100 TB
  * corpus, so constant factors ARE the scan cost):
  *  - token bounds are a primitive packed-long array, never boxed tuples;
  *  - n-gram hashes combine PER-TOKEN prefix polynomials (pᵢ = token
  *    poly hash, mᵢ = 31^|tokenᵢ|), so each gram costs O(n) multiply-mods
  *    instead of re-folding every character of the window (O(n·len)) —
  *    polynomial identity: poly(A ⧺ B) = poly(A)·31^|B| + poly(B);
  *  - the distinct-shingle set is open-addressed primitive longs with
  *    insertion-order output (= `array_distinct` semantics), not a boxing
  *    `LinkedHashSet[Long]`.
  * All value-identical to the composed forms — pinned by the existing
  * equivalence property specs.
  */
object TextHashes {
  /** THE whitespace set (Java/RE2 `\s`, matched by the DuckDB oracles'
    * `\s+` splits) — package-visible so every kernel tokenizes
    * identically; a drifted copy breaks oracle parity for just that
    * kernel, invisibly to the others' equivalence specs. */
  @inline private[functions] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Token char ranges packed as (start << 32) | end — a primitive long
    * array instead of boxed tuples: at 10⁹ corpus tokens per scan the
    * tuple boxing was measurable pure allocation/GC load in every kernel
    * below. */
  private[functions] def tokenBounds(s: String): Array[Long] = {
    val out = new mutable.ArrayBuilder.ofLong()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) out += (start.toLong << 32) | i.toLong
    }
    out.result()
  }
  @inline private def bStart(b: Long): Int = (b >>> 32).toInt
  @inline private def bEnd(b: Long): Int = b.toInt

  /** Rolling-hash fold of s[from,until): (…(cp₀·31 + cp₁)·31 + …) mod P.
    * No first-element special case — starting from 0, (0·31 + cp) ≡ cp —
    * and a bare Long return: the old (Long, Boolean) tuple allocated
    * once PER TOKEN on the 10⁹-token scans this file's inner-loop
    * discipline exists for. */
  @inline private def foldRange(s: String, from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % RollingHash.Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** [[RollingHash]] of every whitespace token, duplicates kept (term
    * frequency is the SimHash weight). */
  def tokenHashes(u: UTF8String): ArrayData = {
    val s = u.toString
    val bounds = tokenBounds(s)
    val out = new Array[Any](bounds.length)
    var i = 0
    while (i < bounds.length) {
      out(i) = foldRange(s, bStart(bounds(i)), bEnd(bounds(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-token polynomial prefix data for base `base`: p(t) = poly hash of
    * token t's code points, m(t) = base^(#code points of token t), both
    * mod [[RollingHash.Mod]]. Computed ONCE per document; every gram then
    * combines tokens in O(1) each. */
  private def tokenPolys(s: String, bounds: Array[Long], base: Int): (Array[Long], Array[Long]) = {
    val nt = bounds.length
    val p = new Array[Long](nt)
    val m = new Array[Long](nt)
    var t = 0
    while (t < nt) {
      val until = bEnd(bounds(t))
      var h = 0L
      var mm = 1L
      var first = true
      var i = bStart(bounds(t))
      while (i < until) {
        val cp = s.codePointAt(i)
        h = if (first) cp % RollingHash.Mod else (h * base + cp) % RollingHash.Mod
        first = false
        mm = mm * base % RollingHash.Mod
        i += Character.charCount(cp)
      }
      p(t) = h
      m(t) = mm
      t += 1
    }
    (p, m)
  }

  /** Gram hash over tokens [g, g+n) from per-token prefix polys: the fold
    * h ← (h·base + 32)·m(t) + p(t) is the polynomial of the space-joined
    * gram (tokens are non-empty, so the space join is unconditional after
    * the first token). Products stay < Mod² ≈ 10¹⁸ < 2⁶³. */
  @inline private def gramHash(p: Array[Long], m: Array[Long], base: Int, g: Int, n: Int): Long = {
    var h = p(g)
    var t = 1
    while (t < n) {
      h = (h * base + 32L) % RollingHash.Mod
      h = (h * m(g + t) + p(g + t)) % RollingHash.Mod
      t += 1
    }
    h
  }

  /** Open-addressed primitive-long set preserving insertion order — the
    * `array_distinct` contract without per-insert boxing. Values must be
    * ≥ 0 (rolling hashes are; −1 marks empty slots). Capacity is fixed
    * from the caller's known upper bound (gram count), load ≤ 0.5. */
  private final class LongSetOrdered(maxElems: Int) {
    private val cap = Integer.highestOneBit(math.max(4, maxElems) * 4 - 1) << 1
    private val mask = cap - 1
    private val table = {
      val a = new Array[Long](cap)
      java.util.Arrays.fill(a, -1L)
      a
    }
    private val order = new Array[Long](maxElems)
    var size = 0
    def add(v: Long): Unit = {
      var idx = (scramble(v) & mask).toInt
      while (true) {
        val cur = table(idx)
        if (cur == v) return
        if (cur == -1L) {
          table(idx) = v
          order(size) = v
          size += 1
          return
        }
        idx = (idx + 1) & mask
      }
    }
    @inline private def scramble(v: Long): Long = {
      val x = (v ^ (v >>> 33)) * 0xff51afd7ed558ccdL
      x ^ (x >>> 33)
    }
    def toAnyArray: Array[Any] = {
      val out = new Array[Any](size)
      var i = 0
      while (i < size) { out(i) = order(i); i += 1 }
      out
    }
  }

  /** Distinct [[RollingHash]] values of all space-joined word n-grams,
    * first-occurrence order (= `array_distinct` semantics). */
  def shingleHashes(u: UTF8String, n: Int): ArrayData = {
    val s = u.toString
    val bounds = tokenBounds(s)
    if (bounds.length < n) return new GenericArrayData(Array.empty[Any])
    val (p, m) = tokenPolys(s, bounds, 31)
    val maxG = bounds.length - n + 1
    val seen = new LongSetOrdered(maxG)
    var g = 0
    while (g < maxG) {
      seen.add(gramHash(p, m, 31, g, n))
      g += 1
    }
    new GenericArrayData(seen.toAnyArray)
  }

  /** [[shingleHashes]] WITHOUT dedup — the occurrence multiset the
    * repetition-quality signals count over. */
  def shingleHashesAll(u: UTF8String, n: Int): ArrayData = {
    val s = u.toString
    val bounds = tokenBounds(s)
    if (bounds.length < n) return new GenericArrayData(Array.empty[Any])
    val (p, m) = tokenPolys(s, bounds, 31)
    val maxG = bounds.length - n + 1
    val out = new Array[Any](maxG)
    var g = 0
    while (g < maxG) {
      out(g) = gramHash(p, m, 31, g, n)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** THE space-joined gram string for window position `g` — one builder
    * shared by the distinct and multiset surface forms, so their "same
    * tokenization and windowing" contract cannot drift. */
  @inline private def gramString(s: String, bounds: Array[Long], g: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder(bEnd(bounds(g + n - 1)) - bStart(bounds(g)))
    var t = 0
    while (t < n) {
      if (t > 0) sb.append(' ')
      sb.append(s, bStart(bounds(g + t)), bEnd(bounds(g + t)))
      t += 1
    }
    sb.toString
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
      seen += gramString(s, bounds, g, n)
      g += 1
    }
    new GenericArrayData(seen.toArray.map(g => UTF8String.fromString(g): Any))
  }

  /** ALL space-joined word n-grams as STRINGS, duplicates kept, document
    * order — the occurrence multiset where the surface form itself is the
    * key (the bigram-LM train/probe sides join and aggregate on gram
    * strings so the DuckDB oracle can replay them verbatim). Same
    * tokenization and windowing as [[shingleHashesAll]]; one pass, one
    * StringBuilder per gram, no per-element HOF dispatch. */
  def shinglesAll(u: UTF8String, n: Int): ArrayData = {
    val s = u.toString
    val bounds = tokenBounds(s)
    if (bounds.length < n) return new GenericArrayData(Array.empty[Any])
    val maxG = bounds.length - n + 1
    val out = new Array[Any](maxG)
    var g = 0
    while (g < maxG) {
      out(g) = UTF8String.fromString(gramString(s, bounds, g, n))
      g += 1
    }
    new GenericArrayData(out)
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
        sb.append(s, bStart(bounds(t)), bEnd(bounds(t)))
        firstOut = false
      }
      t += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** [[shingleHashesAll]] in a ~60-bit key space: per gram,
    * h1 · Mod + h2, with h1 the plain base-31 rolling hash and h2 its
    * base-37 twin (both < Mod = 1e9+7, so the combination is exact in
    * a signed 64-bit long AND in the oracle's BIGINT arithmetic). A
    * SALTED base-31 hash is NOT an independent twin: for equal-length
    * strings H(salt+x) is an affine function of the base-31 polynomial
    * of x, so every equal-length collision survives salting (caught by
    * the collision spec); base 37 is a genuinely different linear
    * combination of the code points.
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
    val s = u.toString
    val bounds = tokenBounds(s)
    if (bounds.length < n) return new GenericArrayData(Array.empty[Any])
    val (p31, m31) = tokenPolys(s, bounds, 31)
    val (p37, m37) = tokenPolys(s, bounds, 37)
    val maxG = bounds.length - n + 1
    val out = new Array[Any](maxG)
    var g = 0
    while (g < maxG) {
      out(g) = gramHash(p31, m31, 31, g, n) * RollingHash.Mod + gramHash(p37, m37, 37, g, n)
      g += 1
    }
    new GenericArrayData(out)
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
    val s = u.toString
    gramRepetition(s, tokenBounds(s), n)
  }

  /** [[gramRepetition]] over a caller-tokenized document — the fused-gate
    * path ([[QualityKeepKernel]]) shares ONE toString + tokenBounds pass
    * across the stats and repetition kernels. */
  def gramRepetition(s: String, bounds: Array[Long], n: Int): InternalRow = {
    if (bounds.length < n) return null
    val (p, m) = tokenPolys(s, bounds, 31)
    val maxG = bounds.length - n + 1
    val arr = new Array[Long](maxG)
    var g = 0
    while (g < maxG) {
      arr(g) = gramHash(p, m, 31, g, n)
      g += 1
    }
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
}

/** Per-document quality-gate evidence in ONE tokenize pass:
  * (n_tokens, token_chars, stopword_count) — the fused form of the three
  * interpreted-HOF signal columns (`size(filter(split))`,
  * `aggregate(tokens, Σ length)`, `size(filter(tokens(lower), ∈ set))`)
  * that dominated the gate stage's CPU at 10M docs. Value-identical to
  * the composed columns (spec-pinned): token chars count CODE POINTS per
  * token (Spark `length` semantics), stopword membership tokenizes
  * `lower(text)` separately (the composed form's exact semantics — a
  * lowercase mapping may change char counts but never whitespace). */
final class GateStatsKernel(stopwords: Array[String]) extends Serializable {
  // stopwords bucketed by char-unit length: token membership is then a
  // regionMatches over the few same-length candidates — no substring
  // allocation per token
  @transient private lazy val byLen: Array[Array[String]] = {
    val maxLen = if (stopwords.isEmpty) 0 else stopwords.map(_.length).max
    val buckets = Array.fill(maxLen + 1)(List.empty[String])
    stopwords.distinct.foreach { w =>
      if (w.nonEmpty) buckets(w.length) ::= w
    }
    buckets.map(_.reverse.toArray)
  }

  def eval(u: UTF8String): InternalRow = {
    val s = u.toString
    evalWith(u, s, TextHashes.tokenBounds(s))
  }

  /** [[eval]] over a caller-tokenized document (shared-pass form — see
    * [[TextHashes.gramRepetition]]'s overload). The lowercase pass stays
    * separate by contract: a lowercase mapping can change char counts,
    * so its bounds are NOT the original's. */
  def evalWith(u: UTF8String, s: String, bounds: Array[Long]): InternalRow = {
    var chars = 0L
    var t = 0
    while (t < bounds.length) {
      chars += s.codePointCount((bounds(t) >>> 32).toInt, bounds(t).toInt)
      t += 1
    }
    val ls = u.toLowerCase.toString
    val lb = TextHashes.tokenBounds(ls)
    var sw = 0L
    var i = 0
    val maxLen = byLen.length - 1
    while (i < lb.length) {
      val a = (lb(i) >>> 32).toInt
      val len = lb(i).toInt - a
      if (len <= maxLen) {
        val cands = byLen(len)
        var c = 0
        while (c < cands.length) {
          if (ls.regionMatches(a, cands(c), 0, len)) { sw += 1; c = cands.length }
          else c += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](bounds.length.toLong, chars, sw))
  }
}

/** Struct-typed fused gate evidence — see [[GateStatsKernel]]. */
case class GateStats(child: Expression, stopwords: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = GateStats.Schema
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gate_stats requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "gate_stats"
  @transient private lazy val kernel = new GateStatsKernel(stopwords.toArray)
  override def nullSafeEval(input: Any): Any =
    kernel.eval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gateStatsKernel", kernel, classOf[GateStatsKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.eval($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): GateStats =
    copy(child = newChild)
}

object GateStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("token_chars", LongType, nullable = false),
    StructField("stopword_count", LongType, nullable = false)))
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

case class ShinglesAll(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingles_all requires a string argument and n >= 1")
  override def prettyName: String = "shingles_all"
  override def nullSafeEval(input: Any): Any =
    TextHashes.shinglesAll(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.shinglesAll($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShinglesAll =
    copy(child = newChild)
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
