package graft.functions

import java.lang.invoke.{MethodHandles, VarHandle}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Saturating {0, 1, ≥2} count sketch over 64-bit gram keys — the
  * map-side pre-filter that lets [[graft.operators.Dedup.duplicateSpans]]
  * skip the corpus-sized global gram-count exchange: a gram whose every
  * probe cell stayed below 2 is PROVABLY globally unique (no false
  * negatives), so only the sketch-positive sliver — true duplicates plus
  * a bounded false-positive fraction — ever enters the exact count.
  *
  * Each of `mCells` cells is a saturating 2-valued counter held as one
  * bit in each of two bitplanes (`lo` = seen at least once, `hi` = seen
  * at least twice); a key probes k=2 cells — probe 1 splitmix64-mixed
  * then fastrange-mapped, probe 2 BLOCKED into probe 1's 512-bit line
  * (see [[GramCountSketch.cellPos2]]: at 10⁹ random probes over GiB
  * planes the passes are DRAM-latency-bound, and the blocked placement
  * plus the division-free mapping measured 1.3× on inserts / 1.2× on
  * queries single-threaded) — and is a duplicate CANDIDATE iff both
  * cells saturated. The bitplane encoding makes the three operations
  * that matter each a handful of word ops:
  *
  *  - insert: per cell, fetch-OR the lo bit; if it was already set,
  *    OR the hi bit. The atomic variant is linearizable under races —
  *    of two concurrent first inserts exactly one observes lo=0 — so a
  *    JVM-shared sketch never misses a duplicate (task retries can only
  *    ADD false positives, which the exact verification removes).
  *  - merge: hi' = hiₐ | hi_b | (loₐ & lo_b); lo' = loₐ | lo_b —
  *    exact saturating counter addition, associative, so any
  *    tree-reduction order yields the same sketch.
  *  - query: both hi bits set.
  *
  * False-positive rate at load n keys over m cells (k=2):
  * (1 − e^(−2n/m))² — 8% at m = 6n, a ~12× cut of the exchange on a
  * mostly-unique corpus (the blocked probe-2 adds block-local collision
  * variance on top: a hot line degrades only its own rate); a false
  * positive only costs its postings riding the (small) exact-count
  * exchange, never a wrong result.
  *
  * The probe side never reads the lo plane, so what broadcasts to
  * executors is the query-only [[GramDupFilter]] view — half the bytes.
  *
  * Two build strategies ([[GramCountSketch.build]]):
  *  - `shared`: every task of the build scan inserts atomically into ONE
  *    JVM-registered instance — total memory one sketch regardless of
  *    task concurrency. Requires executors in the driver JVM (local
  *    master); the build fails fast otherwise.
  *  - `perTask`: classic per-partition sketches, chunk-OR-merged
  *    EXECUTOR-side (reduceByKey over bitplane slices) so the driver
  *    fetches exactly one merged sketch — cluster-safe with any executor
  *    topology; memory is one sketch per CONCURRENT task, so size
  *    executors accordingly (8 cores × a 256 MB sketch = 2 GB of the
  *    executor heap during the build scan), and
  *    `spark.driver.maxResultSize` must admit one sketch
  *    (2×planeBytes — the driver broadcasts the result regardless).
  *  - `auto` picks `shared` on a local master, `perTask` otherwise.
  *
  * The sketch is an internal pre-filter — never replayed by the DuckDB
  * oracle — so the probe mixers need no engine neutrality.
  */
final class GramCountSketch(val mCells: Long) extends Serializable {
  require(mCells >= 64, s"mCells=$mCells: need at least one word per plane")
  require(mCells <= GramCountSketch.MaxCells,
    s"mCells=$mCells exceeds the largest plane a Java long array can hold " +
      s"(${GramCountSketch.MaxCells})")

  // Planes are padded to whole 512-bit (64-byte) LINES: probe 2 is
  // confined to probe 1's line (see pos2of), so a partial trailing line
  // would index past mCells — the padding cells absorb that instead.
  // MaxCells is a multiple of 512, so the padded word count still fits
  // the VM's array bound.
  private val nWords: Int = GramCountSketch.paddedWords(mCells)
  val lo: Array[Long] = new Array[Long](nWords)
  val hi: Array[Long] = new Array[Long](nWords)

  import GramCountSketch.PlaneVH

  // Cell mapping lives in the companion (cellPos1/cellPos2) so the
  // insert paths here and the query-only [[GramDupFilter]] can never
  // drift. See those functions for the fastrange + blocked-probe design.
  @inline private def pos1(h: Long): Long = GramCountSketch.cellPos1(mCells, h)
  @inline private def pos2of(p1: Long, h: Long): Long = GramCountSketch.cellPos2(p1, h)

  /** Single-writer insert (per-task build). */
  def insertSeq(h: Long): Unit = {
    val p1 = pos1(h)
    insertCellSeq(p1)
    insertCellSeq(pos2of(p1, h))
  }

  @inline private def insertCellSeq(p: Long): Unit = {
    val w = (p >>> 6).toInt
    val bit = 1L << (p & 63L).toInt
    if ((lo(w) & bit) != 0L) hi(w) |= bit else lo(w) |= bit
  }

  /** Concurrent insert (JVM-shared build): fetch-OR linearizes the
    * seen-once transition, so a duplicate key racing across threads still
    * saturates its cells. */
  def insertAtomic(h: Long): Unit = {
    val p1 = pos1(h)
    insertCellAtomic(p1)
    insertCellAtomic(pos2of(p1, h))
  }

  @inline private def insertCellAtomic(p: Long): Unit = {
    val w = (p >>> 6).toInt
    val bit = 1L << (p & 63L).toInt
    // Load-only fast path: set bits never clear, so a plain read showing
    // lo (or hi) set is authoritative — hot boilerplate grams saturate
    // once and then cost two loads instead of contended fetch-ORs. A
    // STALE read (missing a concurrent set) only falls through to the
    // fetch-OR, whose returned prior value is the linearization point.
    val lw = lo(w)
    if ((lw & bit) != 0L) {
      if ((hi(w) & bit) == 0L) { PlaneVH.getAndBitwiseOr(hi, w, bit); () }
    } else {
      val prev = PlaneVH.getAndBitwiseOr(lo, w, bit).asInstanceOf[Long]
      if ((prev & bit) != 0L) { PlaneVH.getAndBitwiseOr(hi, w, bit); () }
    }
  }

  /** True iff `h` MAY occur ≥ 2 times among the inserted keys; false is
    * authoritative (the key is globally unique). */
  def maybeDup(h: Long): Boolean = GramCountSketch.probeHi(hi, mCells, h)

  /** Query-only view sharing this sketch's hi plane: [[maybeDup]] never
    * reads the lo plane (lo only disambiguates first-vs-second insert),
    * so the probe side — broadcast to every executor — should carry HALF
    * the bitplane bytes. No copy: the view aliases the live array, so
    * take it only after the build completes. */
  def dupFilter: GramDupFilter = new GramDupFilter(mCells, hi)

  /** Exact saturating-counter merge; mutates and returns `this`. */
  def mergeInPlace(other: GramCountSketch): GramCountSketch = {
    require(other.mCells == mCells,
      s"cannot merge sketches of different geometry: $mCells vs ${other.mCells}")
    var i = 0
    while (i < nWords) {
      val a = lo(i); val b = other.lo(i)
      hi(i) = hi(i) | other.hi(i) | (a & b)
      lo(i) = a | b
      i += 1
    }
    this
  }

  /** Fraction of lo-plane bits set — the load observability knob: above
    * ~0.5 the false-positive rate degrades fast and the sketch was
    * undersized for the corpus. */
  def loadFactor: Double = {
    var set = 0L; var i = 0
    while (i < nWords) { set += java.lang.Long.bitCount(lo(i)); i += 1 }
    set.toDouble / (nWords.toLong * 64L)
  }
}

object GramCountSketch {
  /** Cells per 64-byte cache line — the block probe 2 is confined to.
    * Every piece of line arithmetic (the probe-2 mask, plane padding,
    * the MaxCells headroom) derives from this ONE constant. */
  private[functions] val LineCells: Long = 512L
  private[functions] val LineWords: Long = LineCells / 64L

  /** Largest constructible cell count: one bit per cell per plane, and a
    * Java array holds at most ~Int.MaxValue longs (the VM refuses the
    * last few slots, hence the -8 headroom). Rounded DOWN to a whole
    * line so the line-padded word count never exceeds the bound. */
  val MaxCells: Long = (Int.MaxValue.toLong - 8L) / LineWords * LineWords * 64L

  /** Plane length in words for a given cell count — padded to whole
    * lines (the blocked probe-2 placement may touch any cell of the
    * trailing line). The perTask chunk merge MUST slice this same
    * length, or the padding words would be silently dropped from the
    * merge. */
  @inline private[functions] def paddedWords(mCells: Long): Int =
    (((mCells + LineCells - 1) / LineCells) * LineWords).toInt

  /** Unsigned 64×64→high-64 multiply (Java 17 has only the signed
    * Math.multiplyHigh; the two correction terms lift it to unsigned). */
  @inline private[functions] def umulhi(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)

  /** Cell mapping, probe 1: Lemire fastrange (unsigned mulhi of the
    * mixed key by mCells) — a multiply instead of the 64-bit division
    * Long.remainderUnsigned costs (~30 cycles; ×2 positions at 10⁹
    * inserts + 10⁹ probes it was measurable). Uniform for any mCells,
    * not just powers of two. */
  @inline private[functions] def cellPos1(mCells: Long, h: Long): Long =
    umulhi(mix1(h), mCells)

  /** Cell mapping, probe 2 — BLOCKED into probe 1's 512-bit line: the
    * per-key working set is ONE cache line per plane (insert: lo line +
    * hi line; query: hi line only) instead of up to two per plane. At
    * 10⁹ random probes over GiB-scale planes the sketch passes are
    * DRAM-latency-bound, so halving the touched lines is the lever.
    * Within-line placement keeps the two cells DISTINCT (xor-1 on
    * collision), so a duplicate key still saturates two independent
    * cells; the price is block-local collision variance (a hot line
    * degrades its own false-positive rate — never correctness: no false
    * negatives either way). */
  @inline private[functions] def cellPos2(p1: Long, h: Long): Long = {
    val mask = LineCells - 1L
    var o2 = mix2(h) & mask
    if (o2 == (p1 & mask)) o2 ^= 1L
    (p1 & ~mask) | o2
  }

  /** The query-side probe over a hi plane — shared by the full sketch
    * and [[GramDupFilter]]. */
  @inline private[functions] def probeHi(hi: Array[Long], mCells: Long, h: Long): Boolean = {
    val p1 = cellPos1(mCells, h)
    val p2 = cellPos2(p1, h)
    (hi((p1 >>> 6).toInt) & (1L << (p1 & 63L).toInt)) != 0L &&
      (hi((p2 >>> 6).toInt) & (1L << (p2 & 63L).toInt)) != 0L
  }

  private val PlaneVH: VarHandle =
    MethodHandles.arrayElementVarHandle(classOf[Array[Long]])

  /** splitmix64 finalizer — probe 1. */
  @inline private[functions] def mix1(h0: Long): Long = {
    var h = h0 + 0x9E3779B97F4A7C15L
    h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
    h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  /** splitmix64 of the golden-ratio-shifted key — probe 2, independent
    * of probe 1 for any fixed key. */
  @inline private[functions] def mix2(h0: Long): Long = mix1(h0 + 0x6A09E667F3BCC909L)

  /** JVM-shared build registry: the scan's tasks look their sketch up by
    * id, which only resolves when executors share the driver JVM. */
  private val registry = new ConcurrentHashMap[Long, GramCountSketch]()
  private val nextId = new AtomicLong(0L)

  private[functions] def sharedLookup(id: Long): GramCountSketch = {
    val sk = registry.get(id)
    require(sk != null,
      "shared GramCountSketch build scheduled on an executor outside the driver JVM — " +
        "use the perTask build strategy on a non-local master")
    sk
  }

  /** Builds the sketch over `grams` — a single column of either LONG
    * keys or ARRAY<LONG> key groups (the array form lets a shingle
    * kernel's per-doc output feed the build WITHOUT a 10⁹-row Generate:
    * the scan stays one row per document) — with the given strategy:
    * "shared" | "perTask" | "auto" (shared iff local master). `shared`
    * runs one Spark job (the build scan); `perTask` adds the chunked
    * executor-side merge (`chunkWords` longs per plane slice — the
    * default 4M longs keeps every shuffle element ≤ 32 MB/plane; tests
    * shrink it to force multi-chunk merges on small sketches). See the
    * class doc for the memory contract of each strategy. */
  def build(grams: DataFrame, mCells: Long, strategy: String,
      chunkWords: Int = 1 << 22): GramCountSketch = {
    require(chunkWords > 0, s"chunkWords=$chunkWords must be positive")
    val sc = grams.sparkSession.sparkContext
    require(grams.schema.length == 1,
      s"GramCountSketch.build expects EXACTLY one column, got ${grams.schema.catalogString}")
    val isArray = grams.schema.head.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) => true
      case LongType => false
      case other => throw new IllegalArgumentException(
        s"GramCountSketch.build expects one LONG or ARRAY<LONG> column, got ${other.catalogString}")
    }
    val resolved = strategy match {
      case "auto" => if (sc.isLocal) "shared" else "perTask"
      case s => s
    }
    @inline def insertRow(sk: GramCountSketch, atomic: Boolean,
        row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
      if (!row.isNullAt(0)) {
        if (isArray) {
          val arr = row.getArray(0)
          var i = 0; val sz = arr.numElements()
          while (i < sz) {
            if (!arr.isNullAt(i)) {
              if (atomic) sk.insertAtomic(arr.getLong(i)) else sk.insertSeq(arr.getLong(i))
            }
            i += 1
          }
        } else if (atomic) sk.insertAtomic(row.getLong(0))
        else sk.insertSeq(row.getLong(0))
      }
    }
    val rdd = grams.queryExecution.toRdd
    resolved match {
      case "shared" =>
        val id = nextId.getAndIncrement()
        registry.put(id, new GramCountSketch(mCells))
        try {
          rdd.foreachPartition { it =>
            val sk = sharedLookup(id)
            while (it.hasNext) insertRow(sk, atomic = true, it.next())
          }
          registry.get(id)
        } finally registry.remove(id)
      case "perTask" =>
        if (rdd.getNumPartitions == 0) new GramCountSketch(mCells)
        else {
          // Executor-side CHUNKED merge. A whole-sketch treeReduce was
          // measured failing here at scale: its final step collects one
          // partial PER REDUCED PARTITION to the driver (~fan-in ×
          // 2·planeBytes — several GB), tripping spark.driver.maxResultSize
          // long before the merge itself is the bottleneck. Instead each
          // partition's sketch is cut into (chunkId, lo[], hi[]) slices
          // and reduceByKey applies the exact saturating-counter merge
          // per chunk across executors; the driver then fetches ONE
          // merged sketch — the intrinsic minimum, since it broadcasts
          // the result. Mostly-zero planes make the chunk shuffle cheap
          // (lz4 on the wire); driver.maxResultSize must still admit
          // one sketch (2×planeBytes) — a bound the driver's own heap
          // already implies.
          val nWords = paddedWords(mCells)
          // Long ceil-div: nWords can sit near Int.MaxValue (a ~17 GB
          // plane), where Int `nWords + chunkWords - 1` wraps negative
          // and an empty chunk range would SILENTLY yield an all-zero
          // sketch — no false negatives would become all false negatives
          val nChunks = ((nWords.toLong + chunkWords - 1) / chunkWords).toInt
          val reduceParts = math.max(1, math.min(nChunks, sc.defaultParallelism))
          val cw = chunkWords
          val merged = rdd.mapPartitions { it =>
            val sk = new GramCountSketch(mCells)
            while (it.hasNext) insertRow(sk, atomic = false, it.next())
            // all-zero slices are DROPPED map-side (one word scan, no
            // allocation): an absent chunk key leaves the zero-initialized
            // output untouched, so sparse planes — the common case — skip
            // the copy, serialization, and shuffle element entirely
            (0 until nChunks).iterator.flatMap { c =>
              val from = c * cw // < nWords for every valid chunk, so fits Int
              // Long min: at a near-max plane (nWords ~ Int.MaxValue) the
              // LAST chunk's `from + cw` wraps negative in Int and the
              // slice loop would silently emit nothing — dropping every
              // bit of the top cell slice from the merge, i.e. false
              // negatives, the one thing the sketch contract forbids
              val until = math.min(nWords.toLong, from.toLong + cw).toInt
              var i = from
              var nonZero = false
              while (!nonZero && i < until) {
                nonZero = sk.lo(i) != 0L || sk.hi(i) != 0L; i += 1
              }
              if (!nonZero) Iterator.empty
              else Iterator.single(
                (c, (java.util.Arrays.copyOfRange(sk.lo, from, until),
                  java.util.Arrays.copyOfRange(sk.hi, from, until))))
            }
          }.reduceByKey({ (a, b) =>
            val (loA, hiA) = a; val (loB, hiB) = b
            var i = 0
            while (i < loA.length) {
              hiA(i) = hiA(i) | hiB(i) | (loA(i) & loB(i))
              loA(i) = loA(i) | loB(i)
              i += 1
            }
            a
          }, reduceParts).collect()
          val out = new GramCountSketch(mCells)
          merged.foreach { case (c, (loC, hiC)) =>
            System.arraycopy(loC, 0, out.lo, c * cw, loC.length)
            System.arraycopy(hiC, 0, out.hi, c * cw, hiC.length)
          }
          out
        }
      case other => throw new IllegalArgumentException(
        s"unknown sketch build strategy '$other' (shared | perTask | auto)")
    }
  }
}

/** The query-only half of a [[GramCountSketch]]: its hi plane and
  * geometry, nothing else. [[GramCountSketch.maybeDup]] never reads the
  * lo plane, so this is what the probe side broadcasts — HALF the
  * bitplane bytes on the wire and in every executor's broadcast store
  * (the full sketch at the default 1 GiB cap serializes ~2 GiB). The hi
  * array is shared with the builder sketch, not copied; take the view
  * only after the build completes. */
final class GramDupFilter private[functions] (val mCells: Long, private val hi: Array[Long])
    extends Serializable {
  /** Same contract and cell mapping as [[GramCountSketch.maybeDup]]
    * (shared [[GramCountSketch.probeHi]] — the two cannot drift). */
  def maybeDup(h: Long): Boolean = GramCountSketch.probeHi(hi, mCells, h)
}

/** `sketch.maybeDup(key)` as a codegen'd predicate over the query-only
  * [[GramDupFilter]] view. The filter rides as a BROADCAST handle (the
  * plane can be a GiB — embedding it in the expression would serialize it
  * into every task binary, the same reason Spark's runtime bloom filters
  * ride subquery results, not literals); generated code resolves
  * `value()` once per operator instance into a mutable-state field, so
  * the per-row probe is at most two word loads (one cache line) inside
  * whole-stage codegen. */
case class SketchMaybeDup(sketch: Broadcast[GramDupFilter], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "gram_sketch_maybe_dup"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_sketch_maybe_dup probes a LONG gram key, got ${other.catalogString}")
  }

  @transient private lazy val sk: GramDupFilter = sketch.value

  override def nullSafeEval(input: Any): Any = sk.maybeDup(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val skCls = classOf[GramDupFilter].getName
    val bcRef = ctx.addReferenceObj("gramSketchBc", sketch, bcCls)
    val skTerm = ctx.addMutableState(skCls, "gramSketch",
      v => s"$v = ($skCls) $bcRef.value();")
    defineCodeGen(ctx, ev, c => s"$skTerm.maybeDup($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SketchMaybeDup =
    copy(child = newChild)
}
