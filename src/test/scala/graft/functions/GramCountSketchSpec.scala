package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class GramCountSketchSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  private def dupsOf(keys: Seq[Long]): Set[Long] =
    keys.groupBy(identity).collect { case (k, v) if v.size >= 2 => k }.toSet

  test("no false negatives: every key occurring >= 2 times is maybeDup") {
    check(Prop.forAll(
      Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)), Gen.chooseNum(1, 4)) {
      (base: List[Long], rep: Int) =>
        // duplicate a sample of the keys rep extra times
        val keys = base ++ base.take(base.size / 2).flatMap(k => Seq.fill(rep)(k))
        val sk = new GramCountSketch(1 << 14)
        keys.foreach(sk.insertSeq)
        dupsOf(keys).forall(sk.maybeDup)
    })
  }

  test("singletons in a roomy sketch are not flagged (FPR sanity)") {
    val keys = (0L until 10000L).map(i => i * 0x9E3779B97F4A7C15L + 17L)
    val sk = new GramCountSketch(1L << 20) // m = 100n -> FPR ~ 4e-4
    keys.foreach(sk.insertSeq)
    val fp = keys.count(sk.maybeDup)
    assert(fp <= 20, s"$fp of ${keys.size} singletons flagged in a 100x-oversized sketch")
  }

  test("merge == single-writer insert of the concatenation (any split, any order)") {
    check(Prop.forAll(
      Gen.listOf(Gen.chooseNum(-500L, 500L)),
      Gen.listOf(Gen.chooseNum(-500L, 500L)),
      Gen.listOf(Gen.chooseNum(-500L, 500L))) { (a: List[Long], b: List[Long], c: List[Long]) =>
      val whole = new GramCountSketch(1 << 12)
      (a ++ b ++ c).foreach(whole.insertSeq)
      def skOf(keys: Seq[Long]) = {
        val s = new GramCountSketch(1 << 12); keys.foreach(s.insertSeq); s
      }
      val leftTree = skOf(a).mergeInPlace(skOf(b)).mergeInPlace(skOf(c))
      val rightTree = skOf(a).mergeInPlace(skOf(b).mergeInPlace(skOf(c)))
      java.util.Arrays.equals(leftTree.lo, whole.lo) &&
        java.util.Arrays.equals(leftTree.hi, whole.hi) &&
        java.util.Arrays.equals(rightTree.lo, whole.lo) &&
        java.util.Arrays.equals(rightTree.hi, whole.hi)
    })
  }

  test("perTask build's chunked executor-side merge == shared build, bit for bit") {
    // chunkWords=64 slices the 1024-word planes into 16 chunks, so the
    // reduceByKey merge path (not just the single-chunk degenerate) is
    // what must reproduce the shared build's planes exactly
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val keys = (0L until 5000L).map(i => i * 0x9E3779B97F4A7C15L + 3L) ++
      (0L until 1200L).map(i => i * 0x9E3779B97F4A7C15L + 3L) // dup sample
    val df = spark.createDataset(keys).toDF("h").repartition(7)
    val mCells = 1L << 16
    val shared = GramCountSketch.build(df, mCells, "shared")
    val perTask = GramCountSketch.build(df, mCells, "perTask", chunkWords = 64)
    assert(java.util.Arrays.equals(perTask.lo, shared.lo),
      "lo planes must match across build strategies")
    assert(java.util.Arrays.equals(perTask.hi, shared.hi),
      "hi planes must match across build strategies")
  }

  test("atomic inserts under real thread races never miss a duplicate") {
    // every key is inserted exactly twice, once from each of two racing
    // threads — the adversarial schedule for the lo->hi transition
    val keys = (0L until 20000L).map(i => i * 0x6A09E667F3BCC909L + 3L).toArray
    for (_ <- 1 to 20) {
      val sk = new GramCountSketch(1L << 19)
      val t1 = new Thread(() => keys.foreach(sk.insertAtomic))
      val t2 = new Thread(() => keys.reverseIterator.foreach(sk.insertAtomic))
      t1.start(); t2.start(); t1.join(); t2.join()
      val missed = keys.count(k => !sk.maybeDup(k))
      assert(missed == 0, s"$missed twice-inserted keys not flagged after a race")
    }
  }

  test("loadFactor reflects the lo-plane fill") {
    val sk = new GramCountSketch(1 << 10)
    assert(sk.loadFactor == 0.0)
    (0L until 200L).foreach(sk.insertSeq)
    assert(sk.loadFactor > 0.2 && sk.loadFactor < 0.5,
      s"~400 bits of 1024 expected, got ${sk.loadFactor}")
  }

  test("dupFilter survives a serialization round-trip and answers like the full sketch") {
    // the filter's real job is riding a Broadcast — a Java-serialization
    // round-trip of its private hi plane — so the parity check probes the
    // DESERIALIZED copy, not the live view (which trivially shares state)
    def roundTrip(f: GramDupFilter): GramDupFilter = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(f); oos.close()
      new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[GramDupFilter]
    }
    check(Prop.forAll(
      Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)),
      Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) {
      (keys: List[Long], probes: List[Long]) =>
        val sk = new GramCountSketch(1 << 13)
        (keys ++ keys.take(keys.size / 2)).foreach(sk.insertSeq)
        val filter = roundTrip(sk.dupFilter)
        // must agree on inserted keys, duplicated keys, and never-seen
        // probes alike
        (keys ++ probes).forall(k => filter.maybeDup(k) == sk.maybeDup(k))
    })
  }

  test("non-line-multiple geometries: padding absorbs probe 2 past mCells") {
    // production sizing (statsBytes × cellsPerByte) is essentially never
    // a multiple of the 512-cell line, so the partial-trailing-line path
    // (probe 2 landing in padding cells) is the one prod runs
    check(Prop.forAll(
      Gen.chooseNum(64L, 5000L),
      Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) {
      (m: Long, keys: List[Long]) =>
        val sk = new GramCountSketch(m)
        (keys ++ keys).foreach(sk.insertSeq) // every key duplicated
        keys.forall(sk.maybeDup) // and none may throw past-plane indexing
    })
  }

  test("perTask == shared on a non-line-multiple geometry with a partial last chunk") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val keys = (0L until 3000L).map(i => i * 0x9E3779B97F4A7C15L + 3L) ++
      (0L until 700L).map(i => i * 0x9E3779B97F4A7C15L + 3L)
    val df = spark.createDataset(keys).toDF("h").repartition(5)
    val mCells = 577L // padded to 16 words; chunkWords=5 slices 5/5/5/1
    val shared = GramCountSketch.build(df, mCells, "shared")
    val perTask = GramCountSketch.build(df, mCells, "perTask", chunkWords = 5)
    assert(java.util.Arrays.equals(perTask.lo, shared.lo))
    assert(java.util.Arrays.equals(perTask.hi, shared.hi))
  }

  test("geometry mismatch and undersized/oversized sketches fail fast") {
    intercept[IllegalArgumentException] {
      new GramCountSketch(1 << 10).mergeInPlace(new GramCountSketch(1 << 11))
    }
    intercept[IllegalArgumentException] { new GramCountSketch(32) }
    // the documented upper bound must be CONSTRUCTIBLE (a looser bound
    // admitted sizes whose word count overflowed Int)
    intercept[IllegalArgumentException] { new GramCountSketch(GramCountSketch.MaxCells + 64) }
    assert((GramCountSketch.MaxCells + 63) / 64 <= Int.MaxValue.toLong)
  }
}
