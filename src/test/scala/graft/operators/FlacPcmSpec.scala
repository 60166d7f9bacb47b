package graft.operators

import scala.collection.mutable

import graft.SparkSpec

/** [[FlacPcm]] round-trip specs against a minimal in-test FLAC ENCODER:
  * the encoder writes genuine FLAC bit streams (streaminfo, frame
  * headers, Rice-coded residuals, fixed/LPC predictors, stereo
  * decorrelation, wasted bits), so the decoder is tested on the real
  * format, not on fixtures it produced itself. Every subframe type and
  * stereo mode has a case; properties cover random signals. */
class FlacPcmSpec extends SparkSpec {
  import spark.implicits._

  // ---- minimal FLAC encoder (test-only) ----

  private final class BitWriter {
    private val out = new mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nb = 0
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nb += 1
        if (nb == 8) { out += cur.toByte; cur = 0; nb = 0 }
        i -= 1
      }
    }
    def alignByte(): Unit = if (nb > 0) bits(0L, 8 - nb)
    def bytes: Array[Byte] = { alignByte(); out.toArray }
  }

  private def streaminfo(rate: Int, channels: Int, bps: Int, total: Long): Array[Byte] = {
    val b = new Array[Byte](42)
    "fLaC".getBytes("ISO-8859-1").copyToArray(b)
    b(4) = 0x80.toByte // last block, STREAMINFO
    b(7) = 34
    b(8) = 0x10; b(10) = 0x10 // min/max block 4096
    val p = 18
    b(p) = (rate >>> 12).toByte
    b(p + 1) = ((rate >>> 4) & 0xff).toByte
    b(p + 2) = (((rate & 0xf) << 4) | ((channels - 1) << 1) | ((bps - 1) >>> 4)).toByte
    b(p + 3) = ((((bps - 1) & 0xf) << 4) | ((total >>> 32) & 0xf)).toInt.toByte
    b(p + 4) = ((total >>> 24) & 0xff).toByte
    b(p + 5) = ((total >>> 16) & 0xff).toByte
    b(p + 6) = ((total >>> 8) & 0xff).toByte
    b(p + 7) = (total & 0xff).toByte
    b
  }

  /** One frame header; blockSize written via the 16-bit form (code 7). */
  private def frameHeader(w: BitWriter, blockSize: Int, chCode: Int, ssCode: Int): Unit = {
    w.bits(0x3ffeL, 14) // sync
    w.bits(0L, 1); w.bits(0L, 1) // reserved, fixed-blocksize strategy
    w.bits(7L, 4) // block size: 16-bit at end
    w.bits(0L, 4) // sample rate: from STREAMINFO
    w.bits(chCode.toLong, 4)
    w.bits(ssCode.toLong, 3)
    w.bits(0L, 1)
    w.bits(0L, 8) // UTF-8 frame number 0
    w.bits((blockSize - 1).toLong, 16)
    w.bits(0L, 8) // CRC-8 (decoder skips)
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  /** Rice-coded residual block, single partition (order 0). `param` =
    * escape (15) writes raw `rawBits`-wide residuals instead. */
  private def residual(w: BitWriter, res: Seq[Long], param: Int, rawBits: Int = 0): Unit = {
    w.bits(0L, 2) // method: RICE (4-bit params)
    w.bits(0L, 4) // partition order 0
    w.bits(param.toLong, 4)
    if (param == 15) {
      w.bits(rawBits.toLong, 5)
      res.foreach(r => w.bits(r & ((1L << rawBits) - 1), rawBits))
    } else res.foreach { r =>
      val u = zigzag(r)
      val q = (u >>> param).toInt
      w.bits(0L, q); w.bits(1L, 1) // unary
      w.bits(u & ((1L << param) - 1), param)
    }
  }

  private def subConstant(w: BitWriter, v: Int, bps: Int): Unit = {
    w.bits(0L, 1); w.bits(0L, 6); w.bits(0L, 1)
    w.bits(v.toLong & ((1L << bps) - 1), bps)
  }

  private def subVerbatim(w: BitWriter, s: Seq[Int], bps: Int, wasted: Int = 0): Unit = {
    w.bits(0L, 1); w.bits(1L, 6)
    if (wasted > 0) { w.bits(1L, 1); w.bits(0L, wasted - 1); w.bits(1L, 1) }
    else w.bits(0L, 1)
    val eb = bps - wasted
    s.foreach(v => w.bits((v >> wasted).toLong & ((1L << eb) - 1), eb))
  }

  private def fixedPredict(s: Array[Int], order: Int, i: Int): Long = order match {
    case 0 => 0L
    case 1 => s(i - 1).toLong
    case 2 => 2L * s(i - 1) - s(i - 2)
    case 3 => 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
    case _ => 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) - s(i - 4)
  }

  private def subFixed(w: BitWriter, s: Array[Int], order: Int, bps: Int, param: Int): Unit = {
    w.bits(0L, 1); w.bits((8 + order).toLong, 6); w.bits(0L, 1)
    (0 until order).foreach(i => w.bits(s(i).toLong & ((1L << bps) - 1), bps))
    residual(w, (order until s.length).map(i => s(i) - fixedPredict(s, order, i)), param)
  }

  private def subLpc(w: BitWriter, s: Array[Int], coefs: Array[Int], shift: Int,
      precision: Int, bps: Int, param: Int): Unit = {
    val order = coefs.length
    w.bits(0L, 1); w.bits((32 + order - 1).toLong, 6); w.bits(0L, 1)
    (0 until order).foreach(i => w.bits(s(i).toLong & ((1L << bps) - 1), bps))
    w.bits((precision - 1).toLong, 4)
    w.bits(shift.toLong & 0x1f, 5)
    coefs.foreach(c => w.bits(c.toLong & ((1L << precision) - 1), precision))
    val res = (order until s.length).map { i =>
      var acc = 0L
      (0 until order).foreach(j => acc += coefs(j).toLong * s(i - 1 - j))
      s(i) - (acc >> shift)
    }
    residual(w, res, param)
  }

  private def endFrame(w: BitWriter): Unit = { w.alignByte(); w.bits(0L, 16) }

  // ---- round-trips ----

  test("constant and verbatim subframes round-trip, multi-frame stream") {
    val w = new BitWriter
    frameHeader(w, blockSize = 4, chCode = 0, ssCode = 4) // mono 16-bit
    subConstant(w, -7, 16)
    endFrame(w)
    frameHeader(w, blockSize = 3, chCode = 0, ssCode = 4)
    subVerbatim(w, Seq(100, -200, 32767), 16)
    endFrame(w)
    val flac = streaminfo(8000, 1, 16, 7L) ++ w.bytes
    val (rate, ch, samples) = FlacPcm.decode(flac)
    assert((rate, ch) == ((8000, 1)))
    assert(samples.toSeq == Seq(-7, -7, -7, -7, 100, -200, 32767))
  }

  test("fixed predictors order 0-4 round-trip rice residuals") {
    // a smooth-ish signal: higher orders produce small residuals, order 0
    // produces the samples themselves (param 14 keeps unary bounded)
    val sig = Array.tabulate(64)(i => (40 * i - i * i + (i % 3)) % 5000)
    for (order <- 0 to 4) {
      val w = new BitWriter
      frameHeader(w, sig.length, chCode = 0, ssCode = 4)
      subFixed(w, sig, order, 16, param = 14)
      endFrame(w)
      val (_, _, got) = FlacPcm.decode(streaminfo(44100, 1, 16, sig.length) ++ w.bytes)
      assert(got.toSeq == sig.toSeq, s"fixed order $order")
    }
  }

  test("LPC subframe round-trips (quantized coefficients, shift)") {
    val sig = Array.tabulate(48)(i => (math.sin(i / 3.0) * 8000).toInt)
    val w = new BitWriter
    frameHeader(w, sig.length, chCode = 0, ssCode = 4)
    subLpc(w, sig, coefs = Array(3, -1), shift = 1, precision = 5, bps = 16, param = 14)
    endFrame(w)
    val (_, _, got) = FlacPcm.decode(streaminfo(44100, 1, 16, sig.length) ++ w.bytes)
    assert(got.toSeq == sig.toSeq)
  }

  test("escape partition writes raw residuals; zero-width raw means zeros") {
    val sig = Array(12, -12, 300, -300)
    val w = new BitWriter
    frameHeader(w, 4, chCode = 0, ssCode = 4)
    // order-0 fixed, escape: residuals raw in zigzag? — no: escape writes
    // the residual VALUE in two's complement `rawBits` wide
    w.bits(0L, 1); w.bits(8L, 6); w.bits(0L, 1) // fixed order 0
    w.bits(0L, 2); w.bits(0L, 4) // rice, po 0
    w.bits(15L, 4) // escape
    w.bits(12L, 5) // 12-bit raw
    sig.foreach(v => w.bits(v.toLong & 0xfff, 12))
    endFrame(w)
    val (_, _, got) = FlacPcm.decode(streaminfo(8000, 1, 16, 4) ++ w.bytes)
    assert(got.toSeq == sig.toSeq)

    val w2 = new BitWriter
    frameHeader(w2, 4, chCode = 0, ssCode = 4)
    w2.bits(0L, 1); w2.bits(8L, 6); w2.bits(0L, 1)
    w2.bits(0L, 2); w2.bits(0L, 4)
    w2.bits(15L, 4); w2.bits(0L, 5) // raw width 0 → all-zero residuals
    endFrame(w2)
    val (_, _, got2) = FlacPcm.decode(streaminfo(8000, 1, 16, 4) ++ w2.bytes)
    assert(got2.toSeq == Seq(0, 0, 0, 0))
  }

  test("partitioned residual: order > 0, distinct per-partition rice params") {
    // blockSize 8, partition order 1 → two partitions of 4; the first
    // loses the predictor-order samples (order 1 → 3 residuals)
    val sig = Array(5, 7, 6, 9, 8, 300, 280, 310)
    val order = 1
    val res = (order until sig.length).map(i => (sig(i) - sig(i - 1)).toLong)
    val w = new BitWriter
    frameHeader(w, sig.length, chCode = 0, ssCode = 4)
    w.bits(0L, 1); w.bits((8 + order).toLong, 6); w.bits(0L, 1) // fixed order 1
    w.bits(sig(0).toLong & 0xffff, 16) // warmup
    w.bits(0L, 2) // rice
    w.bits(1L, 4) // partition order 1
    w.bits(2L, 4) // partition 0: param 2
    res.take(3).foreach { r =>
      val u = zigzag(r); val q = (u >>> 2).toInt
      w.bits(0L, q); w.bits(1L, 1); w.bits(u & 3, 2)
    }
    w.bits(9L, 4) // partition 1: param 9
    res.drop(3).foreach { r =>
      val u = zigzag(r); val q = (u >>> 9).toInt
      w.bits(0L, q); w.bits(1L, 1); w.bits(u & 511, 9)
    }
    endFrame(w)
    val (_, _, got) = FlacPcm.decode(streaminfo(8000, 1, 16, sig.length) ++ w.bytes)
    assert(got.toSeq == sig.toSeq)
  }

  test("wasted bits shift back in") {
    val sig = Array(8, -16, 24, 120) // all divisible by 8 → 3 wasted bits
    val w = new BitWriter
    frameHeader(w, 4, chCode = 0, ssCode = 4)
    subVerbatim(w, sig, 16, wasted = 3)
    endFrame(w)
    val (_, _, got) = FlacPcm.decode(streaminfo(8000, 1, 16, 4) ++ w.bytes)
    assert(got.toSeq == sig.toSeq)
  }

  test("stereo decorrelation: left/side, right/side, mid/side") {
    val left = Array(1000, -2000, 3000, 32767, -32768, 7)
    val right = Array(-500, 2500, 2999, -32768, 32767, 7)
    val n = left.length
    def check(chCode: Int, c0: Array[Int], c0bps: Int, c1: Array[Int], c1bps: Int): Unit = {
      val w = new BitWriter
      frameHeader(w, n, chCode, ssCode = 4)
      subVerbatim(w, c0, c0bps)
      subVerbatim(w, c1, c1bps)
      endFrame(w)
      val (_, ch, got) = FlacPcm.decode(streaminfo(44100, 2, 16, n) ++ w.bytes)
      assert(ch == 2)
      val expect = (0 until n).flatMap(i => Seq(left(i), right(i)))
      assert(got.toSeq == expect, s"chCode $chCode")
    }
    val side = Array.tabulate(n)(i => left(i) - right(i))
    val mid = Array.tabulate(n)(i => (left(i) + right(i)) >> 1)
    check(8, left, 16, side, 17) // left/side (side carries the extra bit)
    check(9, side, 17, right, 16) // right/side
    check(10, mid, 16, side, 17) // mid/side
  }

  test("property: random signals round-trip through verbatim mono and stereo") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genSig = Gen.choose(1, 80).flatMap(k =>
      Gen.listOfN(k, Gen.choose(-32768, 32767)).map(_.toArray))
    val prop = Prop.forAll(genSig, genSig) { (a: Array[Int], b: Array[Int]) =>
      val w = new BitWriter
      frameHeader(w, a.length, chCode = 0, ssCode = 4)
      subVerbatim(w, a, 16)
      endFrame(w)
      val mono = FlacPcm.decode(streaminfo(16000, 1, 16, a.length) ++ w.bytes)
      val n = math.min(a.length, b.length)
      val w2 = new BitWriter
      frameHeader(w2, n, chCode = 1, ssCode = 4) // independent stereo
      subVerbatim(w2, a.take(n), 16)
      subVerbatim(w2, b.take(n), 16)
      endFrame(w2)
      val st = FlacPcm.decode(streaminfo(16000, 2, 16, n) ++ w2.bytes)
      mono._3.toSeq == a.toSeq &&
        st._3.toSeq == (0 until n).flatMap(i => Seq(a(i), b(i)))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: random signals × random fixed order × random rice param round-trip") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(5, 60)
      sig <- Gen.listOfN(n, Gen.choose(-2000, 2000))
      order <- Gen.choose(0, 4)
      param <- Gen.choose(10, 14) // wide enough that unary quotients stay sane
      stereoSide <- Gen.oneOf(8, 9, 10, 1) // every stereo mode + independent
    } yield (sig.toArray, order, param, stereoSide)
    val prop = Prop.forAll(gen) { case (sig, order, param, chCode) =>
      val n = sig.length
      if (chCode == 1) { // independent stereo: fixed subframe per channel
        val w = new BitWriter
        frameHeader(w, n, chCode = 1, ssCode = 4)
        subFixed(w, sig, order, 16, param)
        subFixed(w, sig.map(-_), order, 16, param)
        endFrame(w)
        val (_, _, got) = FlacPcm.decode(streaminfo(16000, 2, 16, n) ++ w.bytes)
        got.toSeq == (0 until n).flatMap(i => Seq(sig(i), -sig(i)))
      } else {
        val left = sig
        val right = sig.map(v => (v / 2) - 7)
        val side = Array.tabulate(n)(i => left(i) - right(i))
        val (c0, b0, c1, b1) = chCode match {
          case 8 => (left, 16, side, 17)
          case 9 => (side, 17, right, 16)
          case _ => (Array.tabulate(n)(i => (left(i) + right(i)) >> 1), 16, side, 17)
        }
        val w = new BitWriter
        frameHeader(w, n, chCode, ssCode = 4)
        subFixed(w, c0, order, b0, param)
        subFixed(w, c1, order, b1, param)
        endFrame(w)
        val (_, _, got) = FlacPcm.decode(streaminfo(16000, 2, 16, n) ++ w.bytes)
        got.toSeq == (0 until n).flatMap(i => Seq(left(i), right(i)))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  private def subVerbatimL(w: BitWriter, s: Seq[Long], bps: Int): Unit = {
    w.bits(0L, 1); w.bits(1L, 6); w.bits(0L, 1)
    s.foreach(v => w.bits(v & (if (bps == 64) -1L else (1L << bps) - 1), bps))
  }

  test("32-bit stereo: the 33-bit side channel survives (no Int wrap)") {
    // left − right at the extremes needs 33 bits: Int arithmetic would
    // silently wrap the side subframe and reconstruct garbage
    val left = Array(Int.MaxValue, Int.MinValue, 7, -1)
    val right = Array(Int.MinValue, Int.MaxValue, -7, 1)
    val n = left.length
    val side = Array.tabulate(n)(i => left(i).toLong - right(i).toLong)
    val w = new BitWriter
    frameHeader(w, n, chCode = 8, ssCode = 7) // left/side, 32-bit
    subVerbatimL(w, left.map(_.toLong), 32)
    subVerbatimL(w, side, 33)
    endFrame(w)
    val (_, ch, got) = FlacPcm.decode(streaminfo(48000, 2, 32, n) ++ w.bytes)
    assert(ch == 2)
    assert(got.toSeq == (0 until n).flatMap(i => Seq(left(i), right(i))))
  }

  test("reserved channel codes and channel-count mismatches stop the frame cleanly") {
    // valid first frame, then a frame with reserved chCode 11: the clean
    // prefix survives, the garbage frame contributes nothing
    val w = new BitWriter
    frameHeader(w, 2, chCode = 0, ssCode = 4)
    subVerbatim(w, Seq(3, -3), 16)
    endFrame(w)
    frameHeader(w, 2, chCode = 11, ssCode = 4)
    subVerbatim(w, Seq(9, 9), 16)
    endFrame(w)
    val (_, _, got) = FlacPcm.decode(streaminfo(8000, 1, 16, 4) ++ w.bytes)
    assert(got.toSeq == Seq(3, -3))
    // stereo-coded frame against a mono STREAMINFO: rejected, not
    // interleaved-as-two-channels
    val w2 = new BitWriter
    frameHeader(w2, 2, chCode = 8, ssCode = 4)
    subVerbatim(w2, Seq(1, 2), 16)
    subVerbatim(w2, Seq(0, 0), 17)
    endFrame(w2)
    val (_, _, got2) = FlacPcm.decode(streaminfo(8000, 1, 16, 2) ++ w2.bytes)
    assert(got2.isEmpty)
  }

  test("WavPcmDecoder: non-byte-multiple sample size is a filterable zero, not fabricated samples") {
    // hand-built RIFF header claiming 12-bit PCM (stored 2 bytes/sample)
    def le(v: Int, n: Int): Array[Byte] = Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)
    val data = Array[Byte](0x34, 0x02, 0x56, 0x01)
    val wav = "RIFF".getBytes ++ le(36 + data.length, 4) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le(16, 4) ++ le(1, 2) ++ le(1, 2) ++ le(8000, 4) ++
      le(16000, 4) ++ le(2, 2) ++ le(12, 2) ++
      "data".getBytes ++ le(data.length, 4) ++ data
    val (r, c, s) = Multimodal.WavPcmDecoder.decodePcm(wav)
    assert(s.isEmpty && (r == 0 || s.isEmpty)) // zero samples either way
  }

  test("corrupt, truncated, and non-FLAC payloads are filterable zeros, not throws") {
    assert(FlacPcm.decode(null) == ((0, 0, Array.empty[Int])) ||
      FlacPcm.decode(null)._3.isEmpty)
    assert(FlacPcm.decode("nope".getBytes)._1 == 0)
    assert(FlacPcm.decode(Array[Byte]('f', 'L', 'a', 'C', 0x00))._1 == 0)
    // a valid first frame then garbage: the clean prefix survives
    val w = new BitWriter
    frameHeader(w, 2, chCode = 0, ssCode = 4)
    subVerbatim(w, Seq(5, -5), 16)
    endFrame(w)
    val good = streaminfo(8000, 1, 16, 2) ++ w.bytes
    val withGarbage = good ++ Array[Byte](0x12, 0x34, 0x56)
    val (r, c, s) = FlacPcm.decode(withGarbage)
    assert((r, c) == ((8000, 1)) && s.toSeq == Seq(5, -5))
  }

  test("WavPcmDecoder: 16-bit LE PCM samples round-trip through javax.sound") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val samples = Array[Int](0, 1000, -1000, 32767, -32768, 42)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val (r, c, got) = Multimodal.WavPcmDecoder.decodePcm(bos.toByteArray)
    assert((r, c) == ((8000, 1)))
    assert(got.toSeq == samples.toSeq)
  }

  test("extractPcmStats: mixed FLAC + WAV column via AutoPcmDecoder, exact stats") {
    val w = new BitWriter
    frameHeader(w, 4, chCode = 0, ssCode = 4)
    subVerbatim(w, Seq(10, -20, 30, 0), 16)
    endFrame(w)
    val flac = streaminfo(8000, 1, 16, 4) ++ w.bytes
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val pcm = Array[Byte](0x10, 0x00, 0xf0.toByte, 0xff.toByte) // 16, -16
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), new AudioFormat(8000f, 16, 1, true, false), 2L),
      AudioFileFormat.Type.WAVE, bos)
    val media = Seq(
      Multimodal.MediaRow(1L, flac, "flac"),
      Multimodal.MediaRow(2L, bos.toByteArray, "wav"),
      Multimodal.MediaRow(3L, "junk".getBytes, "mp3"),
      Multimodal.MediaRow(4L, null, "flac")).toDS()
    val got = Multimodal.extractPcmStats(media, Multimodal.AutoPcmDecoder)
      .collect().map(s => (s.id, s.sample_rate, s.channels, s.n_samples, s.peak_abs, s.mean_abs))
      .toSet
    assert(got == Set(
      (1L, 8000, 1, 4L, 30L, 15L), // |10|+|−20|+|30|+0 = 60 / 4
      (2L, 8000, 1, 2L, 16L, 16L),
      (3L, 0, 0, 0L, 0L, 0L),
      (4L, 0, 0, 0L, 0L, 0L)))
  }

  test("extractPixelStats: real pixel decode, exact luma stats, corrupt-safe") {
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, png(4, 3, 0xffffff), "png"), // white: luma 255
      Multimodal.MediaRow(2L, png(2, 2, 0x000000), "png"), // black: luma 0
      Multimodal.MediaRow(3L, png(1, 1, 0x604020), "png"), // (96+64+32)/3 = 64
      Multimodal.MediaRow(4L, "not an image".getBytes, "png"),
      Multimodal.MediaRow(5L, null, "png")).toDS()
    val got = Multimodal.extractPixelStats(media)
      .collect().map(s => (s.id, s.width, s.height, s.mean_luma_permille, s.min_luma, s.max_luma))
      .toSet
    assert(got == Set(
      (1L, 4, 3, 1000L, 255, 255),
      (2L, 2, 2, 0L, 0, 0),
      (3L, 1, 1, 64L * 1000 / 255, 64, 64),
      (4L, 0, 0, 0L, 0, 0),
      (5L, 0, 0, 0L, 0, 0)))
  }

  test("FLAC header decoder and sample decoder agree on rate/channels") {
    val w = new BitWriter
    frameHeader(w, 8, chCode = 1, ssCode = 4)
    subConstant(w, 3, 16); subConstant(w, -3, 16)
    endFrame(w)
    val flac = streaminfo(48000, 2, 16, 8) ++ w.bytes
    val (hr, hc, hn) = Multimodal.FlacDecoder.audioMeta(flac)
    val (sr, sc, samples) = FlacPcm.decode(flac)
    assert((hr, hc) == ((sr, sc)) && hn == 8L && samples.length == 16)
  }
}
