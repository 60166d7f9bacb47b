package graft.operators

/** REAL zero-dependency FLAC sample decoder — the full PCM decode, not a
  * header walk: Rice/Rice2-coded residuals, CONSTANT / VERBATIM / FIXED
  * (order 0-4) / LPC (order 1-32) subframes, wasted-bits shifts, and the
  * three stereo decorrelation modes (left/side, right/side, mid/side).
  * FLAC is a fully public bit-level format (RFC 9639); every structure
  * here is plain shifts and adds over the byte array, so compressed audio
  * decodes with no codec library — closing the "compressed-sample decode
  * is stubbed" gap for FLAC (MP3/H.264 entropy decode remain out of
  * zero-dep reach).
  *
  * Decode contract mirrors the header decoders' filterable-zero rule:
  * corrupt / non-FLAC payloads yield (0, 0, empty) rather than throwing —
  * at pipeline scale a bad row must surface as a filterable record, not
  * kill the job. Truncated streams return the frames that decoded
  * cleanly. CRCs are not verified (a verification pass is a different
  * operator; decode should not reject bit-identical audio over a stale
  * CRC).
  *
  * Samples return as one interleaved Int array (FLAC samples are ≤ 32-bit
  * signed). Memory is bounded per frame (one block ≤ 65536 samples per
  * channel) — a lying STREAMINFO total-samples field cannot cause an
  * allocation bomb because the output grows only as frames actually
  * decode.
  */
object FlacPcm {

  /** (sampleRate, channels, interleaved samples) — (0, 0, empty) when the
    * payload is not decodable FLAC. */
  def decode(content: Array[Byte]): (Int, Int, Array[Int]) = {
    val b = content
    if (b == null || b.length < 42 ||
      b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return Empty
    try {
      // metadata blocks: first is STREAMINFO by format requirement
      var off = 4
      var last = false
      var rate = 0
      var channels = 0
      var bps = 0
      var first = true
      while (!last) {
        if (off + 4 > b.length) return Empty
        last = (b(off) & 0x80) != 0
        val typ = b(off) & 0x7f
        val len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
        if (first) {
          if (typ != 0 || len < 34 || off + 4 + 34 > b.length) return Empty
          val p = off + 4 + 10
          rate = ((b(p) & 0xff) << 12) | ((b(p + 1) & 0xff) << 4) | ((b(p + 2) & 0xff) >>> 4)
          channels = ((b(p + 2) >>> 1) & 0x7) + 1
          bps = (((b(p + 2) & 0x1) << 4) | ((b(p + 3) & 0xff) >>> 4)) + 1
          first = false
        }
        off += 4 + len
      }
      if (rate == 0 || off > b.length) return Empty
      val out = new scala.collection.mutable.ArrayBuilder.ofInt()
      val br = new BitReader(b, off)
      var ok = true
      while (ok && br.hasBytes(2)) {
        // a frame that fails mid-decode (truncation, bit corruption) stops
        // the stream but keeps the clean prefix: samples append only after
        // a frame fully decodes, so `out` never holds a partial frame
        ok = try decodeFrame(br, channels, bps, out)
        catch { case scala.util.control.NonFatal(_) => false }
      }
      (rate, channels, out.result())
    } catch { case scala.util.control.NonFatal(_) => Empty }
  }

  private val Empty = (0, 0, Array.empty[Int])

  /** MSB-first bit reader over a byte array. Reads past the end throw
    * (caught by the decode wrapper / frame loop). */
  private final class BitReader(val b: Array[Byte], startByte: Int) {
    var pos: Long = startByte.toLong << 3 // bit position
    def hasBytes(n: Int): Boolean = ((pos + 7) >> 3) + n <= b.length
    def bits(n: Int): Long = {
      var v = 0L
      var left = n
      while (left > 0) {
        val byteIx = (pos >> 3).toInt
        val bitIx = (pos & 7).toInt
        val take = math.min(8 - bitIx, left)
        val chunk = ((b(byteIx) & 0xff) >>> (8 - bitIx - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        pos += take
        left -= take
      }
      v
    }
    def sbits(n: Int): Long = {
      val v = bits(n)
      // sign-extend
      if (n == 0) 0L else (v << (64 - n)) >> (64 - n)
    }
    def unary(): Int = {
      var q = 0
      while (bits(1) == 0L) q += 1
      q
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7L
  }

  /** Decode one frame into `out`; false when no valid frame starts here
    * (clean EOF or trailing garbage — stop without failing the stream). */
  private def decodeFrame(
      br: BitReader, siChannels: Int, siBps: Int,
      out: scala.collection.mutable.ArrayBuilder.ofInt): Boolean = {
    val sync = br.bits(14)
    if (sync != 0x3ffe) return false
    br.bits(1) // reserved
    br.bits(1) // blocking strategy
    val bsCode = br.bits(4).toInt
    val srCode = br.bits(4).toInt
    val chCode = br.bits(4).toInt
    val ssCode = br.bits(3).toInt
    br.bits(1) // reserved
    // UTF-8-coded frame/sample number: lead byte gives the width
    val lead = br.bits(8).toInt
    val extra =
      if (lead < 0x80) 0
      else if ((lead & 0xe0) == 0xc0) 1
      else if ((lead & 0xf0) == 0xe0) 2
      else if ((lead & 0xf8) == 0xf0) 3
      else if ((lead & 0xfc) == 0xf8) 4
      else if ((lead & 0xfe) == 0xfc) 5
      else if (lead == 0xfe) 6
      else return false
    var i = 0
    while (i < extra) { br.bits(8); i += 1 }
    val blockSize = bsCode match {
      case 0 => return false
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => br.bits(8).toInt + 1
      case 7 => br.bits(16).toInt + 1
      case c => 256 << (c - 8)
    }
    srCode match { // rate comes from STREAMINFO; frame-local codes just advance bits
      case 12 => br.bits(8)
      case 13 | 14 => br.bits(16)
      case 15 => return false
      case _ =>
    }
    if (chCode > 10) return false // reserved channel assignments
    val nCh = if (chCode < 8) chCode + 1 else 2
    if (nCh != siChannels) return false
    val bps = ssCode match {
      case 0 => siBps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => return false
    }
    br.bits(8) // frame-header CRC-8
    val chans = new Array[Array[Long]](nCh)
    var ch = 0
    while (ch < nCh) {
      // side channels carry one extra bit: left/side → ch1, right/side →
      // ch0, mid/side → ch1
      val extraBit = chCode match {
        case 8 => if (ch == 1) 1 else 0
        case 9 => if (ch == 0) 1 else 0
        case 10 => if (ch == 1) 1 else 0
        case _ => 0
      }
      chans(ch) = decodeSubframe(br, blockSize, bps + extraBit)
      ch += 1
    }
    br.alignByte()
    br.bits(16) // frame CRC-16
    // stereo decorrelation
    chCode match {
      case 8 => // left/side: right = left − side
        var i = 0
        while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
      case 9 => // right/side: left = right + side (side arrived in ch0)
        var i = 0
        while (i < blockSize) {
          val side = chans(0)(i)
          chans(0)(i) = chans(1)(i) + side
          i += 1
        }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val side = chans(1)(i)
          var mid = chans(0)(i) << 1
          mid |= (side & 1L) // the dropped LSB of (l+r)
          chans(0)(i) = (mid + side) >> 1
          chans(1)(i) = (mid - side) >> 1
          i += 1
        }
      case _ =>
    }
    var s = 0
    while (s < blockSize) {
      var c = 0
      while (c < nCh) { out += chans(c)(s).toInt; c += 1 }
      s += 1
    }
    true
  }

  /** Samples stay in the LONG domain through the subframe: a side channel
    * of a 32-bit stream is 33 bits wide, so Int would silently wrap its
    * warm-ups, verbatim samples, and zigzag residuals — the interleave
    * step truncates to Int only AFTER stereo reconstruction, where values
    * fit the stream's bit depth again. */
  private def decodeSubframe(br: BitReader, blockSize: Int, bps: Int): Array[Long] = {
    require(br.bits(1) == 0L, "subframe pad bit")
    val typ = br.bits(6).toInt
    val wasted =
      if (br.bits(1) == 1L) br.unary() + 1
      else 0
    val eb = bps - wasted
    val s = new Array[Long](blockSize)
    if (typ == 0) { // CONSTANT
      java.util.Arrays.fill(s, br.sbits(eb))
    } else if (typ == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { s(i) = br.sbits(eb); i += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED order 0-4
      val order = typ & 0x07
      var i = 0
      while (i < order) { s(i) = br.sbits(eb); i += 1 }
      decodeResidual(br, blockSize, order, s)
      i = order
      while (i < blockSize) {
        val p = order match {
          case 0 => 0L
          case 1 => s(i - 1)
          case 2 => 2L * s(i - 1) - s(i - 2)
          case 3 => 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
          case _ => 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) - s(i - 4)
        }
        s(i) = s(i) + p
        i += 1
      }
    } else if ((typ & 0x20) == 0x20) { // LPC order 1-32
      val order = (typ & 0x1f) + 1
      var i = 0
      while (i < order) { s(i) = br.sbits(eb); i += 1 }
      val precision = br.bits(4).toInt + 1
      require(precision < 16, "invalid LPC precision")
      val shift = br.sbits(5).toInt
      require(shift >= 0, "negative LPC shift")
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = br.sbits(precision).toInt; i += 1 }
      decodeResidual(br, blockSize, order, s)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * s(i - 1 - j); j += 1 }
        s(i) = s(i) + (acc >> shift)
        i += 1
      }
    } else throw new IllegalArgumentException(s"reserved subframe type $typ")
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { s(i) = s(i) << wasted; i += 1 }
    }
    s
  }

  /** Rice/Rice2 residual into s(order until blockSize) (zigzag decoded). */
  private def decodeResidual(br: BitReader, blockSize: Int, order: Int, s: Array[Long]): Unit = {
    val method = br.bits(2).toInt
    require(method <= 1, s"reserved residual method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val po = br.bits(4).toInt
    val partitions = 1 << po
    require(blockSize % partitions == 0, "partition order does not divide block size")
    var idx = order
    var p = 0
    while (p < partitions) {
      val count = (blockSize >> po) - (if (p == 0) order else 0)
      val param = br.bits(paramBits).toInt
      if (param == escape) {
        val raw = br.bits(5).toInt
        var i = 0
        while (i < count) { s(idx) = if (raw == 0) 0L else br.sbits(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = br.unary().toLong
          val v = (q << param) | br.bits(param)
          s(idx) = (v >>> 1) ^ -(v & 1L)
          idx += 1
          i += 1
        }
      }
      p += 1
    }
  }
}
