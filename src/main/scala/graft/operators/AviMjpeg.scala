package graft.operators

/** Zero-dep AVI (RIFF) container walk for MJPEG payloads — the one video
  * format whose FRAMES are decodable with nothing but the JDK: each
  * `00dc`/`00db` chunk of an MJPEG AVI is a complete JPEG image, so the
  * container walk below plus `javax.imageio` is a REAL video → frames →
  * pixels path with no native codec. (H.264/VP9 sample decode remains
  * the honest stub — see `Multimodal.StubDecoder` — but MJPEG is common
  * in surveillance/scientific/capture corpora, and the container logic
  * here is exactly what any seekable sampler needs: chunk offsets, not
  * byte guesses.)
  *
  * Format re-derived from the public RIFF/AVI layout: `RIFF <size> AVI `
  * then even-padded `<fourcc> <size LE>` chunks; `LIST <size> <type>`
  * nests; `LIST hdrl` holds `avih` (width at payload offset 32, height
  * at 36, total frames at 16); `LIST movi` holds the stream chunks,
  * `NNdc`/`NNdb` = compressed/uncompressed video for stream NN.
  *
  * Every entry point absorbs garbage as an empty result (crawl media is
  * routinely corrupt — same contract as every decoder in
  * [[Multimodal]]). */
object AviMjpeg {

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], o: Int, c: String): Boolean =
    b(o) == c(0).toByte && b(o + 1) == c(1).toByte &&
      b(o + 2) == c(2).toByte && b(o + 3) == c(3).toByte

  private def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && fourcc(b, 0, "RIFF") && fourcc(b, 8, "AVI ")

  /** (width, height, totalFrames) from the `avih` main header; zeros when
    * the payload is not a parseable AVI. */
  def videoMeta(b: Array[Byte]): (Int, Int, Long) = {
    if (!isAvi(b)) return (0, 0, 0L)
    try {
      val avih = findChunk(b, 12, math.min(b.length.toLong, 8 + u32(b, 4)), "avih", "hdrl")
      if (avih < 0 || avih + 40 > b.length) (0, 0, 0L)
      else (u32(b, avih + 32).toInt, u32(b, avih + 36).toInt, u32(b, avih + 16))
    } catch { case scala.util.control.NonFatal(_) => (0, 0, 0L) }
  }

  /** Payload offset of the first `target` chunk, descending only into
    * LIST chunks of type `into`; -1 when absent. */
  private def findChunk(b: Array[Byte], from: Long, until: Long,
      target: String, into: String): Int = {
    var o = from
    while (o + 8 <= until && o + 8 <= b.length) {
      val size = u32(b, o.toInt + 4)
      if (fourcc(b, o.toInt, target)) return o.toInt + 8
      if (fourcc(b, o.toInt, "LIST") && o + 12 <= b.length && size >= 4 &&
        fourcc(b, o.toInt + 8, into)) {
        val inner = findChunk(b, o + 12, math.min(until, o + 8 + size), target, into)
        if (inner >= 0) return inner
      }
      o += 8 + size + (size & 1) // chunks pad to even; u32 size keeps o monotone
    }
    -1
  }

  /** (offset, length) of every video frame chunk (`NNdc`/`NNdb`) inside
    * the `movi` LIST, in stream order; empty for non-AVI/corrupt input.
    * Offsets point at the FRAME BYTES (for MJPEG: a complete JPEG). */
  def frameChunks(b: Array[Byte]): Array[(Int, Int)] = {
    if (!isAvi(b)) return Array.empty
    try {
      val out = Array.newBuilder[(Int, Int)]
      val end = math.min(b.length.toLong, 8 + u32(b, 4))
      var o = 12L
      while (o + 8 <= end && o + 8 <= b.length) {
        val size = u32(b, o.toInt + 4) // unsigned: in [0, 2^32)
        if (o + 8 + size > b.length) return out.result() // truncated/corrupt size
        if (fourcc(b, o.toInt, "LIST") && o + 12 <= b.length && fourcc(b, o.toInt + 8, "movi")) {
          var m = o + 12
          val mEnd = math.min(end, o + 8 + size)
          while (m + 8 <= mEnd) {
            val ms = u32(b, m.toInt + 4)
            if (m + 8 + ms > b.length) return out.result() // truncated/corrupt size
            val isFrame = Character.isDigit(b(m.toInt).toChar) &&
              Character.isDigit(b(m.toInt + 1).toChar) &&
              (b(m.toInt + 2) == 'd'.toByte) &&
              (b(m.toInt + 3) == 'c'.toByte || b(m.toInt + 3) == 'b'.toByte)
            if (isFrame && ms > 0) out += ((m.toInt + 8, ms.toInt))
            m += 8 + ms + (ms & 1)
          }
        }
        o += 8 + size + (size & 1)
      }
      out.result()
    } catch { case scala.util.control.NonFatal(_) => Array.empty }
  }
}
