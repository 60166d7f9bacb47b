package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder prompt): image/audio/video travel as
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run as partition-batched functions over the binary payload
  * (the Scala analog of `mapInPandas` batches — one decoder instantiation
  * per partition, streamed row iterator, no per-row setup cost).
  *
  * The IMAGE codec is REAL: [[ImageIoDecoder]] / [[ImageIoResizer]] ride
  * the JDK's own `javax.imageio` (PNG/JPEG/GIF/BMP), zero added
  * dependencies. The AUDIO header codec is REAL too ([[WavDecoder]] rides
  * `javax.sound.sampled` — WAV/AIFF/AU), and so is the VIDEO header
  * ([[Mp4Decoder]] walks the ISO-BMFF box structure by hand — MP4/MOV
  * track dimensions without any codec library). Compressed SAMPLE decode
  * (MP3/FLAC/H.264 pixels) remains stubbed ([[StubDecoder]] derives
  * deterministic fake dimensions from payload bytes — those codecs don't
  * ship with the JDK); the stub also stays the oracle-replayable path
  * for the q29/q45 correctness gate, since DuckDB can recompute its
  * arithmetic but not a pixel decode. Either way the surrounding
  * plumbing —
  * schema, encoders, partition batching, null-safety, the query surface —
  * is identical, and a production A/V decoder drops in behind
  * [[MediaDecoder]] without touching the plan shape.
  */
object Multimodal {

  /** A media row: opaque payload + declared container format. */
  final case class MediaRow(id: Long, content: Array[Byte], format: String)

  /** Typed metadata extracted per row. */
  final case class MediaMeta(
      id: Long, byte_len: Long, width: Int, height: Int, format: String)

  /** One sampled frame reference (video/audio frame sampling). */
  final case class FrameRef(id: Long, frame_index: Int, byte_offset: Long)

  /** The pluggable codec boundary. Implementations must be Serializable —
    * they ship to executors once per partition. */
  trait MediaDecoder extends Serializable {
    /** → (width, height) of the decoded payload. */
    def dimensions(content: Array[Byte]): (Int, Int)
  }

  /** Deterministic fake: dimensions derived from payload length alone, so
    * tests and the DuckDB oracle can reproduce them with arithmetic.
    * A real implementation would parse the container header here. */
  object StubDecoder extends MediaDecoder {
    def dimensions(content: Array[Byte]): (Int, Int) = {
      val n = if (content == null) 0 else content.length
      (1 + n % 64, 1 + n % 37)
    }
  }

  /** REAL image decoder — `javax.imageio`, which ships with the JDK (zero
    * added dependencies): reads only the container HEADER via an
    * `ImageReader` (PNG/JPEG/GIF/BMP out of the box), never the pixel data,
    * so metadata extraction over a 100 TB image column costs header bytes
    * per row, not a full decode. Corrupt or unrecognized payloads yield
    * `(0, 0)` — at pipeline scale a bad row must surface as a filterable
    * zero-dim record, not kill the job. */
  object ImageIoDecoder extends MediaDecoder {
    def dimensions(content: Array[Byte]): (Int, Int) = {
      if (content == null || content.isEmpty) return (0, 0)
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) (0, 0)
          else {
            val r = readers.next()
            try { r.setInput(iis); (r.getWidth(0), r.getHeight(0)) }
            finally r.dispose()
          }
        } finally iis.close()
        // NonFatal, not just IOException: the JDK's GIF/BMP/PNG readers
        // throw unchecked exceptions (IndexOutOfBounds, IllegalArgument…)
        // on crafted or truncated headers, and the contract is that a bad
        // row can never kill the job
      } catch { case scala.util.control.NonFatal(_) => (0, 0) }
    }
  }

  /** REAL video header decoder — MP4/MOV (ISO base media file format) is
    * a plain big-endian box structure, so track dimensions parse with no
    * codec library at all: walk sibling boxes, recurse into moov → trak,
    * read `tkhd`'s 16.16 fixed-point width/height (skipping zero-dim
    * audio/metadata tracks). Header bytes only — the mdat sample payload
    * is never touched, so metadata over a 100 TB video column costs the
    * moov box per row. Corrupt/truncated/non-BMFF payloads yield (0, 0).
    */
  object Mp4Decoder extends MediaDecoder {
    def dimensions(content: Array[Byte]): (Int, Int) = {
      if (content == null || content.length < 8) return (0, 0)
      try scan(content, 0, content.length, depth = 0).getOrElse((0, 0))
      catch { case scala.util.control.NonFatal(_) => (0, 0) }
    }

    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def be64(b: Array[Byte], o: Int): Long =
      (be32(b, o) << 32) | be32(b, o + 4)

    private def scan(b: Array[Byte], from: Int, until: Int, depth: Int): Option[(Int, Int)] = {
      var off = from
      while (off + 8 <= until) {
        var size = be32(b, off)
        var hdr = 8
        if (size == 1 && off + 16 <= until) { size = be64(b, off + 8); hdr = 16 }
        else if (size == 0) size = (until - off).toLong // box runs to EOF
        if (size < hdr) return None // malformed — stop, caller yields (0,0)
        val end = math.min(off + size, until.toLong).toInt
        new String(b, off + 4, 4, "ISO-8859-1") match {
          case "moov" | "trak" if depth < 4 =>
            val r = scan(b, off + hdr, end, depth + 1)
            if (r.isDefined) return r
          case "tkhd" if off + hdr < end => // header-only tkhd: no payload to read
            val ver = b(off + hdr) & 0xff
            // v0 payload: ver/flags 4 + times/ids/reserved 72 = width at 76;
            // v1 widens the three time fields by 4 bytes each
            val wOff = off + hdr + (if (ver == 1) 88 else 76)
            if (wOff + 8 <= end) {
              val w = (be32(b, wOff) >> 16).toInt
              val h = (be32(b, wOff + 4) >> 16).toInt
              if (w > 0 && h > 0) return Some((w, h)) // else: audio track
            }
          case _ =>
        }
        off = end
      }
      None
    }
  }

  /** Audio metadata of one payload. */
  final case class AudioMeta(
      id: Long, byte_len: Long, sample_rate: Int, channels: Int, n_frames: Long)

  /** The pluggable audio-codec boundary (same contract as
    * [[MediaDecoder]]: Serializable, ships once per partition). */
  trait AudioDecoder extends Serializable {
    /** → (sampleRate Hz, channels, frame count). */
    def audioMeta(content: Array[Byte]): (Int, Int, Long)
  }

  /** REAL audio decoder — `javax.sound.sampled`, which ships with the JDK
    * (zero added dependencies): parses the WAV/AIFF/AU container HEADER
    * for format and frame count, never the samples, so metadata over a
    * 100 TB audio column costs header bytes per row. Corrupt or
    * unrecognized payloads yield (0, 0, 0) — a bad row must surface as a
    * filterable zero record, not kill the job (compressed formats like
    * MP3/FLAC need codecs outside the JDK and land here as (0, 0, 0)
    * until a richer decoder is plugged in). */
  object WavDecoder extends AudioDecoder {
    def audioMeta(content: Array[Byte]): (Int, Int, Long) = {
      if (content == null || content.isEmpty) return (0, 0, 0L)
      try {
        // ByteArrayInputStream supports mark/reset, which the codec
        // probe requires
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val f = in.getFormat
          // streaming-style containers (e.g. AU with dataSize 0xFFFFFFFF)
          // parse fine but report AudioSystem.NOT_SPECIFIED (-1) — clamp
          // to 0 so the "filterable zero record" contract holds and no
          // negative frame count leaks into duration arithmetic
          (math.max(0, f.getSampleRate.toInt), math.max(0, f.getChannels),
            math.max(0L, in.getFrameLength))
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => (0, 0, 0L) }
    }
  }

  /** [[extractMeta]]'s audio twin: partition-batched header decode. */
  def extractAudioMeta(rows: Dataset[MediaRow], decoder: AudioDecoder): Dataset[AudioMeta] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val d = decoder
      it.map { r =>
        val len = if (r.content == null) 0L else r.content.length.toLong
        val (sr, ch, nf) = d.audioMeta(r.content)
        AudioMeta(r.id, len, sr, ch, nf)
      }
    }
  }

  /** Decode metadata partition-batched: the decoder is resolved once per
    * partition (mirrors mapInPandas' per-batch amortization), rows stream
    * through an iterator — no materialization. */
  def extractMeta(rows: Dataset[MediaRow], decoder: MediaDecoder): Dataset[MediaMeta] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val d = decoder // bind once per partition
      it.map { r =>
        val len = if (r.content == null) 0L else r.content.length.toLong
        val (w, h) = d.dimensions(r.content)
        MediaMeta(r.id, len, w, h, r.format)
      }
    }
  }

  /** One feature vector extracted per row. */
  final case class MediaFeatures(id: Long, embedding: Array[Float])

  /** The pluggable feature-extraction boundary (CLIP/wav2vec in
    * production; the stub here). Serializable — ships once per
    * partition. */
  trait MediaFeaturizer extends Serializable {
    def features(content: Array[Byte]): Array[Float]
  }

  /** Deterministic fake featurizer: component j is a seeded rolling-hash
    * fold (seed j+1) over the payload's UTF-8 code points, reduced mod
    * 1000 — small exact integers, so tests AND the DuckDB oracle replay
    * every component bit-for-bit. A real featurizer would run the model
    * forward pass here; the partition-batched plumbing is identical. */
  final case class StubFeaturizer(dim: Int) extends MediaFeaturizer {
    def features(content: Array[Byte]): Array[Float] = {
      val s = if (content == null) "" else new String(content, java.nio.charset.StandardCharsets.UTF_8)
      Array.tabulate(dim) { j =>
        var h = (j + 1).toLong
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          h = (h * 31 + cp) % 1000000007L
          i += Character.charCount(cp)
        }
        (h % 1000L).toFloat
      }
    }
  }

  /** Feature extraction partition-batched, same shape as [[extractMeta]]:
    * featurizer bound once per partition, rows streamed. */
  def extractFeatures(rows: Dataset[MediaRow], featurizer: MediaFeaturizer): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val f = featurizer
      it.map(r => MediaFeatures(r.id, f.features(r.content)))
    }
  }

  /** The pluggable resize boundary. */
  trait MediaResizer extends Serializable {
    def resize(content: Array[Byte], width: Int, height: Int): Array[Byte]
  }

  /** Deterministic fake resizer: evenly strided byte subsample (or
    * zero-pad) to exactly width×height bytes — a stand-in for a pixel
    * resampler with the same contract: output size is a function of the
    * target alone. */
  object StubResizer extends MediaResizer {
    def resize(content: Array[Byte], width: Int, height: Int): Array[Byte] = {
      val target = width * height
      val src = if (content == null) Array.emptyByteArray else content
      Array.tabulate(target) { i =>
        if (src.isEmpty) 0.toByte else src((i.toLong * src.length / target).toInt)
      }
    }
  }

  /** REAL pixel resampler — full `javax.imageio` decode, bilinear
    * `java.awt.Graphics2D` scale (headless-safe: only ever draws into an
    * off-screen `BufferedImage`), re-encoded as `outputFormat` (png
    * default; any `ImageIO.write` format name works). Corrupt payloads
    * yield an empty array — same filterable-not-fatal contract as
    * [[ImageIoDecoder]]. Unlike metadata extraction this DOES decode
    * pixels; it belongs after the pipeline's filter stages, not before. */
  final case class ImageIoResizer(outputFormat: String = "png") extends MediaResizer {
    def resize(content: Array[Byte], width: Int, height: Int): Array[Byte] = {
      if (content == null || content.isEmpty) return Array.emptyByteArray
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        if (img == null) return Array.emptyByteArray
        val out = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, width, height, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, outputFormat, bos)
        bos.toByteArray
        // NonFatal for the same reason as [[ImageIoDecoder]]: malformed
        // payloads throw unchecked exceptions inside the JDK codecs
      } catch { case scala.util.control.NonFatal(_) => Array.emptyByteArray }
    }
  }

  /** Resize partition-batched; id/format ride through unchanged. */
  def resize(rows: Dataset[MediaRow], resizer: MediaResizer, width: Int, height: Int): Dataset[MediaRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val r = resizer
      it.map(m => MediaRow(m.id, r.resize(m.content, width, height), m.format))
    }
  }

  /** Uniform frame sampling: `k` frame references per row, byte offsets
    * spread evenly over the payload (a real sampler would seek container
    * keyframes; offsets are where a decoder would start reading). Pure
    * column expressions — the explode happens before any codec touches
    * the payload, so partitioning stays by row id. */
  def sampleFrames(df: DataFrame, id: String, content: String, k: Int): DataFrame = {
    val len = length(col(content)).cast("long")
    df.select(
      col(id).as("id"), len.as("byte_len"),
      explode(sequence(lit(0), lit(k - 1))).as("frame_index"))
      .withColumn("byte_offset", col("frame_index") * col("byte_len") / k)
      .select(col("id"), col("frame_index"), col("byte_offset").cast("long").as("byte_offset"))
  }

  /** Lift a text column into the media schema (used by tests and the
    * oracle queries: UTF-8 bytes are the only binary payload the driver
    * testdata offers). */
  def fromText(spark: SparkSession, df: DataFrame, id: String, text: String,
      format: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(id).cast("long").as("id"), col(text).cast("binary").as("content"),
      lit(format).as("format")).as[MediaRow]
  }
}
