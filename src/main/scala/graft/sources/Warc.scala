package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** WARC / WET web-archive source — the container format training corpora
  * actually arrive in (Common Crawl ships crawl text as `*.warc.wet.gz`
  * shards). A first-class DataSource V2 (`spark.read.format("warc")`), so
  * ingestion composes with the whole pipeline tier
  * ([[graft.operators.UrlOps]] provenance, dedup, quality gates) without a
  * preprocessing hop.
  *
  * Format (ISO 28500, re-derived from the public spec, no code consulted):
  * each record is `WARC/1.x` + CRLF header lines (`Name: value`, folded
  * continuations allowed) + empty line + exactly `Content-Length` payload
  * bytes + blank-line separators. Common Crawl gzips EACH RECORD as its own
  * member and concatenates, so one multi-member `GZIPInputStream` walks a
  * whole `.gz` shard sequentially.
  *
  * Scale shape: one input partition PER FILE — gzip members are not
  * seekable, so the file is the natural split unit, and crawls ship as
  * thousands of ~1 GB shards (file-level parallelism is exactly how a
  * 1000-executor cluster eats them). The reader streams records — never
  * the file — through a fixed-size buffer. Column pruning reaches the
  * byte level: when `content` is pruned the payload is SKIPPED, not read
  * (a metadata-only census of a 100 TB crawl decompresses but never
  * materializes the bodies); a pushed `record_type` filter (EqualTo/In —
  * e.g. WET's `conversion` rows) skips payloads of non-matching records
  * the same way. [[Scan.estimateStatistics]] reports summed file sizes so
  * Catalyst can size joins against the scan.
  *
  * Raw `.warc.gz` (Common Crawl's primary format) wraps `response` /
  * `request` payloads in an HTTP envelope (status line + headers + blank
  * line + body). Records whose Content-Type is `application/http` split
  * at the first blank line: `http_status` and `http_content_type` expose
  * the envelope, `content` is the BODY ONLY. Selecting just envelope
  * columns reads at most the 64 KiB head and SKIPS the body bytes (the
  * crawl-census path); a payload with no blank line (truncated envelope)
  * keeps the whole block as `content` with null envelope columns. WET
  * `conversion` records have no envelope — their `http_*` columns are
  * null and `content` is unchanged.
  *
  * Malformed-input contract (crawls contain garbage): bytes between
  * records that aren't a `WARC/` version line are skipped; a record whose
  * payload is cut by EOF is dropped (its fields can't be trusted);
  * records missing `Content-Length` end the file (the framing is gone).
  * Option `mode` (like the CSV source): `permissive` (default) salvages
  * the decoded prefix of a shard whose BYTE STREAM dies — truncated or
  * corrupt gzip member, oversized header line — logging the file;
  * `failfast` propagates the error and fails the job.
  */
object Warc {
  val Schema: StructType = StructType(Seq(
    StructField("warc_file", StringType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("record_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("content", BinaryType, nullable = true)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("warc").load(path)

  /** WET payloads are UTF-8 text; Spark's binary→string cast is the
    * decode. */
  def wetText(content: Column): Column = content.cast("string")

  /** One parsed record: header keys lower-cased; `payload` is null when
    * the reader skipped it (pruned or filtered out). For records whose
    * record-level Content-Type is `application/http` (raw `.warc.gz`
    * `response`/`request` records wrap the body in an HTTP envelope),
    * `payload` is the BODY ONLY and the envelope's status code and
    * Content-Type surface as `httpStatus`/`httpContentType`; a payload
    * with no parseable envelope (truncated or not actually HTTP) keeps
    * the whole block as `payload` with null envelope fields. */
  final class Record(val headers: Map[String, String], val payload: Array[Byte],
      val httpStatus: java.lang.Integer = null, val httpContentType: String = null) {
    def header(k: String): String = headers.getOrElse(k, null)
    def contentLength: Long = headers.get("content-length").map(_.toLong).getOrElse(-1L)
  }

  /** Per-record payload need, decided from the record headers BEFORE the
    * payload bytes are read: skip them, parse only the HTTP envelope
    * head (then skip the body bytes), or materialize fully. */
  object PayloadNeed {
    val Skip = 0
    val EnvelopeOnly = 1
    val Full = 2
  }

  /** Is this record's payload an HTTP message (RFC 2616 envelope +
    * body)? WARC marks it with Content-Type `application/http` (with a
    * `;msgtype=` parameter in the wild). */
  def isHttpPayload(headers: Map[String, String]): Boolean =
    headers.get("content-type")
      .exists(_.toLowerCase(java.util.Locale.ROOT).startsWith("application/http"))

  /** Streaming record walk over one (possibly multi-member-gzip) WARC
    * stream. `need` decides per record whether to materialize the block,
    * parse only its HTTP envelope head, or skip it byte-exactly. Not
    * thread-safe; single forward pass. */
  final class Parser(in: InputStream) {
    private val MaxHeaderLine = 1 << 16

    /** Next record, with `need(headers)` ([[PayloadNeed]]) gating
      * payload materialization; null at EOF. */
    def next(need: Map[String, String] => Int): Record = {
      var line = readLine()
      // tolerate inter-record blank lines and non-WARC garbage
      while (line != null && !line.startsWith("WARC/")) line = readLine()
      if (line == null) return null
      val headers = mutable.Map.empty[String, String]
      var lastKey: String = null
      var h = readLine()
      while (h != null && h.nonEmpty) {
        if ((h.charAt(0) == ' ' || h.charAt(0) == '\t') && lastKey != null) {
          headers(lastKey) = headers(lastKey) + " " + h.trim // folded continuation
        } else {
          val i = h.indexOf(':')
          if (i > 0) {
            lastKey = h.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
            headers(lastKey) = h.substring(i + 1).trim
          }
        }
        h = readLine()
      }
      if (h == null) return null // EOF inside headers: framing gone
      val len = headers.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
      if (len < 0) return null // unframed record ends the file
      val hmap = headers.toMap
      val want = need(hmap)
      val http = want != PayloadNeed.Skip && isHttpPayload(hmap)
      if (want == PayloadNeed.Full) {
        val buf = readFully(len)
        if (buf == null) return null // truncated payload: drop
        if (http) {
          val (status, ctype, bodyStart) = parseHttpEnvelope(buf, buf.length)
          if (bodyStart >= 0)
            new Record(hmap, java.util.Arrays.copyOfRange(buf, bodyStart, buf.length),
              status, ctype)
          else new Record(hmap, buf) // no parseable envelope: keep whole block
        } else new Record(hmap, buf)
      } else if (want == PayloadNeed.EnvelopeOnly && http) {
        // read only the envelope head; the body bytes are SKIPPED, never
        // materialized — the metadata-census path over raw .warc.gz
        val headLen = math.min(len, MaxHeaderLine.toLong).toInt
        val head = readFully(headLen)
        if (head == null) return null
        val (status, ctype, bodyStart) = parseHttpEnvelope(head, head.length)
        if (bodyStart >= 0 || headLen.toLong == len) {
          if (!skipFully(len - headLen)) return null
          new Record(hmap, null, status, ctype)
        } else {
          // No blank line inside the head and the payload continues: a
          // pathological envelope. Continue the terminator scan over the
          // remainder in bounded chunks — retaining at most
          // MaxEnvelopeScan head bytes, never the body — so a crafted
          // Content-Length can't force a payload-sized allocation and
          // records > 2 GiB stay skippable. Value-identical to the Full
          // path's envelope columns for any envelope head under the cap.
          val (s2, c2, ok) = scanEnvelopeTail(head, len - headLen)
          if (!ok) return null // truncated payload: drop, as Full does
          new Record(hmap, null, s2, c2)
        }
      } else {
        if (!skipFully(len)) return null
        new Record(hmap, null)
      }
    }

    /** (status, content-type, body start) of the HTTP envelope at the
      * front of `buf`, or (null, null, -1) when no blank line terminates
      * an envelope within `limit` — the truncated/absent-envelope
      * tolerance. The status is null for a non-status first line (e.g.
      * `request` records); envelope header names are matched
      * case-insensitively; CRLF and bare-LF line endings both parse.
      * Header LINES are parsed from at most the first [[MaxEnvelopeScan]]
      * head bytes (via [[cappedHeadEnd]]) — the same rule the EnvelopeOnly
      * fallback applies — so envelope columns are projection-invariant
      * even for an adversarial multi-MB envelope head. */
    private def parseHttpEnvelope(
        buf: Array[Byte], limit: Int): (java.lang.Integer, String, Int) = {
      var i = 0
      var bodyStart = -1
      while (bodyStart < 0 && i < limit - 1) {
        if (buf(i) == '\r' && i + 3 < limit && buf(i + 1) == '\n' &&
            buf(i + 2) == '\r' && buf(i + 3) == '\n') bodyStart = i + 4
        else if (buf(i) == '\n' && buf(i + 1) == '\n') bodyStart = i + 2
        else i += 1
      }
      if (bodyStart < 0) return (null, null, -1)
      val (status, ctype) = parseEnvelopeLines(buf, cappedHeadEnd(buf, i.toLong))
      (status, ctype, bodyStart)
    }

    /** The DETERMINISTIC header-parse end for an envelope head of
      * `headEnd` bytes: `headEnd` itself under the [[MaxEnvelopeScan]]
      * cap, else the end of the last complete line within the cap (a
      * trailing partial line is dropped rather than risking a truncated
      * header value). Both the Full path and the EnvelopeOnly fallback
      * apply THIS rule, so a retained envelope column has the same value
      * under any projection — the cut depends only on the head bytes,
      * never on read-chunk boundaries. Requires `buf` to hold at least
      * `min(headEnd, MaxEnvelopeScan)` bytes. */
    private def cappedHeadEnd(buf: Array[Byte], headEnd: Long): Int =
      if (headEnd <= MaxEnvelopeScan) headEnd.toInt
      else {
        var j = MaxEnvelopeScan - 1
        while (j >= 0 && buf(j) != '\n') j -= 1
        j + 1
      }

    /** (status, content-type) from the envelope head `buf[0, headEnd)` —
      * the line-level half of [[parseHttpEnvelope]], shared with the
      * bounded fallback scan. */
    private def parseEnvelopeLines(
        buf: Array[Byte], headEnd: Int): (java.lang.Integer, String) = {
      val head = new String(buf, 0, headEnd, java.nio.charset.StandardCharsets.ISO_8859_1)
      val lines = head.split("\n").map(_.stripSuffix("\r"))
      val status: java.lang.Integer =
        if (lines.nonEmpty && lines(0).startsWith("HTTP/")) {
          val parts = lines(0).split(" ")
          if (parts.length >= 2) parts(1).toIntOption.map(Int.box).orNull else null
        } else null
      val ctype = lines.drop(1).collectFirst {
        case l if l.toLowerCase(java.util.Locale.ROOT).startsWith("content-type:") =>
          l.substring(l.indexOf(':') + 1).trim
      }.orNull
      (status, ctype)
    }

    /** Envelope-head bytes any path parses header lines from (the
      * terminator search itself continues unbounded, in O(chunk) memory
      * on the fallback path). Shared by [[parseHttpEnvelope]] and
      * [[scanEnvelopeTail]] through [[cappedHeadEnd]] — one rule, so
      * column pruning never changes a retained column's value. */
    private val MaxEnvelopeScan = 4 << 20

    /** Continues the envelope-terminator search past the 64 KiB head for
      * a [[PayloadNeed.EnvelopeOnly]] record whose envelope didn't end in
      * the head. Reads the remaining `remaining` payload bytes in bounded
      * chunks, finding the FIRST `\r\n\r\n` / `\n\n` exactly where
      * [[parseHttpEnvelope]] over the whole payload would; retains at
      * most [[MaxEnvelopeScan]] head bytes and never the body, and
      * consumes the payload byte-exactly however large `remaining` is.
      * Returns `(status, contentType, true)`, with null columns when no
      * terminator exists (matching the Full path's no-envelope record),
      * or `(_, _, false)` on a truncated stream. */
    private def scanEnvelopeTail(
        head0: Array[Byte], remaining: Long): (java.lang.Integer, String, Boolean) = {
      val acc = new ByteArrayOutputStream(head0.length * 2)
      acc.write(head0, 0, head0.length)
      var accFull = false       // stopped retaining: only scanning now
      var logical = head0.length.toLong // payload bytes seen so far
      var left = remaining
      // Pattern state across chunk boundaries: the last 3 logical bytes.
      val tail = new Array[Byte](3)
      System.arraycopy(head0, head0.length - 3, tail, 0, 3)
      val chunk = new Array[Byte](64 * 1024)
      while (left > 0) {
        val n = in.read(chunk, 0, math.min(left, chunk.length.toLong).toInt)
        if (n < 0) return (null, null, false)
        left -= n
        // Retain BEFORE scanning: a terminator found inside this chunk
        // must see the head bytes that precede it in the same chunk.
        if (!accFull) {
          acc.write(chunk, 0, n)
          if (acc.size >= MaxEnvelopeScan) accFull = true
        }
        // Scan for the terminator IN PLACE (patterns span at most 4
        // bytes, so a 3-byte overlap preserves cross-chunk hits without
        // re-copying the chunk — the old tail++chunk copy doubled memory
        // traffic on exactly the crafted multi-GiB records this path
        // exists to bound). Boundary first — logical positions -3..-1
        // precede the chunk's — over a tiny tail++chunk-head window,
        // then the chunk itself; a pattern extending past the chunk end
        // is caught next round via the rolled tail, as before.
        var headEnd = -1L // logical offset of the terminator start
        val bndLen = 3 + math.min(n, 4)
        val bnd = new Array[Byte](bndLen)
        System.arraycopy(tail, 0, bnd, 0, 3)
        System.arraycopy(chunk, 0, bnd, 3, bndLen - 3)
        var i = 0
        while (headEnd < 0 && i < 3 && i < bndLen - 1) {
          if (bnd(i) == '\r' && i + 3 < bndLen && bnd(i + 1) == '\n' &&
              bnd(i + 2) == '\r' && bnd(i + 3) == '\n') headEnd = logical - 3 + i
          else if (bnd(i) == '\n' && bnd(i + 1) == '\n') headEnd = logical - 3 + i
          else i += 1
        }
        var j = 0
        while (headEnd < 0 && j < n - 1) {
          if (chunk(j) == '\r' && j + 3 < n && chunk(j + 1) == '\n' &&
              chunk(j + 2) == '\r' && chunk(j + 3) == '\n') headEnd = logical + j
          else if (chunk(j) == '\n' && chunk(j + 1) == '\n') headEnd = logical + j
          else j += 1
        }
        if (headEnd >= 0) {
          if (!skipFully(left)) return (null, null, false)
          val bytes = acc.toByteArray
          // Same deterministic cap rule as the Full path: the retained
          // prefix always covers min(headEnd, MaxEnvelopeScan) bytes
          // (retention only stops once acc >= the cap), so the cut
          // depends on the head bytes alone, never on chunk boundaries.
          val (s, c) = parseEnvelopeLines(bytes, cappedHeadEnd(bytes, headEnd))
          return (s, c, true)
        }
        logical += n
        // Roll the 3-byte overlap forward.
        if (n >= 3) System.arraycopy(chunk, n - 3, tail, 0, 3)
        else {
          System.arraycopy(tail, n, tail, 0, 3 - n)
          System.arraycopy(chunk, 0, tail, 3 - n, n)
        }
      }
      (null, null, true) // no terminator anywhere: envelope columns null
    }

    /** CRLF/LF line as a String (UTF-8), null at EOF. */
    private def readLine(): String = {
      val out = new ByteArrayOutputStream(128)
      var b = in.read()
      if (b < 0) return null
      while (b >= 0 && b != '\n') {
        out.write(b)
        if (out.size > MaxHeaderLine)
          throw new IllegalArgumentException("WARC header line exceeds 64 KiB")
        b = in.read()
      }
      val bytes = out.toByteArray
      val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1 else bytes.length
      new String(bytes, 0, n, java.nio.charset.StandardCharsets.UTF_8)
    }

    private def readFully(len: Long): Array[Byte] = {
      if (len > Int.MaxValue - 8) throw new IllegalArgumentException(s"record of $len bytes")
      val buf = new Array[Byte](len.toInt)
      var off = 0
      while (off < buf.length) {
        val n = in.read(buf, off, buf.length - off)
        if (n < 0) return null
        off += n
      }
      buf
    }

    private val skipBuf = new Array[Byte](64 * 1024)
    private def skipFully(len: Long): Boolean = {
      var left = len
      while (left > 0) {
        val n = in.read(skipBuf, 0, math.min(left, skipBuf.length.toLong).toInt)
        if (n < 0) return false
        left -= n
      }
      true
    }
  }

  /** Multi-member gzip stream that REPORTS corruption the JDK swallows:
    * `GZIPInputStream` treats an unreadable NEXT-member header as clean
    * end-of-stream, so a bit-flip at a member boundary silently truncates
    * the shard in both permissive and failfast modes. This walk parses
    * member headers itself (magic/CM/FLG + the FEXTRA/FNAME/FCOMMENT/
    * FHCRC optional fields), inflates with one reused `Inflater`, and
    * verifies each member's CRC32 + ISIZE trailer — a bad header, a
    * truncated member, or a trailer mismatch throws `IOException`, which
    * failfast propagates and permissive turns into a LOGGED salvage
    * instead of a silent one. Bytes after the last valid member that are
    * not a member header are corruption, not padding. */
  final class MultiMemberGzipInputStream(raw: InputStream) extends InputStream {
    private val buf = new Array[Byte](1 << 16)
    private var pos = 0
    private var limit = 0
    private val inflater = new java.util.zip.Inflater(true)
    private val crc = new java.util.zip.CRC32
    private var inMember = false
    private var done = false

    /** ≥1 unconsumed byte in buf, or -1 at raw EOF. */
    private def fill(): Int = {
      if (pos < limit) return limit - pos
      pos = 0
      limit = 0
      val n = raw.read(buf, 0, buf.length)
      if (n < 0) -1 else { limit = n; limit }
    }
    private def readByte(): Int =
      if (fill() < 0) -1 else { val b = buf(pos) & 0xff; pos += 1; b }
    private def readByteOrThrow(what: String): Int = {
      val b = readByte()
      if (b < 0) throw new EOFException(s"EOF inside gzip $what")
      b
    }
    private def skipBytes(n: Int, what: String): Unit =
      (0 until n).foreach(_ => readByteOrThrow(what))
    private def readLeU32(what: String): Long = {
      val a = readByteOrThrow(what); val b = readByteOrThrow(what)
      val c = readByteOrThrow(what); val d = readByteOrThrow(what)
      (a.toLong) | (b.toLong << 8) | (c.toLong << 16) | (d.toLong << 24)
    }

    /** false = clean end of stream; throws on a malformed header. */
    private def startMember(): Boolean = {
      val b0 = readByte()
      if (b0 < 0) { done = true; return false }
      val b1 = readByte()
      if (b0 != 0x1f || b1 != 0x8b)
        throw new java.io.IOException(
          f"corrupt gzip member header: magic $b0%02x${if (b1 < 0) "" else f"$b1%02x"}")
      val cm = readByteOrThrow("header")
      if (cm != 8) throw new java.io.IOException(s"unsupported gzip compression method $cm")
      val flg = readByteOrThrow("header")
      skipBytes(6, "header") // MTIME + XFL + OS
      if ((flg & 0x04) != 0) { // FEXTRA
        val xlen = readByteOrThrow("FEXTRA") | (readByteOrThrow("FEXTRA") << 8)
        skipBytes(xlen, "FEXTRA")
      }
      if ((flg & 0x08) != 0) while (readByteOrThrow("FNAME") != 0) () // FNAME
      if ((flg & 0x10) != 0) while (readByteOrThrow("FCOMMENT") != 0) () // FCOMMENT
      if ((flg & 0x02) != 0) skipBytes(2, "FHCRC")
      inflater.reset()
      crc.reset()
      inMember = true
      true
    }

    private def finishMember(): Unit = {
      pos = limit - inflater.getRemaining // hand unconsumed bytes back
      val wantCrc = readLeU32("trailer")
      val wantSize = readLeU32("trailer")
      if (wantCrc != crc.getValue)
        throw new java.io.IOException(
          f"gzip member CRC mismatch: stored $wantCrc%08x, computed ${crc.getValue}%08x")
      if (wantSize != (inflater.getBytesWritten & 0xffffffffL))
        throw new java.io.IOException("gzip member ISIZE mismatch")
      inMember = false
    }

    // reusable: the header parser reads PER BYTE, and a per-call 1-byte
    // allocation measurably drags the whole-shard read (stream is
    // single-reader by contract)
    private val one = new Array[Byte](1)
    override def read(): Int = {
      val n = read(one, 0, 1)
      if (n < 0) -1 else one(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (true) {
        if (done) return -1
        if (!inMember && !startMember()) return -1
        if (inflater.needsInput) {
          if (fill() < 0) throw new EOFException("EOF inside gzip member")
          inflater.setInput(buf, pos, limit - pos)
          pos = limit
        }
        val n =
          try inflater.inflate(b, off, len)
          catch {
            case e: java.util.zip.DataFormatException =>
              throw new java.io.IOException(s"corrupt DEFLATE data: ${e.getMessage}")
          }
        if (n > 0) { crc.update(b, off, n); return n }
        if (inflater.finished()) finishMember()
        else if (inflater.needsDictionary())
          throw new java.io.IOException("gzip member demands a preset dictionary")
      }
      -1 // unreachable
    }

    override def close(): Unit = {
      inflater.end()
      raw.close()
    }
  }

  /** Short stable tag of a streaming query id for shard names: 8 hex
    * chars of the id's hash, `q0` for an absent id. */
  def queryTag(queryId: String): String =
    if (queryId == null || queryId.isEmpty) "q0"
    else f"q${queryId.hashCode & 0xffffffffL}%08x"

  /** THE shard-listing policy, shared by batch scan and the streaming
    * reader so the two can never diverge on what counts as a shard: glob
    * each path, expand directories one level, keep plain files that are
    * not `_`/`.`-prefixed. `requireNonEmpty` is the batch contract (a
    * path matching nothing is a user error); streaming polls empty dirs
    * as a matter of course. */
  def listShards(conf: Configuration, paths: Seq[String],
      requireNonEmpty: Boolean): Seq[FileStatus] =
    paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Nil)
      if (requireNonEmpty) require(matched.nonEmpty, s"warc path matches nothing: $p")
      matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter(f =>
            f.isFile && !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
        else Seq(st)
      }
    }

  /** Hadoop Configuration that survives Java serialization (the public
    * Writable round-trip — no Spark-internal wrapper). */
  final class SerializableConf(@transient var conf: Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = { out.defaultWriteObject(); conf.write(out) }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject(); conf = new Configuration(false); conf.readFields(in)
    }
  }
}

/** `format("warc")` provider (registered via DataSourceRegister). */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Warc.Schema
  // writes hand the QUERY schema through here (record headers are
  // optional columns, so the table cannot demand its full read schema)
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new WarcTable(paths(new CaseInsensitiveStringMap(properties)), schema)

  /** `load(p)` arrives as `path`; `load(p1, p2, …)` as a JSON array in
    * `paths` — decoded with a real JSON parser (Jackson, already on the
    * Spark classpath) so the full escape set (\n, \t, \uXXXX, …) in a
    * path round-trips, not just \" and \\. */
  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map { js =>
      try new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(js, classOf[Array[String]]).toSeq
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(
            s"warc source: paths option is not a JSON string array: $js", e)
      }
    }.getOrElse(Nil)
    val single = Option(options.get("path")).toSeq
    val all = multi ++ single
    require(all.nonEmpty, "warc source needs a path: spark.read.format(\"warc\").load(<path>)")
    all
  }
}

class WarcTable(paths: Seq[String], tableSchema: StructType = Warc.Schema)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"warc(${paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val mode = Option(options.get("mode")).getOrElse("permissive").toLowerCase(java.util.Locale.ROOT)
    require(mode == "permissive" || mode == "failfast",
      s"warc mode must be permissive or failfast, got $mode")
    val stability = Option(options.get("fileStabilityPolls")).map(_.toInt).getOrElse(1)
    require(stability >= 1, s"warc fileStabilityPolls must be >= 1, got $stability")
    new WarcScanBuilder(paths, permissive = mode == "permissive", stabilityPolls = stability)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(paths.size == 1, s"warc write needs exactly one target directory, got $paths")
    new WarcWriteBuilder(paths.head, info.schema(), info.options(), info.queryId())
  }
}

class WarcScanBuilder(paths: Seq[String], permissive: Boolean = true, stabilityPolls: Int = 1)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = Warc.Schema
  private var typeFilter: Set[String] = null // null = no filter
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** `record_type` EqualTo/In are handled EXACTLY in the reader (and gate
    * payload materialization), so they need no re-evaluation; everything
    * else stays post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accept, rest) = filters.partition {
      case EqualTo("record_type", _: String) => true
      case In("record_type", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    pushed = accept
    typeFilter =
      if (accept.isEmpty) null
      else accept.map {
        case EqualTo(_, v: String) => Set(v)
        case In(_, vs) => vs.map(_.asInstanceOf[String]).toSet
        case f => throw new IllegalStateException(s"unexpected pushed filter $f")
      }.reduce(_ intersect _)
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new WarcScan(paths, required, typeFilter, permissive, stabilityPolls)
}

class WarcScan(paths: Seq[String], required: StructType, typeFilter: Set[String],
    permissive: Boolean = true, stabilityPolls: Int = 1)
    extends Scan with Batch with SupportsReportStatistics {
  private lazy val files: Seq[FileStatus] =
    Warc.listShards(SparkSession.active.sessionState.newHadoopConf(), paths,
      requireNonEmpty = true)

  override def readSchema(): StructType = required
  override def description(): String = {
    val tf = if (typeFilter == null) "" else s", type=${typeFilter.toSeq.sorted.mkString("|")}"
    s"warc[${required.fieldNames.mkString(",")}$tf]"
  }
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new WarcMicroBatchStream(paths, required, typeFilter, checkpointLocation, permissive,
      stabilityPolls)

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(files.map(_.getLen).sum)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => WarcInputPartition(f.getPath.toString): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new Warc.SerializableConf(SparkSession.active.sessionState.newHadoopConf())
    WarcReaderFactory(required, typeFilter, conf, permissive)
  }
}

case class WarcInputPartition(path: String) extends InputPartition

/** Continuous crawl ingestion: `spark.readStream.format("warc")` discovers
  * shards as they land and emits each exactly once, so arriving WET files
  * flow straight into the streaming curation gates (`bloomGate`,
  * streaming dedup/contamination) with no batch re-run.
  *
  * Offset design: a monotone batch id; the id → file-list assignment is
  * persisted under `<checkpoint>/warc-batches/<id>` BEFORE the offset is
  * returned, so a crashed run recovers the exact same batch membership
  * (replays are byte-identical — the WAL semantics Structured Streaming
  * expects of a source). `commit` keeps the log: it is the seen-files set
  * on restart. One file = one partition, as in batch. Files are assumed
  * immutable once visible (the crawl-shard contract); a shard REPLACED
  * in-place with new content is not re-read.
  *
  * Shards MUST land via atomic rename: a file discovered while still
  * being copied in (non-atomic upload) is read truncated — permissive
  * mode salvages the prefix — and, once in the seen-set, is never
  * re-read when the rest of its bytes arrive. Two guards: names ending
  * in `.inprogress` / `.tmp` / `._COPYING_` (the hadoop `fs -put` temp
  * suffix) are never discovered, and option `fileStabilityPolls = k`
  * (default 1 = commit on first sight) defers a fresh file until its
  * (length, mtime) was identical across `k` consecutive polls — for
  * uploaders that can neither rename atomically nor mark in-progress
  * files. The stability gate applies to continuously-polling streams;
  * a one-shot `Trigger.AvailableNow` run polls once and so only picks
  * up already-stable files on its NEXT run. */
class WarcMicroBatchStream(paths: Seq[String], required: StructType, typeFilter: Set[String],
    checkpointLocation: String, permissive: Boolean = true, stabilityPolls: Int = 1)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private val conf = SparkSession.active.sessionState.newHadoopConf()
  private val logDir = new Path(checkpointLocation, "warc-batches")
  private val fs = logDir.getFileSystem(conf)
  fs.mkdirs(logDir)

  /** batch id → files, recovered from the persisted log on construction. */
  private var batches: scala.collection.immutable.TreeMap[Long, Seq[String]] = {
    val entries = Option(fs.listStatus(logDir)).getOrElse(Array.empty[FileStatus])
      .filter(_.isFile).flatMap { st =>
        st.getPath.getName.toLongOption.map { id =>
          val in = fs.open(st.getPath)
          val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
          id -> lines.filter(_.nonEmpty)
        }
      }
    scala.collection.immutable.TreeMap.from(entries)
  }
  private def lastId: Long = if (batches.isEmpty) -1L else batches.lastKey
  private var availableNowTarget: Long = -2L // -2 = not in AvailableNow mode

  private def listFiles(): Seq[FileStatus] =
    Warc.listShards(conf, paths, requireNonEmpty = false)
      .filterNot { st =>
        val n = st.getPath.getName
        n.endsWith(".inprogress") || n.endsWith(".tmp") || n.endsWith("._COPYING_")
      }

  /** path → (len, mtime, consecutive polls with that exact signature) —
    * the `fileStabilityPolls` deferral state; in-memory only (a restart
    * restarts the count, which is the conservative direction). */
  private val pendingStability =
    scala.collection.mutable.HashMap.empty[String, (Long, Long, Int)]

  /** Discover new files; persist the batch BEFORE exposing its offset. */
  private def discover(): Long = synchronized {
    val seen = batches.valuesIterator.flatten.toSet
    val candidates = listFiles().filter(st => !seen(st.getPath.toString))
    val fresh: Seq[String] =
      if (stabilityPolls <= 1) candidates.map(_.getPath.toString).sorted
      else {
        val ready = Seq.newBuilder[String]
        val live = candidates.map { st =>
          val p = st.getPath.toString
          val sig = (st.getLen, st.getModificationTime)
          val count = pendingStability.get(p) match {
            case Some((l, m, c)) if (l, m) == sig => c + 1
            case _ => 1 // new, or changed since last poll: restart the count
          }
          if (count >= stabilityPolls) ready += p
          p -> ((sig._1, sig._2, count))
        }
        pendingStability.clear()
        val readySet = ready.result().toSet
        pendingStability ++= live.filterNot { case (p, _) => readySet(p) }
        readySet.toSeq.sorted
      }
    if (fresh.nonEmpty) {
      val id = lastId + 1
      val out = fs.create(new Path(logDir, id.toString), false)
      try out.write((fresh.mkString("\n") + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      batches += id -> fresh
    }
    lastId
  }

  override def initialOffset(): Offset = WarcStreamOffset(-1L)
  override def latestOffset(): Offset = WarcStreamOffset(discover())
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    if (availableNowTarget != -2L) WarcStreamOffset(availableNowTarget)
    else WarcStreamOffset(discover())
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = WarcStreamOffset(lastId)
  override def prepareForTriggerAvailableNow(): Unit = availableNowTarget = discover()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WarcStreamOffset].batchId
    val e = end.asInstanceOf[WarcStreamOffset].batchId
    batches.range(s + 1, e + 1).valuesIterator.flatten
      .map(f => WarcInputPartition(f): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(required, typeFilter, new Warc.SerializableConf(conf), permissive)
  override def deserializeOffset(json: String): Offset = WarcStreamOffset(json.toLong)
  override def commit(end: Offset): Unit = () // the log IS the seen-set on restart
  override def stop(): Unit = ()
}

case class WarcStreamOffset(batchId: Long) extends Offset {
  override def json(): String = batchId.toString
}

/** `df.write.format("warc").mode("append"|"overwrite").save(dir)` — the
  * export leg: curated corpora ship back out as WET shards, the same
  * interchange format they arrived in. Each task writes ONE shard
  * (`part-<task>-<uuid>.warc.wet[.gz]`, per-record gzip members — the
  * Common Crawl layout the read side walks), so output parallelism =
  * write parallelism and a re-read gets file-level parallelism back.
  *
  * Row → record mapping: `content` (binary or string) is required;
  * `record_id` / `record_type` / `target_uri` / `warc_date` /
  * `content_type` are honored when present (defaults: a fresh urn:uuid,
  * `conversion`, absent, Unix epoch, `text/plain`). Option
  * `compression=none` writes plain shards.
  *
  * Commit protocol: tasks write `_tmp-` files and RENAME on task commit
  * (the driver-side commit coordinator guarantees one winner per task);
  * abort deletes the temp. Overwrite records the pre-existing shard set
  * at build time and deletes it in the driver commit, AFTER every task
  * succeeded — new shards are uuid-named, so old and new never collide. */
class WarcWriteBuilder(dir: String, schema: StructType, options: CaseInsensitiveStringMap,
    queryId: String) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    require(schema.fieldNames.contains("content"),
      s"warc write needs a content column, got ${schema.fieldNames.mkString(",")}")
    val unknown = schema.fieldNames.toSet --
      Set("content", "record_id", "record_type", "target_uri", "warc_date", "content_type")
    require(unknown.isEmpty, s"warc write: unmapped columns ${unknown.mkString(",")} " +
      "(writable: content, record_id, record_type, target_uri, warc_date, content_type)")
    val gzip = Option(options.get("compression")).forall(_ != "none")
    new WarcWrite(dir, schema, gzip, doTruncate, queryId)
  }
}

class WarcWrite(dir: String, schema: StructType, gzip: Boolean, truncate: Boolean,
    queryId: String = "") extends Write with BatchWrite {
  private val conf = new Warc.SerializableConf(SparkSession.active.sessionState.newHadoopConf())
  // overwrite: snapshot the existing shards NOW, delete them on commit
  private val oldFiles: Seq[String] =
    if (!truncate) Nil
    else {
      val p = new Path(dir)
      val fs = p.getFileSystem(conf.conf)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
        .map(_.getPath.toString)
    }

  override def toBatch: BatchWrite = this
  override def description(): String = s"warc-write[$dir${if (truncate) ", overwrite" else ""}]"
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    WarcWriterFactory(dir, schema, gzip, conf)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(conf.conf)
    oldFiles.foreach(f => fs.delete(new Path(f), false))
    // a truncated table's history is gone: stale streaming epoch logs
    // must not outlive the shards they describe
    if (truncate) fs.delete(new Path(dir, "_warc_epochs"), true)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(conf.conf)
    messages.foreach {
      case WarcCommitMessage(path) if path != null => fs.delete(new Path(path), false)
      case _ => ()
    }
  }

  override def toStreaming: StreamingWrite = {
    require(!truncate, "warc streaming write is append-only (outputMode append)")
    new WarcStreamingWrite(dir, schema, gzip, conf, queryId)
  }
}

/** Continuous WET export — the write twin of the streaming WARC read: a
  * curation `writeStream` ships each micro-batch out as epoch-stamped
  * shards (`part-e<epoch>-<partition>-<uuid>`).
  *
  * Exactly-once on replay: task commits rename shards into place as in
  * batch, then the DRIVER commit for epoch N (a) deletes any
  * `part-e<N>-*` strays a crashed earlier attempt left behind, and
  * (b) records the committed shard set under `_warc_epochs/<N>`,
  * created exclusively. If that log entry already exists the epoch was
  * committed by a previous attempt (driver died between sink commit and
  * the offset log) — the replay's own shards are the duplicates, and
  * they are deleted instead. A re-read of the directory therefore sees
  * each record exactly once, whatever the crash point. The `_`-prefixed
  * log dir is invisible to the read side's shard listing.
  *
  * The log is namespaced per QUERY (`_warc_epochs/<queryId>/<epoch>` —
  * Spark's queryId is the checkpoint-persistent stream id, stable across
  * restarts of the same query): a NEW query appending to a directory a
  * previous query once wrote restarts its epochs at 0, and without the
  * namespace its first commits would find the old query's log entries
  * and misread themselves as replays — silently deleting every shard
  * they just wrote. */
class WarcStreamingWrite(dir: String, schema: StructType, gzip: Boolean,
    conf: Warc.SerializableConf, queryId: String) extends StreamingWrite {
  import java.nio.charset.StandardCharsets.UTF_8

  // short stable query tag, embedded in shard names: the stray sweep for
  // (query, epoch) must never match ANOTHER query's committed epoch-N
  // shards sharing the directory
  private val qtag = Warc.queryTag(queryId)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    WarcStreamingWriterFactory(dir, schema, gzip, conf, qtag)

  private def epochLog(epochId: Long) = {
    val ns = if (queryId == null || queryId.isEmpty) "default" else queryId
    new Path(new Path(new Path(dir, "_warc_epochs"), ns), epochId.toString)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf.conf)
    // compare by shard NAME (uuid-unique): listStatus returns qualified
    // URIs (file:/…) while commit messages carry the writer's raw path
    val mine = messages.collect {
      case WarcCommitMessage(p) if p != null => new Path(p).getName
    }.toSet
    val log = epochLog(epochId)
    if (fs.exists(log)) {
      // replayed epoch: the earlier attempt's shard set is canonical
      val in = fs.open(log)
      val committed =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toSet
        finally in.close()
      (mine -- committed).foreach(n => fs.delete(new Path(dirPath, n), false))
    } else {
      // strays of THIS query's epoch from a crashed attempt that never
      // committed (the qtag keeps other queries' epoch-N shards out)
      val prefix = f"part-$qtag-e$epochId%d-"
      Option(fs.listStatus(dirPath)).getOrElse(Array.empty)
        .filter(st => st.isFile && st.getPath.getName.startsWith(prefix))
        .map(_.getPath.getName).filterNot(mine)
        .foreach(n => fs.delete(new Path(dirPath, n), false))
      fs.mkdirs(log.getParent)
      val out = fs.create(log, false) // exclusive: the atomic commit point
      try out.write((mine.toSeq.sorted.mkString("\n") + "\n").getBytes(UTF_8))
      finally out.close()
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(conf.conf)
    messages.foreach {
      case WarcCommitMessage(path) if path != null => fs.delete(new Path(path), false)
      case _ => ()
    }
  }
}

case class WarcStreamingWriterFactory(dir: String, schema: StructType, gzip: Boolean,
    conf: Warc.SerializableConf, qtag: String) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(dir, schema, gzip, conf.conf, partitionId, taskId,
      namePrefix = f"part-$qtag-e$epochId%d-$partitionId%05d")
}

case class WarcCommitMessage(path: String) extends WriterCommitMessage

case class WarcWriterFactory(dir: String, schema: StructType, gzip: Boolean,
    conf: Warc.SerializableConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(dir, schema, gzip, conf.conf, partitionId, taskId)
}

class WarcDataWriter(dir: String, schema: StructType, gzip: Boolean, conf: Configuration,
    partitionId: Int, taskId: Long, namePrefix: String = null) extends DataWriter[InternalRow] {
  import java.nio.charset.StandardCharsets.UTF_8

  private val ext = if (gzip) ".warc.wet.gz" else ".warc.wet"
  private val finalName = {
    val prefix = if (namePrefix != null) namePrefix else f"part-$partitionId%05d"
    s"$prefix-${java.util.UUID.randomUUID()}$ext"
  }
  private val tmpPath = new Path(dir, s"_tmp-$finalName")
  private val finalPath = new Path(dir, finalName)
  private val fs = tmpPath.getFileSystem(conf)
  private val out = new java.io.BufferedOutputStream(fs.create(tmpPath, true), 1 << 16)
  private var wrote = false

  // one reused native Deflater per SHARD, reset per record: a fresh
  // GZIPOutputStream per member pays a native-Deflater alloc/init/end
  // cycle on every record — ~11% of the export leg at 1M docs
  // (WarcBench 5.45 s -> 4.85 s; DEFLATE itself dominates the rest) and
  // native-memory churn the GC cleaner would otherwise absorb across
  // billions of records. The member bytes are the same format (10-byte
  // gzip header, raw DEFLATE, CRC32+ISIZE little-endian trailer).
  private val deflater =
    if (gzip) new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true) else null
  private val crc = new java.util.zip.CRC32
  private val defBuf = new Array[Byte](1 << 16)
  private val gzHeader = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0)

  private def writeLe(v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  private def writeGzMember(rec: Array[Byte]): Unit = {
    out.write(gzHeader)
    deflater.reset()
    deflater.setInput(rec)
    deflater.finish()
    while (!deflater.finished()) {
      val n = deflater.deflate(defBuf)
      if (n > 0) out.write(defBuf, 0, n)
    }
    crc.reset()
    crc.update(rec)
    writeLe(crc.getValue.toInt)
    writeLe(rec.length)
  }

  private val idx: Map[String, Int] =
    schema.fieldNames.zipWithIndex.toMap
  private val contentIsString =
    schema(schema.fieldIndex("content")).dataType.isInstanceOf[StringType]

  private def strCol(row: InternalRow, name: String): String =
    idx.get(name).filterNot(row.isNullAt).map(row.getUTF8String(_).toString).orNull

  /** WARC headers are CRLF-framed: a header VALUE containing CR or LF
    * would terminate the line early and corrupt the record framing for
    * every later record in the shard. Fail the row loudly instead of
    * writing a malformed archive. */
  private def headerSafe(name: String, v: String): String = {
    if (v != null && v.exists(c => c == '\r' || c == '\n'))
      throw new IllegalArgumentException(
        s"warc write: column $name contains CR/LF (${v.take(80).replace("\r", "\\r")
          .replace("\n", "\\n")}…) — header values must be single-line; " +
          "strip control characters before writing")
    v
  }

  override def write(row: InternalRow): Unit = {
    val ci = idx("content")
    val payload: Array[Byte] =
      if (row.isNullAt(ci)) Array.empty
      else if (contentIsString) row.getUTF8String(ci).getBytes
      else row.getBinary(ci)
    val h = new StringBuilder(256)
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: ${Option(headerSafe("record_type", strCol(row, "record_type"))).getOrElse("conversion")}\r\n"
    h ++= s"WARC-Record-ID: ${Option(headerSafe("record_id", strCol(row, "record_id")))
      .getOrElse(s"<urn:uuid:${java.util.UUID.randomUUID()}>")}\r\n"
    h ++= s"WARC-Date: ${Option(headerSafe("warc_date", strCol(row, "warc_date"))).getOrElse("1970-01-01T00:00:00Z")}\r\n"
    Option(headerSafe("target_uri", strCol(row, "target_uri"))).foreach(u => h ++= s"WARC-Target-URI: $u\r\n")
    h ++= s"Content-Type: ${Option(headerSafe("content_type", strCol(row, "content_type"))).getOrElse("text/plain")}\r\n"
    h ++= s"Content-Length: ${payload.length}\r\n\r\n"
    val rec = h.toString.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
    if (gzip) writeGzMember(rec) // one member per record — the Common Crawl layout
    else out.write(rec)
    wrote = true
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    if (!wrote) { fs.delete(tmpPath, false); return WarcCommitMessage(null) }
    require(fs.rename(tmpPath, finalPath), s"warc write: rename to $finalPath failed")
    WarcCommitMessage(finalPath.toString)
  }
  override def abort(): Unit = {
    try out.close() catch { case _: java.io.IOException => () }
    fs.delete(tmpPath, false)
  }
  override def close(): Unit = if (deflater != null) deflater.end()
}

case class WarcReaderFactory(required: StructType, typeFilter: Set[String],
    conf: Warc.SerializableConf, permissive: Boolean = true) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(partition.asInstanceOf[WarcInputPartition].path, required, typeFilter,
      conf.conf, permissive)
}

class WarcPartitionReader(path: String, required: StructType, typeFilter: Set[String],
    conf: Configuration, permissive: Boolean = true) extends PartitionReader[InternalRow] {
  private val hPath = new Path(path)
  private val raw = hPath.getFileSystem(conf).open(hPath)
  // decompressor opens lazily INSIDE next()'s try: a corrupt gzip header
  // (GZIPInputStream validates on construction) salvages as 0 records in
  // permissive mode instead of failing the task
  private var inOpened: InputStream = null
  private def in: InputStream = {
    if (inOpened == null) {
      val buffered = new BufferedInputStream(raw, 1 << 16)
      // NOT the JDK GZIPInputStream: that one swallows a corrupt
      // next-member header as clean EOF (silent shard truncation). The
      // outer buffer batches the parser's per-byte header reads into
      // bulk inflate calls.
      inOpened =
        if (path.endsWith(".gz"))
          new BufferedInputStream(new Warc.MultiMemberGzipInputStream(buffered), 1 << 16)
        else buffered
    }
    inOpened
  }
  private var parserOpened: Warc.Parser = null
  private def parser: Warc.Parser = {
    if (parserOpened == null) parserOpened = new Warc.Parser(in)
    parserOpened
  }
  private val wantContent = required.fieldNames.contains("content")
  private val wantHttpMeta = required.fieldNames
    .exists(n => n == "http_status" || n == "http_content_type")
  private val fileUtf8 = UTF8String.fromString(path)
  private val getters: Array[Warc.Record => Any] = required.fieldNames.map {
    case "warc_file" => (_: Warc.Record) => fileUtf8
    case "record_id" => (r: Warc.Record) => utf8(r.header("warc-record-id"))
    case "record_type" => (r: Warc.Record) => utf8(r.header("warc-type"))
    case "target_uri" => (r: Warc.Record) => utf8(r.header("warc-target-uri"))
    case "warc_date" => (r: Warc.Record) => utf8(r.header("warc-date"))
    case "content_type" => (r: Warc.Record) => utf8(r.header("content-type"))
    case "content_length" => (r: Warc.Record) => r.contentLength
    case "http_status" => (r: Warc.Record) => r.httpStatus
    case "http_content_type" => (r: Warc.Record) => utf8(r.httpContentType)
    case "content" => (r: Warc.Record) => r.payload
    case other => throw new IllegalArgumentException(s"unknown warc column $other")
  }
  private def utf8(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)

  private var current: Warc.Record = null

  /** `mode=permissive` (default): a shard whose byte stream dies mid-read
    * — truncated gzip member, corrupt DEFLATE data, a >64 KiB header line
    * — yields the records decoded so far and ends; the salvage is logged
    * per file. `mode=failfast` propagates, failing the task (and job).
    * At crawl scale a handful of damaged shards out of thousands must not
    * kill a 100 TB pass. */
  override def next(): Boolean =
    try nextRecord()
    catch {
      case e @ (_: java.io.IOException | _: IllegalArgumentException) if permissive =>
        WarcPartitionReader.log.warn(
          s"warc permissive mode: salvaged prefix of $path and stopped (${e.getMessage})")
        current = null
        false
    }

  private def nextRecord(): Boolean = {
    current = null
    while (current == null) {
      // a record with NO WARC-Type header has record_type NULL — SQL
      // equality never matches NULL, and pushed filters are reported
      // fully handled, so such records must be non-matching here (a
      // getOrElse("") would wrongly match a pushed record_type = '')
      val r = parser.next { hs =>
        if (typeFilter != null && !hs.get("warc-type").exists(typeFilter.contains))
          Warc.PayloadNeed.Skip
        else if (wantContent) Warc.PayloadNeed.Full
        else if (wantHttpMeta) Warc.PayloadNeed.EnvelopeOnly
        else Warc.PayloadNeed.Skip
      }
      if (r == null) return false
      if (typeFilter == null || r.headers.get("warc-type").exists(typeFilter.contains))
        current = r
    }
    true
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(getters.length)
    var i = 0
    while (i < getters.length) { row.update(i, getters(i)(current)); i += 1 }
    row
  }

  override def close(): Unit =
    try { if (inOpened != null) inOpened.close() else raw.close() }
    catch { case _: EOFException | _: java.io.IOException => () }
}

object WarcPartitionReader {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[WarcPartitionReader])
}
