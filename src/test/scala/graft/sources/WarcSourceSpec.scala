package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The `format("warc")` DataSource V2 against byte-exact synthetic WET/WARC
  * shards — plain and Common-Crawl-style per-record-gzip-member files. */
class WarcSourceSpec extends SparkSpec {
  import spark.implicits._

  private def record(tpe: String, uri: String, payload: Array[Byte],
      ctype: String = "text/plain", extra: String = ""): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $tpe\r\n"
    if (uri != null) h ++= s"WARC-Target-URI: $uri\r\n"
    h ++= "WARC-Date: 2026-08-14T00:00:00Z\r\n"
    h ++= s"WARC-Record-ID: <urn:uuid:$tpe-${if (uri == null) "x" else uri.length}>\r\n"
    h ++= extra
    h ++= s"Content-Type: $ctype\r\n"
    h ++= s"Content-Length: ${payload.length}\r\n"
    h ++= "\r\n"
    h.toString.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def gzMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  private def tempDir(): Path = {
    val d = Files.createTempDirectory("warcspec")
    d.toFile.deleteOnExit()
    d
  }

  private val wetBytes: Array[Byte] =
    record("warcinfo", null, "software: synthetic\r\n".getBytes(UTF_8),
      ctype = "application/warc-fields") ++
    record("conversion", "https://a.example.com/1", "hello wet world".getBytes(UTF_8)) ++
    record("conversion", "https://b.example.org/2", "héllo — unicode ✓".getBytes(UTF_8))

  test("plain WET file: all columns round-trip, unicode payload intact") {
    val dir = tempDir()
    Files.write(dir.resolve("part0.warc.wet"), wetBytes)
    val df = Warc.read(spark, dir.toString)
    val got = df.select(col("record_type"), col("target_uri"), col("content_type"),
      col("content_length"), Warc.wetText(col("content")).as("text"))
      .as[(String, String, String, Long, String)].collect().sortBy(r => (r._1, String.valueOf(r._2)))
    assert(got.toSeq == Seq(
      ("conversion", "https://a.example.com/1", "text/plain", 15L, "hello wet world"),
      ("conversion", "https://b.example.org/2", "text/plain",
        "héllo — unicode ✓".getBytes(UTF_8).length.toLong, "héllo — unicode ✓"),
      ("warcinfo", null, "application/warc-fields", 21L, "software: synthetic\r\n")))
    assert(df.select("record_id").as[String].collect().forall(_.startsWith("<urn:uuid:")))
    assert(df.select("warc_date").distinct().as[String].head() == "2026-08-14T00:00:00Z")
  }

  test("multi-member gzip (Common Crawl shape): one stream walks every member") {
    val dir = tempDir()
    val gz = gzMember(record("warcinfo", null, "x".getBytes(UTF_8))) ++
      gzMember(record("conversion", "https://c.example.com", "gzipped body".getBytes(UTF_8))) ++
      gzMember(record("conversion", "https://d.example.com", "second member".getBytes(UTF_8)))
    Files.write(dir.resolve("part0.warc.wet.gz"), gz)
    val got = Warc.read(spark, dir.toString)
      .select(col("target_uri"), Warc.wetText(col("content")))
      .as[(String, String)].collect().toSet
    assert(got == Set((null, "x"), ("https://c.example.com", "gzipped body"),
      ("https://d.example.com", "second member")))
  }

  test("one partition per file — the shard is the scale-out unit") {
    val dir = tempDir()
    (0 until 3).foreach(i => Files.write(dir.resolve(s"part$i.warc.wet"), wetBytes))
    val df = Warc.read(spark, dir.toString)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 9)
    assert(df.select("warc_file").distinct().count() == 3)
  }

  test("column pruning reaches the scan; record_type filter pushes down") {
    val dir = tempDir()
    Files.write(dir.resolve("part0.warc.wet"), wetBytes)
    val pruned = Warc.read(spark, dir.toString).select("target_uri", "content_length")
    val planP = pruned.queryExecution.executedPlan.toString
    assert(planP.contains("warc[target_uri,content_length]"),
      s"content must be pruned out of the scan (payloads skipped, not read):\n$planP")
    val filtered = Warc.read(spark, dir.toString)
      .filter(col("record_type") === "conversion").select("target_uri")
    val planF = filtered.queryExecution.executedPlan.toString
    assert(planF.contains("type=conversion"),
      s"record_type equality must reach the reader:\n$planF")
    assert(filtered.as[String].collect().toSet ==
      Set("https://a.example.com/1", "https://b.example.org/2"))
  }

  test("garbage between records is skipped; a truncated final record is dropped") {
    val dir = tempDir()
    val full = record("conversion", "https://ok.example.com", "good".getBytes(UTF_8))
    val truncated = record("conversion", "https://cut.example.com",
      "this payload is long".getBytes(UTF_8)).dropRight(12) // cut inside payload
    Files.write(dir.resolve("part0.warc"),
      "junk preamble\r\n\r\n".getBytes(UTF_8) ++ full ++ "stray bytes\r\n".getBytes(UTF_8) ++ truncated)
    val got = Warc.read(spark, dir.toString)
      .select(col("target_uri"), Warc.wetText(col("content")))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("https://ok.example.com", "good")))
  }

  test("permissive mode salvages a shard whose gzip stream dies mid-file") {
    val dir = tempDir()
    val goodMember = gzMember(record("conversion", "https://kept.example.com", "kept".getBytes(UTF_8)))
    val dying = gzMember(record("conversion", "https://lost.example.com",
      "never fully decompresses".getBytes(UTF_8)))
    // truncation inside the second member's DEFLATE data + a corrupt copy
    Files.write(dir.resolve("truncated.warc.wet.gz"), goodMember ++ dying.dropRight(14))
    val corrupt = dying.clone()
    (12 until 18).foreach(i => corrupt(i) = (corrupt(i) ^ 0x5a).toByte)
    Files.write(dir.resolve("corrupt.warc.wet.gz"), goodMember ++ corrupt)
    val got = Warc.read(spark, dir.toString)
      .select(col("target_uri")).as[String].collect().toSeq
    assert(got == Seq("https://kept.example.com", "https://kept.example.com"),
      s"each damaged shard must yield its decoded prefix, got $got")
  }

  test("permissive mode: a shard that is not gzip at all reads as empty, others still read") {
    val dir = tempDir()
    Files.write(dir.resolve("bad.warc.wet.gz"), "this is not a gzip file".getBytes(UTF_8))
    Files.write(dir.resolve("good.warc.wet"), wetBytes)
    assert(Warc.read(spark, dir.toString).count() == 3) // bad shard contributes 0, job survives
  }

  test("failfast mode propagates stream corruption and fails the job") {
    val dir = tempDir()
    Files.write(dir.resolve("bad.warc.wet.gz"), "this is not a gzip file".getBytes(UTF_8))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("warc").option("mode", "failfast").load(dir.toString).count()
    }
    assert(Option(e.getMessage).exists(m => m.contains("GZIP") || m.contains("gzip"))
      || e.getCause != null)
    // mode is validated when the scan is BUILT (planning), not at load()
    val bogus = intercept[Exception] {
      spark.read.format("warc").option("mode", "bogus").load(dir.toString).count()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(bogus).exists(t => String.valueOf(t.getMessage).contains("permissive or failfast")))
  }

  test("folded header continuations join with a space") {
    val dir = tempDir()
    Files.write(dir.resolve("part0.warc"),
      record("conversion", "https://e.example.com", "p".getBytes(UTF_8),
        extra = "WARC-Concurrent-To: <urn:uuid:one>\r\n <urn:uuid:two>\r\n"))
    // the folded header must not derail target_uri/content parsing
    val got = Warc.read(spark, dir.toString)
      .select(col("target_uri"), col("content_length")).as[(String, Long)].head()
    assert(got == (("https://e.example.com", 1L)))
  }

  test("adversarial payloads round-trip byte-exact (property): embedded WARC markers, CRLFs, binary") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // payloads that LOOK like record boundaries must not derail the
    // Content-Length framing
    val nasty = Gen.oneOf(
      Gen.const("WARC/1.0\r\nWARC-Type: conversion\r\n\r\n".getBytes(UTF_8)),
      Gen.const("\r\n\r\nContent-Length: 0\r\n".getBytes(UTF_8)),
      Gen.const(Array.empty[Byte]),
      Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      Gen.alphaStr.map(_.getBytes(UTF_8)))
    val prop = Prop.forAll(Gen.listOfN(5, nasty)) { (payloads: List[Array[Byte]]) =>
      val bytes = payloads.zipWithIndex.flatMap { case (p, i) =>
        record("conversion", s"https://p.example.com/$i", p)
      }.toArray
      val parser = new Warc.Parser(new java.io.ByteArrayInputStream(bytes))
      val got = Iterator.continually(parser.next(_ => Warc.PayloadNeed.Full))
        .takeWhile(_ != null).toList
      got.length == payloads.length &&
        got.zip(payloads).forall { case (r, p) => java.util.Arrays.equals(r.payload, p) } &&
        got.zipWithIndex.forall { case (r, i) =>
          r.header("warc-target-uri") == s"https://p.example.com/$i" }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(80), prop)
    assert(res.passed, res.status.toString)
  }

  test("streaming ingestion: each arriving shard lands exactly once across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tempDir()
    val ckpt = tempDir()
    val out = tempDir().resolve("out").toString
    // the parquet sink recovers from the checkpoint (memory sink cannot),
    // so the CUMULATIVE output across restarts proves exactly-once
    def runOnce(): Seq[String] = {
      val q = spark.readStream.format("warc").load(dir.toString)
        .filter(col("record_type") === "conversion")
        .select(col("target_uri"), Warc.wetText(col("content")).as("text"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).select("target_uri").as[String].collect().toSeq.sorted
    }
    Files.write(dir.resolve("shard0.warc.wet"), wetBytes)
    assert(runOnce() == Seq("https://a.example.com/1", "https://b.example.org/2"))
    // a new shard arrives: ONLY its records flow through the restart
    Files.write(dir.resolve("shard1.warc.wet.gz"),
      gzMember(record("conversion", "https://new.example.com", "fresh shard".getBytes(UTF_8))))
    assert(runOnce() == Seq("https://a.example.com/1", "https://b.example.org/2",
      "https://new.example.com"))
    // nothing new: the restart re-emits NOTHING (no duplicates, no loss)
    assert(runOnce() == Seq("https://a.example.com/1", "https://b.example.org/2",
      "https://new.example.com"))
  }

  test("streaming write: warc in, warc out, exactly-once across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val src = tempDir()
    val ckpt = tempDir()
    val out = tempDir().resolve("wet-out").toString
    def runOnce(): Seq[String] = {
      val q = spark.readStream.format("warc").load(src.toString)
        .filter(col("record_type") === "conversion")
        .select(col("record_id"), col("record_type"), col("target_uri"), col("content"))
        .writeStream.format("warc").option("path", out)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      Warc.read(spark, out).select("target_uri").as[String].collect().toSeq.sorted
    }
    Files.write(src.resolve("shard0.warc.wet"), wetBytes)
    assert(runOnce() == Seq("https://a.example.com/1", "https://b.example.org/2"))
    Files.write(src.resolve("shard1.warc.wet.gz"),
      gzMember(record("conversion", "https://s.example.com", "streamed".getBytes(UTF_8))))
    assert(runOnce() == Seq("https://a.example.com/1", "https://b.example.org/2",
      "https://s.example.com"))
    // restart with nothing new: no duplicates, no loss
    assert(runOnce() == Seq("https://a.example.com/1", "https://b.example.org/2",
      "https://s.example.com"))
    // payload round-trips byte-exact through the full warc->warc loop
    val texts = Warc.read(spark, out).select(Warc.wetText(col("content")).as("t"))
      .as[String].collect().toSet
    assert(texts == Set("hello wet world", "héllo — unicode ✓", "streamed"))
  }

  test("streaming write: a replayed epoch commit deletes its duplicate shards") {
    import org.apache.spark.sql.types._
    val dir = tempDir().resolve("out").toString
    Files.createDirectories(java.nio.file.Paths.get(dir))
    val schema = StructType(Seq(StructField("content", BinaryType)))
    val conf = new Warc.SerializableConf(spark.sessionState.newHadoopConf())
    val sw = new WarcStreamingWrite(dir, schema, gzip = false, conf, queryId = "queryA")
    val t = Warc.queryTag("queryA")
    def shard(name: String): WarcCommitMessage = {
      val p = java.nio.file.Paths.get(dir, name)
      Files.write(p, record("conversion", "https://x.example.com", "x".getBytes(UTF_8)))
      WarcCommitMessage(p.toString)
    }
    // crashed attempt left a stray for epoch 7 that no commit message covers
    val stray = shard(s"part-$t-e7-00000-stray.warc.wet")
    val a = shard(s"part-$t-e7-00000-attempt-a.warc.wet")
    // ANOTHER query's committed epoch-7 shard shares the directory: the
    // sweep must never touch it
    val otherQ = shard(s"part-${Warc.queryTag("queryB")}-e7-00000-b.warc.wet")
    sw.commit(7L, Array(a))
    assert(!Files.exists(java.nio.file.Paths.get(stray.path)), "stray of the epoch must be swept")
    assert(Files.exists(java.nio.file.Paths.get(a.path)))
    assert(Files.exists(java.nio.file.Paths.get(otherQ.path)),
      "another query's epoch-7 shards are NOT this query's strays")
    // driver died between sink commit and offset log -> the epoch replays
    val b = shard(s"part-$t-e7-00001-attempt-b.warc.wet")
    sw.commit(7L, Array(b))
    assert(!Files.exists(java.nio.file.Paths.get(b.path)), "replay shards are the duplicates")
    assert(Files.exists(java.nio.file.Paths.get(a.path)), "the committed set is canonical")
    // an e17 shard is NOT an e7 stray (prefix match must not cross epochs)
    val e17 = shard(s"part-$t-e17-00000-z.warc.wet")
    val a8 = shard(s"part-$t-e8-00000-a.warc.wet")
    sw.commit(8L, Array(a8))
    assert(Files.exists(java.nio.file.Paths.get(e17.path)))
  }

  test("streaming write: a fresh query appending to a previously-written dir loses nothing") {
    import org.apache.spark.sql.streaming.Trigger
    val src = tempDir()
    val out = tempDir().resolve("out").toString
    Files.createDirectories(java.nio.file.Paths.get(out))
    // residue of an EARLIER streaming query: a committed shard and its
    // epoch-0 log entry (old queries restart epoch numbering at 0)
    val oldShard = java.nio.file.Paths.get(out, "part-qdeadbeef-e0-00000-old.warc.wet")
    Files.write(oldShard, record("conversion", "https://old.example.com", "old".getBytes(UTF_8)))
    val oldLog = java.nio.file.Paths.get(out, "_warc_epochs", "dead-query")
    Files.createDirectories(oldLog)
    Files.write(oldLog.resolve("0"), "part-qdeadbeef-e0-00000-old.warc.wet\n".getBytes(UTF_8))
    // ALSO a legacy un-namespaced entry right under _warc_epochs
    Files.write(java.nio.file.Paths.get(out, "_warc_epochs", "0"),
      "part-qdeadbeef-e0-00000-old.warc.wet\n".getBytes(UTF_8))

    Files.write(src.resolve("shard0.warc.wet"), wetBytes)
    val q = spark.readStream.format("warc").load(src.toString)
      .filter(col("record_type") === "conversion")
      .select(col("record_type"), col("target_uri"), col("content"))
      .writeStream.format("warc").option("path", out)
      .option("checkpointLocation", tempDir().toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = Warc.read(spark, out).select("target_uri").as[String].collect().toSeq.sorted
    // the new query's epoch 0 must NOT misread the stale logs as its own
    // replay (which would silently delete the micro-batch it just wrote),
    // and the old query's data survives
    assert(got == Seq("https://a.example.com/1", "https://b.example.org/2",
      "https://old.example.com"))
  }

  test("corrupt gzip member BOUNDARY: failfast fails, permissive salvages with detection") {
    val dir = tempDir()
    val good = gzMember(record("conversion", "https://kept.example.com", "kept".getBytes(UTF_8)))
    // bytes after member 1 that are not a member header: the JDK
    // GZIPInputStream would report clean EOF here — silent truncation
    Files.write(dir.resolve("boundary.warc.wet.gz"), good ++ "JUNK-NOT-GZIP".getBytes(UTF_8))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("warc").option("mode", "failfast").load(dir.toString).count()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(t => String.valueOf(t.getMessage).contains("corrupt gzip member")))
    val got = Warc.read(spark, dir.toString).select("target_uri").as[String].collect().toSeq
    assert(got == Seq("https://kept.example.com"))
  }

  test("write path: curated docs export as WET shards and read back byte-exact") {
    val dir = tempDir().resolve("out").toString
    val docs = (1L to 200L).map(i =>
      (s"<urn:uuid:r$i>", "conversion", s"https://w.example.com/$i",
        "2026-08-14T00:00:00Z", s"doc body $i — unicode ✓"))
      .toDF("record_id", "record_type", "target_uri", "warc_date", "text")
      .withColumn("content", col("text").cast("binary")).drop("text")
      .repartition(3)
    docs.write.format("warc").mode("append").save(dir)
    val back = Warc.read(spark, dir)
    assert(back.select("warc_file").distinct().count() == 3) // shard per task
    val got = back.select(col("record_id"), col("target_uri"),
      Warc.wetText(col("content")).as("text"), col("content_type"), col("warc_date"))
      .as[(String, String, String, String, String)].collect()
    assert(got.length == 200)
    assert(got.forall { case (rid, uri, text, ct, date) =>
      val i = uri.split("/").last.toLong
      rid == s"<urn:uuid:r$i>" && text == s"doc body $i — unicode ✓" &&
        ct == "text/plain" && date == "2026-08-14T00:00:00Z"
    })
  }

  test("write path: string content, defaulted headers, compression=none") {
    val dir = tempDir().resolve("out").toString
    Seq(("only content", 1L)).toDF("content", "ignore").drop("ignore")
      .write.format("warc").mode("append").option("compression", "none").save(dir)
    val r = Warc.read(spark, dir)
      .select(col("record_type"), col("content_type"), col("record_id"),
        Warc.wetText(col("content")))
      .as[(String, String, String, String)].head()
    assert(r._1 == "conversion" && r._2 == "text/plain" &&
      r._3.startsWith("<urn:uuid:") && r._4 == "only content")
  }

  test("write path: overwrite replaces prior shards, append accumulates") {
    val dir = tempDir().resolve("out").toString
    def one(tag: String) = Seq((tag, s"https://$tag.example.com"))
      .toDF("content", "target_uri").coalesce(1)
    one("first").write.format("warc").mode("append").save(dir)
    one("second").write.format("warc").mode("append").save(dir)
    assert(Warc.read(spark, dir).count() == 2)
    one("third").write.format("warc").mode("overwrite").save(dir)
    val left = Warc.read(spark, dir).select(Warc.wetText(col("content"))).as[String].collect()
    assert(left.toSeq == Seq("third"))
  }

  test("write path: unmapped columns are rejected loudly") {
    val dir = tempDir().resolve("out").toString
    val ex = intercept[Exception] {
      Seq(("c", 5L)).toDF("content", "mystery").write.format("warc").mode("append").save(dir)
    }
    assert(ex.getMessage.contains("mystery"))
  }

  test("multiple load() paths and glob patterns resolve") {
    val dir = tempDir()
    Files.write(dir.resolve("a.warc.wet"), wetBytes)
    Files.write(dir.resolve("b.warc.wet"), wetBytes)
    val two = spark.read.format("warc")
      .load(dir.resolve("a.warc.wet").toString, dir.resolve("b.warc.wet").toString)
    assert(two.count() == 6)
    val globbed = Warc.read(spark, dir.toString + "/*.wet")
    assert(globbed.count() == 6)
  }

  test("multi-path load survives JSON-escaped characters in a path (tab)") {
    // DataFrameReader.load(p1, p2) JSON-encodes the paths; a tab becomes
    // \t in the encoded array and must decode back to a real tab
    val dir = tempDir()
    Files.write(dir.resolve("plain.warc.wet"), wetBytes)
    Files.write(dir.resolve("with\ttab.warc.wet"), wetBytes)
    val two = spark.read.format("warc")
      .load(dir.resolve("plain.warc.wet").toString, dir.resolve("with\ttab.warc.wet").toString)
    assert(two.count() == 6)
  }

  test("write path: a CR/LF in a header column fails the row loudly, not the archive") {
    val dir = tempDir().resolve("out").toString
    val ex = intercept[org.apache.spark.SparkException] {
      Seq(("payload", "https://e.example.com/a\r\nWARC-Type: warcinfo"))
        .toDF("content", "target_uri")
        .write.format("warc").mode("append").save(dir)
    }
    val msg = Option(ex.getCause).map(_.getMessage).getOrElse("") + ex.getMessage
    assert(msg.contains("target_uri") && msg.contains("single-line"))
  }

  test("a record with NO WARC-Type header has NULL record_type: pushed equality never matches") {
    val dir = tempDir()
    // hand-build one typed and one type-less record
    val noType = {
      val payload = "typeless".getBytes(UTF_8)
      ("WARC/1.0\r\nWARC-Record-ID: <urn:uuid:nt>\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8) ++
        payload ++ "\r\n\r\n".getBytes(UTF_8)
    }
    Files.write(dir.resolve("a.warc.wet"),
      record("conversion", "https://a.example.com/1", "typed".getBytes(UTF_8)) ++ noType)
    val df = spark.read.format("warc").load(dir.toString)
    assert(df.count() == 2)
    assert(df.filter(col("record_type").isNull).count() == 1)
    // pushed EqualTo(record_type, '') must match NOTHING (SQL null semantics),
    // even though the filter is reported fully handled by the scan
    assert(df.filter(col("record_type") === "").count() == 0)
    assert(df.filter(col("record_type") === "conversion").count() == 1)
    assert(df.filter(col("record_type").isin("", "conversion")).count() == 1)
  }

  test("raw WARC response records: HTTP envelope splits into status/content-type/body") {
    val dir = tempDir()
    val env = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
      "X-Served-By: cache-x\r\n\r\n"
    val body = "<html><body>héllo ✓</body></html>"
    val notFound = "HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\ngone"
    Files.write(dir.resolve("a.warc"),
      record("response", "https://a.example.com/ok", (env + body).getBytes(UTF_8),
        ctype = "application/http; msgtype=response") ++
      record("response", "https://a.example.com/404", notFound.getBytes(UTF_8),
        ctype = "application/http; msgtype=response") ++
      record("warcinfo", null, "software: synthetic\r\n".getBytes(UTF_8),
        ctype = "application/warc-fields"))
    val df = spark.read.format("warc").load(dir.toString)
    val got = df.select(col("target_uri"), col("http_status"), col("http_content_type"),
      col("content").cast("string"))
      .as[(String, Option[Int], String, String)].collect()
      .map(r => String.valueOf(r._1) -> r).toMap
    assert(got("https://a.example.com/ok") ==
      (("https://a.example.com/ok", Some(200), "text/html; charset=UTF-8", body)))
    assert(got("https://a.example.com/404") ==
      (("https://a.example.com/404", Some(404), "text/plain", "gone")))
    // non-HTTP records keep the whole payload and null envelope columns
    assert(got("null") == ((null, None, null, "software: synthetic\r\n")))
  }

  test("HTTP envelope tolerance: truncated envelope keeps the whole block; request and LF-only parse") {
    val dir = tempDir()
    Files.write(dir.resolve("a.warc"),
      // no blank line within the payload: not a parseable envelope
      record("response", "https://t.example.com/trunc",
        "HTTP/1.1 200 OK\r\nContent-Type: text/h".getBytes(UTF_8),
        ctype = "application/http; msgtype=response") ++
      // request records have no status code but a real envelope
      record("request", "https://t.example.com/req",
        "GET /x HTTP/1.1\r\nHost: t.example.com\r\n\r\n".getBytes(UTF_8),
        ctype = "application/http; msgtype=request") ++
      // bare-LF line endings still split
      record("response", "https://t.example.com/lf",
        "HTTP/1.0 301 Moved\nLocation: /y\n\nmoved".getBytes(UTF_8),
        ctype = "application/http"))
    val df = spark.read.format("warc").load(dir.toString)
    val got = df.select(col("target_uri"), col("http_status"), col("http_content_type"),
      col("content").cast("string"))
      .as[(String, Option[Int], String, String)].collect().map(r => r._1 -> r).toMap
    assert(got("https://t.example.com/trunc") == (("https://t.example.com/trunc",
      None, null, "HTTP/1.1 200 OK\r\nContent-Type: text/h")))
    assert(got("https://t.example.com/req") ==
      (("https://t.example.com/req", None, null, "")))
    assert(got("https://t.example.com/lf") ==
      (("https://t.example.com/lf", Some(301), null, "moved")))
  }

  test("envelope-only pruning: status without content skips body bytes, plan-pinned") {
    val dir = tempDir()
    val bigBody = "x" * 200000 // larger than the 64 KiB envelope head cap
    Files.write(dir.resolve("a.warc"),
      record("response", "https://p.example.com/1",
        ("HTTP/1.1 200 OK\r\nContent-Type: a/b\r\n\r\n" + bigBody).getBytes(UTF_8),
        ctype = "application/http; msgtype=response") ++
      record("response", "https://p.example.com/2",
        ("HTTP/1.1 500 Oops\r\n\r\nerr").getBytes(UTF_8),
        ctype = "application/http; msgtype=response"))
    val pruned = spark.read.format("warc").load(dir.toString)
      .select("target_uri", "http_status")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("warc[target_uri,http_status]"), "http_status must prune away content")
    val got = pruned.as[(String, Option[Int])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      "https://p.example.com/1" -> Some(200), "https://p.example.com/2" -> Some(500)))
    // record framing survives the head-capped skip: a following record parses
    assert(spark.read.format("warc").load(dir.toString).count() == 2)
  }

  test("envelope columns are projection-invariant even past the 64 KiB head") {
    // headers run past the envelope-head cap before the blank line: the
    // envelope-only path must parse the WHOLE payload so the columns
    // agree with the content-bearing projection — column pruning must
    // never change a retained column's value
    val dir = tempDir()
    val hugeHeader = "X-Pad: " + ("p" * 80000) + "\r\n" // > 64 KiB before \r\n\r\n
    Files.write(dir.resolve("a.warc"),
      record("response", "https://h.example.com/late",
        ("HTTP/1.1 200 OK\r\n" + hugeHeader + "Content-Type: a/b\r\n\r\nbody")
          .getBytes(UTF_8),
        ctype = "application/http; msgtype=response") ++
      record("response", "https://h.example.com/next",
        "HTTP/1.1 404 No\r\n\r\ngone".getBytes(UTF_8),
        ctype = "application/http; msgtype=response"))
    val withContent = spark.read.format("warc").load(dir.toString)
      .select(col("target_uri"), col("http_status"), col("http_content_type"),
        col("content").cast("string"))
      .as[(String, Option[Int], String, String)].collect().map(r => r._1 -> r).toMap
    val envelopeOnly = spark.read.format("warc").load(dir.toString)
      .select(col("target_uri"), col("http_status"), col("http_content_type"))
      .as[(String, Option[Int], String)].collect().map(r => r._1 -> r).toMap
    for (uri <- Seq("https://h.example.com/late", "https://h.example.com/next")) {
      val (_, sFull, cFull, _) = withContent(uri)
      val (_, sEnv, cEnv) = envelopeOnly(uri)
      assert(sFull == sEnv && cFull == cEnv,
        s"$uri: envelope columns differ by projection: ($sFull,$cFull) vs ($sEnv,$cEnv)")
    }
    assert(withContent("https://h.example.com/late")._2 == Some(200))
    assert(withContent("https://h.example.com/late")._4 == "body")
  }

  test("pathological envelopes stay bounded: late terminator + huge body, and none at all") {
    // the EnvelopeOnly fallback must never materialize a body: the
    // terminator scan continues in bounded chunks past the 64 KiB head,
    // retaining at most the (capped) envelope head — a crafted
    // Content-Length with a late or absent blank line costs O(chunk)
    // memory, and framing survives so following records still parse
    val dir = tempDir()
    val lateEnv = "HTTP/1.1 200 OK\r\nContent-Type: late/head\r\nX-Pad: " +
      ("p" * 80000) + "\r\n\r\n"
    val hugeBody = new Array[Byte](5 * 1024 * 1024) // body >> head: must be skipped, not read
    java.util.Arrays.fill(hugeBody, 'b'.toByte)
    // terminator beyond the 4 MiB retention cap: status + an EARLY
    // content-type are still recovered from the capped prefix
    val beyondCap = "HTTP/1.1 418 Teapot\r\nContent-Type: beyond/cap\r\nX-Pad: " +
      ("q" * (5 * 1024 * 1024)) + "\r\n\r\ntiny"
    val noTerm = "HTTP/1.1 200 OK\r\nContent-Type: never/ends\r\n" + ("z" * 1024 * 1024)
    // content-type PAST the cap but before the terminator: both
    // projections must apply the same deterministic cap rule and agree
    // on null — not "null under pruning, past/cap under full read"
    val ctypePastCap = "HTTP/1.1 302 Moved\r\nX-Pad: " + ("q" * (5 * 1024 * 1024)) +
      "\r\nContent-Type: past/cap\r\n\r\nbody"
    Files.write(dir.resolve("a.warc"),
      record("response", "https://x.example.com/late", (lateEnv).getBytes(UTF_8) ++ hugeBody,
        ctype = "application/http; msgtype=response") ++
      record("response", "https://x.example.com/cap", beyondCap.getBytes(UTF_8),
        ctype = "application/http; msgtype=response") ++
      record("response", "https://x.example.com/pastcap", ctypePastCap.getBytes(UTF_8),
        ctype = "application/http; msgtype=response") ++
      record("response", "https://x.example.com/noterm", noTerm.getBytes(UTF_8),
        ctype = "application/http; msgtype=response") ++
      record("response", "https://x.example.com/after",
        "HTTP/1.1 204 OK\r\n\r\n".getBytes(UTF_8),
        ctype = "application/http; msgtype=response"))
    val envelopeOnly = spark.read.format("warc").load(dir.toString)
      .select(col("target_uri"), col("http_status"), col("http_content_type"))
      .as[(String, Option[Int], String)].collect().map(r => r._1 -> r).toMap
    assert(envelopeOnly.size == 5, "framing must survive every pathological record")
    assert(envelopeOnly("https://x.example.com/late") ==
      (("https://x.example.com/late", Some(200), "late/head")))
    assert(envelopeOnly("https://x.example.com/cap") ==
      (("https://x.example.com/cap", Some(418), "beyond/cap")))
    assert(envelopeOnly("https://x.example.com/pastcap") ==
      (("https://x.example.com/pastcap", Some(302), null)))
    assert(envelopeOnly("https://x.example.com/noterm") ==
      (("https://x.example.com/noterm", None, null)))
    assert(envelopeOnly("https://x.example.com/after") ==
      (("https://x.example.com/after", Some(204), null)))
    // and the full projection agrees on every envelope column
    val full = spark.read.format("warc").load(dir.toString)
      .select(col("target_uri"), col("http_status"), col("http_content_type"),
        length(col("content")).as("len"))
      .as[(String, Option[Int], String, Long)].collect().map(r => r._1 -> r).toMap
    for ((uri, (_, s, c)) <- envelopeOnly)
      assert((full(uri)._2, full(uri)._3) == ((s, c)),
        s"$uri: envelope columns differ by projection")
    assert(full("https://x.example.com/late")._4 == hugeBody.length)
  }

  test("streaming read of raw WARC: http envelope columns match the batch path") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tempDir()
    val ckpt = tempDir()
    val out = tempDir().resolve("out").toString
    val env = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    Files.write(dir.resolve("a.warc.gz"), gzMember(
      record("response", "https://s.example.com/1", (env + "hello").getBytes(UTF_8),
        ctype = "application/http; msgtype=response") ++
      record("response", "https://s.example.com/2",
        "HTTP/1.1 404 No\r\n\r\ngone".getBytes(UTF_8),
        ctype = "application/http; msgtype=response") ++
      record("warcinfo", null, "software: synthetic\r\n".getBytes(UTF_8),
        ctype = "application/warc-fields")))
    val q = spark.readStream.format("warc").load(dir.toString)
      .select(col("target_uri"), col("http_status"), col("http_content_type"),
        col("content").cast("string").as("body"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
      .as[(String, Option[Int], String, String)].collect()
      .sortBy(r => String.valueOf(r._1)).toSeq
    val batch = spark.read.format("warc").load(dir.toString)
      .select(col("target_uri"), col("http_status"), col("http_content_type"),
        col("content").cast("string").as("body"))
      .as[(String, Option[Int], String, String)].collect()
      .sortBy(r => String.valueOf(r._1)).toSeq
    assert(streamed == batch,
      s"micro-batch envelope parse must equal batch:\n$streamed\nvs\n$batch")
    assert(streamed == Seq(
      ("https://s.example.com/1", Some(200), "text/html", "hello"),
      ("https://s.example.com/2", Some(404), null, "gone"),
      (null, None, null, "software: synthetic\r\n")))
  }

  test("streaming discovery: in-progress suffixes are skipped; fileStabilityPolls defers changing files") {
    val dir = tempDir()
    val ckpt = tempDir()
    Files.write(dir.resolve("grow.warc.wet.tmp"), wetBytes.take(10))
    val stream = new WarcMicroBatchStream(Seq(dir.toString), Warc.Schema, null,
      ckpt.toString, permissive = true, stabilityPolls = 2)
    def ready: Set[String] = {
      val end = stream.latestOffset().asInstanceOf[WarcStreamOffset]
      stream.planInputPartitions(WarcStreamOffset(-1L), end)
        .map(_.asInstanceOf[WarcInputPartition].path).toSet
    }
    assert(ready.isEmpty, ".tmp suffix must never be discovered")
    // rename into place mid-upload: poll 1 sees (len1, mtime1) — not stable yet
    Files.move(dir.resolve("grow.warc.wet.tmp"), dir.resolve("grow.warc.wet"))
    assert(ready.isEmpty, "first sighting must not commit under stabilityPolls=2")
    // the upload continues: the signature changed, so the count restarts
    Files.write(dir.resolve("grow.warc.wet"), wetBytes)
    Files.setLastModifiedTime(dir.resolve("grow.warc.wet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 2000))
    assert(ready.isEmpty, "a file whose (len, mtime) changed must restart its count")
    // two consecutive identical sightings: committed, and read COMPLETE
    val batch = ready
    assert(batch.exists(_.endsWith("grow.warc.wet")))
    val rf = stream.createReaderFactory()
    val reader = rf.createReader(WarcInputPartition(batch.head))
    var n = 0
    while (reader.next()) n += 1
    reader.close()
    assert(n == 3, "the committed file must be the full 3-record shard, not the truncated prefix")
  }
}
