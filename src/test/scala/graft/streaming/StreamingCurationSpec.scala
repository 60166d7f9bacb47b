package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.{Pii, Sampling, TextAnalysis}

/** The map-side curation tier on an INGEST STREAM, unchanged: PII scrub,
  * language-ID, per-row quality signals and the deterministic hash split
  * are pure Column expressions — they compose into `readStream` with NO
  * state, no watermark, no aggregation, and emit row-for-row in append
  * mode. This is the design point the spec pins: the streaming twin of
  * stage 0/1/5 of the README curation DAG is the SAME code, and its
  * output per doc is bit-identical to the batch run (a doc's redaction,
  * language tag and train/val assignment cannot depend on which path —
  * backfill batch or live stream — it arrived through).
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private def curate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val scrubbed = Pii.scrubDocs(df, col("doc_id"), col("text"))
      .withColumn("lang", TextAnalysis.langId(col("scrubbed")))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("scrubbed")).cast("long"))
    Sampling.hashSplit(scrubbed, col("doc_id"), Seq("train" -> 900, "val" -> 100))
      .select("doc_id", "n_emails", "has_pii", "scrubbed", "lang", "n_tokens", "split")
  }

  test("streaming map-side curation ≡ batch, row for row, stateless append") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "the cat and the hat mail me a@b.io"),
      (2L, "der hund und die katze +4915123456789"),
      (3L, "clean text that is in english you see"),
      (4L, "el perro y el gato en la casa 10.0.0.1"))
    val input = MemoryStream[(Long, String)]
    val q = curate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cur_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("cur_out")
        .as[(Long, Long, Boolean, String, String, Long, String)].collect().toSet
      val batch = curate(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Boolean, String, String, Long, String)].collect().toSet
      assert(streamed == batch)
      assert(streamed.size == docs.size) // stateless: one output row per input row
      // the tier actually did its jobs on this input
      assert(streamed.count(_._3) == 3)                  // 3 docs carried PII
      assert(streamed.map(_._5) == Set("en", "de", "es")) // langs tagged
      assert(streamed.forall(r => r._7 == "train" || r._7 == "val"))
    } finally q.stop()
  }

  test("streaming bloom allowlist gate + stream-static confirm ≡ batch bloomSemiJoin") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.BloomJoin
    val allow = Seq(2L, 4L, 6L, 8L).toDF("k")
    // the persisted-sketch path: build once, round-trip through parquet,
    // gate the stream with the loaded bytes
    val dir = java.nio.file.Files.createTempDirectory("bloomgate").toString
    BloomJoin.saveFilter(spark,
      BloomJoin.buildFilter(allow, col("k"), BloomJoin.AutoSize, 0.01), s"$dir/bf")
    val bytes = BloomJoin.loadFilter(spark, s"$dir/bf")
    val docs = (1L to 20L).map(i => (i, s"doc $i"))
    val input = MemoryStream[(Long, String)]
    val gated = input.toDF().toDF("doc_id", "text")
      .filter(BloomJoin.bloomGate(bytes, col("doc_id")))
      .join(allow.select(col("k")), col("doc_id") === col("k"), "left_semi")
    val q = gated.writeStream.format("memory").queryName("bloom_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("bloom_out").as[(Long, String)].collect().toSet
      val batch = BloomJoin.bloomSemiJoin(docs.toDF("doc_id", "text"), col("doc_id"),
        allow, col("k")).as[(Long, String)].collect().toSet
      assert(streamed == batch)
      assert(streamed.map(_._1) == Set(2L, 4L, 6L, 8L))
    } finally q.stop()
  }
}
