package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractMeta: partition-batched stub decode over binary payloads") {
    val docs = Seq((1L, "hello"), (2L, ""), (3L, "a longer payload here")).toDF("doc_id", "text")
    val media = Multimodal.fromText(spark, docs, "doc_id", "text", "utf8")
    val got = Multimodal.extractMeta(media, Multimodal.StubDecoder)
      .collect().map(m => (m.id, m.byte_len, m.width, m.height, m.format)).toSet
    assert(got == Set(
      (1L, 5L, 6, 6, "utf8"),
      (2L, 0L, 1, 1, "utf8"),
      (3L, 21L, 22, 22, "utf8")))
  }

  test("decoder is pluggable without changing the plan shape") {
    val docs = Seq((1L, "xyz")).toDF("doc_id", "text")
    val media = Multimodal.fromText(spark, docs, "doc_id", "text", "png")
    val custom = new Multimodal.MediaDecoder {
      def dimensions(content: Array[Byte]): (Int, Int) = (640, 480)
    }
    val m = Multimodal.extractMeta(media, custom).head()
    assert((m.width, m.height, m.format) == ((640, 480, "png")))
  }

  test("sampleFrames: k evenly-spread byte offsets per payload") {
    val df = Seq((7L, "0123456789ab")).toDF("doc_id", "text") // 12 bytes
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    val got = Multimodal.sampleFrames(df, "doc_id", "content", k = 4)
      .as[(Long, Int, Long)].collect().toSet
    assert(got == Set((7L, 0, 0L), (7L, 1, 3L), (7L, 2, 6L), (7L, 3, 9L)))
  }
}
