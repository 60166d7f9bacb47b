package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Contamination

class StreamingContaminationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Int): Timestamp = new Timestamp((minutes + 60) * 60000L)

  private val bench = Seq(
    (1L, "a b c d e"),   // 3 shingles
    (2L, "p q r s"))     // 2 shingles
    .toDF("doc_id", "text")

  test("stream-static contamination matches the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val index = StreamingContamination.benchmarkIndex(bench, "doc_id", "text", n = 3)
    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    // a real watermark delay: the redelivery-dedup state must outlive
    // the replay below (with 0s the first occurrence's entry may expire
    // before the replay arrives)
    val flagged = StreamingContamination.overlapPairs(
      stream, "doc_id", "text", "ts", index, n = 3, minShared = 2,
      watermarkDelay = "30 minutes", windowLength = "10 minutes")
    val q = flagged.writeStream
      .format("memory").queryName("sc_out").outputMode(OutputMode.Append()).start()
    try {
      val trainDocs = Seq(
        (10L, "a b c d x", ts(0)),  // shares 2 with bench 1 -> flagged
        (11L, "a b c x y", ts(1)),  // shares 1 -> below minShared
        (12L, "p q r s", ts(2)))    // shares 2 with bench 2 -> flagged
      input.addData(trainDocs: _*)
      q.processAllAvailable()
      // an at-least-once source replays docs 10 and 11 in the next
      // batch: the in-watermark dedup must keep n_shared at its true
      // value (a double delivery would double every shared-shingle
      // count — doc 11 would cross minShared at 2 and doc 10 would read
      // 1333 permille)
      input.addData((10L, "a b c d x", ts(0)), (11L, "a b c x y", ts(1)))
      q.processAllAvailable()
      // advance the watermark past window end + delay so append emits
      input.addData((99L, "zz zz", ts(120)))
      q.processAllAvailable()
      input.addData((98L, "zz zz", ts(121)))
      q.processAllAvailable()
      val streamed = spark.table("sc_out")
        .select("bench_id", "train_id", "n_shared", "contaminated_permille")
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = Contamination.ngramOverlapPairs(
        bench, col("doc_id"), col("text"),
        trainDocs.map(d => (d._1, d._2)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), n = 3, minShared = 2)
        .select("bench_id", "train_id", "n_shared", "contaminated_permille")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(streamed == Set((1L, 10L, 2L, 666L), (2L, 12L, 2L, 1000L)))
    } finally q.stop()
  }

  test("benchmark index caps boilerplate shingles at build time") {
    val boiler = Seq(
      (1L, "the same header x"), (2L, "the same header y"), (3L, "the same header z"))
      .toDF("doc_id", "text")
    val capped = StreamingContamination.benchmarkIndex(
      boiler, "doc_id", "text", n = 3, maxBenchShingleFreq = 2)
    // "the same header" is in all 3 docs -> dropped; per-doc tail shingles
    // ("same header x" etc.) are unique -> kept
    val hs = capped.select("bench_id").as[Long].collect()
    assert(hs.length == 3 && capped.filter(col("bench_id") === 1L).count() == 1)
  }
}
