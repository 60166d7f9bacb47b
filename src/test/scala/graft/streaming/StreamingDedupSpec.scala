package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Dedup
import StreamingDedup.{Doc, NearDupPair}

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  // t=0 would be dropped by the initial epoch-0 watermark
  private def ts(minutes: Int): Timestamp = new Timestamp((minutes + 60) * 60000L)

  private val textA = "the quick brown fox jumps over the lazy dog again and again"
  private val textB = "the quick brown fox jumps over the lazy dog again and again today" // near-dup of A
  private val textC = "completely different content about spark streaming state stores"

  test("streaming near-dup pairs: emitted once, across and within batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val pairs = StreamingDedup.nearDupPairs(input.toDS(), maxHamming = 2)
    val q = pairs.writeStream
      .format("memory").queryName("sdd_out").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: A and its exact copy in ONE batch -> one pair, once
      // (identical sigs share all 3 chunks; first-shared-chunk dedups)
      input.addData(Doc(1, textA, ts(0)), Doc(2, textA, ts(1)), Doc(3, textC, ts(1)))
      q.processAllAvailable()
      val b1 = spark.table("sdd_out").as[NearDupPair].collect().toSet
      assert(b1 == Set(NearDupPair(1, 2, 0)))

      // batch 2: a doc arriving later pairs with every stored near-dup
      input.addData(Doc(4, textA, ts(2)))
      q.processAllAvailable()
      val b2 = spark.table("sdd_out").as[NearDupPair].collect().toSet
      assert(b2 == Set(NearDupPair(1, 2, 0), NearDupPair(1, 4, 0), NearDupPair(2, 4, 0)))

      // batch 3: an at-least-once source REPLAYS doc 1 — idempotent:
      // no re-emitted pairs, no double slot (a second slot would make a
      // future near-dup of doc 1 emit its pair twice)
      input.addData(Doc(1, textA, ts(3)))
      q.processAllAvailable()
      assert(spark.table("sdd_out").as[NearDupPair].collect().toSet == b2)
      input.addData(Doc(5, textA, ts(4)))
      q.processAllAvailable()
      val b4 = spark.table("sdd_out").as[NearDupPair].collect().toSeq
      assert(b4.count(p => p == NearDupPair(1, 5, 0)) == 1,
        s"replayed doc 1 must not double later emissions, got $b4")
    } finally q.stop()
  }

  test("streaming exactDeduplicate ≡ batch on a replayed id-monotonic stream; redelivery exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    // duplicate groups: {1,2,4} share textA, {3,6} share textC, 5 unique
    val docs = Seq(
      Doc(1, textA, ts(0)), Doc(2, textA, ts(1)), Doc(3, textC, ts(1)),
      Doc(4, textA, ts(2)), Doc(5, textB, ts(2)), Doc(6, textC, ts(3)))
    def run(batches: Seq[Seq[Doc]], name: String): Set[Long] = {
      val input = MemoryStream[Doc]
      val out = StreamingDedup.exactDeduplicate(input.toDF(), col("text"), "10 minutes")
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        spark.table(name).select("doc_id").as[Long].collect().toSet
      } finally q.stop()
    }
    val batch = Dedup.exactDeduplicate(
        docs.toDF(), col("text"), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(batch == Set(1L, 3L, 5L))
    // id-monotonic ingest (the crawl-increment order the scaladoc pins):
    // first arrival per hash == min id per hash == the batch keep set —
    // across two different micro-batchings of the SAME stream
    assert(run(Seq(docs), "sed_one") == batch)
    assert(run(docs.grouped(2).toSeq, "sed_many") == batch)
    // at-least-once redelivery: a replayed doc (including the KEPT one)
    // hashes onto its own state entry and is dropped — output stays
    // exactly-once per content hash
    val replayed = run(Seq(docs, Seq(docs.head), Seq(docs(3))), "sed_replay")
    assert(replayed == batch)
  }

  test("a null-text doc is silently skipped like the batch twin, not a poison pill") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val pairs = StreamingDedup.nearDupPairs(input.toDS(), maxHamming = 2)
    val q = pairs.writeStream
      .format("memory").queryName("sdd_null").outputMode(OutputMode.Append()).start()
    try {
      // without the null-sig filter the non-nullable Keyed encoder threw
      // here and the restarted query replayed the same offset forever
      input.addData(Doc(1, textA, ts(0)), Doc(2, null, ts(0)), Doc(3, textA, ts(1)))
      q.processAllAvailable()
      val got = spark.table("sdd_null").as[NearDupPair].collect().toSet
      assert(got == Set(NearDupPair(1, 3, 0)), s"null-text doc must drop out silently: $got")
    } finally q.stop()
  }

  test("streaming pairs match the batch operator on the same corpus") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      Doc(10, textA, ts(0)), Doc(11, textB, ts(1)),
      Doc(12, textC, ts(2)), Doc(13, textB, ts(3)))
    val input = MemoryStream[Doc]
    val pairs = StreamingDedup.nearDupPairs(input.toDS(), maxHamming = 2)
    val q = pairs.writeStream
      .format("memory").queryName("sdd_cmp").outputMode(OutputMode.Append()).start()
    try {
      docs.foreach { d => input.addData(d); q.processAllAvailable() }
      val streamed = spark.table("sdd_cmp").as[NearDupPair].collect().toSet
      val batch = Dedup.simhashNearDupPairs(
        docs.toDF(), col("doc_id"), col("text"), maxHamming = 2)
        .select(col("a_id"), col("b_id"), col("hamming").cast("int"))
        .as[NearDupPair].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
