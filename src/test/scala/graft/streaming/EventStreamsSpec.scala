package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import EventStreams.{Event, Session}

/** MemoryStream-driven checks: watermark-timeout session close semantics
  * and append-mode window finalization. processAllAvailable after each
  * addData gives one deterministic microbatch per step (the watermark
  * advances between batches, never within one).
  */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  // offset from epoch: the initial watermark is epoch 0 and the late-row
  // filter drops ts <= watermark, so a t=0 event would silently vanish
  private def ts(minutes: Int): Timestamp = new Timestamp((minutes + 60) * 60000L)

  test("stateful sessionization: sessions close via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapSeconds = 30 * 60)
    val q = sessions.writeStream
      .format("memory").queryName("sess_out").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 bursts at t=0,1,2 min → one open session
      input.addData(
        Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(1), 1, "click", 2.0),
        Event(3, ts(2), 1, "view", 3.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").isEmpty) // still open — nothing emitted

      // batch 2: user 1 again at t=90min — past the 30-min gap, so a new
      // session opens. The first session is emitted only once the
      // WATERMARK (now 90min) strictly passes its end + gap — the
      // follow-up timeout micro-batch inside processAllAvailable fires
      // it; emission is never the in-batch split itself (that shortcut
      // is unsound at a real watermarkDelay — see the late-data test)
      input.addData(Event(4, ts(90), 1, "view", 4.0))
      q.processAllAvailable()
      val afterSplit = spark.table("sess_out").as[Session].collect().toSet
      assert(afterSplit == Set(Session(1, ts(0), ts(2), 3, 6.0)))

      // batch 3: another user far in the future advances the watermark
      // past 90min + gap → user 1's second session times out and closes
      input.addData(Event(5, ts(200), 2, "view", 5.0))
      q.processAllAvailable()
      input.addData(Event(6, ts(201), 2, "view", 6.0))
      q.processAllAvailable()
      val all = spark.table("sess_out").as[Session].collect().toSet
      assert(all.contains(Session(1, ts(90), ts(90), 1, 4.0)))
    } finally q.stop()
  }

  test("sessionization with a real watermark delay: late events amend the RIGHT session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // 1-minute gap, 10-minute watermark delay: events up to 10 minutes
    // late are valid and must land in their session
    val sessions = EventStreams.sessionize(input.toDS(), gapSeconds = 60,
      watermarkDelay = "10 minutes")
    val q = sessions.writeStream
      .format("memory").queryName("sess_late").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, new Timestamp(ts(0).getTime), 1, "view", 1.0),
        Event(2, new Timestamp(ts(0).getTime + 30000L), 1, "view", 2.0))
      q.processAllAvailable()
      // a later event opens a SECOND session (5 min > 1 min gap)
      input.addData(Event(3, new Timestamp(ts(5).getTime), 1, "view", 4.0))
      q.processAllAvailable()
      // a LATE event (above the watermark) belonging to the FIRST
      // session: within gap of its end, 4 min before the second session.
      // Emit-on-split would already have published session 1 without it
      // (and the old merge rule would have glued it to session 2 while
      // leaving session 2's start untouched — both wrong)
      input.addData(Event(4, new Timestamp(ts(1).getTime), 1, "view", 8.0))
      q.processAllAvailable()
      // advance the watermark far past everything, twice (the timeout
      // fires against the watermark of the PREVIOUS batch)
      input.addData(Event(5, new Timestamp(ts(200).getTime), 2, "view", 0.5))
      q.processAllAvailable()
      input.addData(Event(6, new Timestamp(ts(201).getTime), 2, "view", 0.5))
      q.processAllAvailable()
      val got = spark.table("sess_late").as[Session].collect().toSet
      assert(got.contains(Session(1, ts(0), ts(1), 3, 11.0)),
        s"late event must extend session 1, got $got")
      assert(got.contains(Session(1, ts(5), ts(5), 1, 4.0)))
    } finally q.stop()
  }

  test("streaming dedup drops replayed event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val deduped = EventStreams.dedupEvents(input.toDF(), "1 hour")
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "view", 1.0),
        Event(1, ts(0), 1, "view", 1.0), // same-batch replay
        Event(2, ts(1), 1, "click", 2.0))
      q.processAllAvailable()
      input.addData(Event(1, ts(2), 1, "view", 1.0)) // cross-batch replay
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }

  test("watermarked tumbling windows emit finalized counts in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val windows = EventStreams.windowedTypeCounts(input.toDF(), "5 minutes", "0 seconds")
    val q = windows.writeStream
      .format("memory").queryName("win_out").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(1), 1, "view", 1.0),
        Event(2, ts(2), 1, "view", 2.0),
        Event(3, ts(4), 2, "click", 3.0))
      q.processAllAvailable()
      assert(spark.table("win_out").isEmpty) // window [0,5) not final yet

      input.addData(Event(4, ts(7), 1, "view", 9.0)) // watermark → 7min: [0,5) final
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("window_start", "event_type", "n_events", "total_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows == Set(
        (ts(0), "view", 2L, 3.0),
        (ts(0), "click", 1L, 3.0)))
    } finally q.stop()
  }
}
