package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream shape
  * (TESTDATA `events`: event_id, ts, user_id, event_type, value).
  *
  * The reference engine is pure batch (SURVEY §2.8); these are the
  * engine's streaming-native counterparts of its aggregation patterns,
  * built the way the prompt prescribes: `readStream` → event-time
  * transforms with watermarks → `writeStream`, custom state via
  * `flatMapGroupsWithState`.
  *
  * Scale shape: state is partitioned by user_id (the group key) in the
  * state store; watermark-driven timeout bounds state size — an idle key
  * is emitted and dropped as soon as the watermark passes its gap, so
  * state is O(active users), not O(all users ever seen).
  */
object EventStreams {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, total_value: Double)

  /** Open-session accumulator (public: the state encoder's generated code
    * must be able to reach the constructor and accessors). */
  final case class SessionState(
      startMs: Long, endMs: Long, n: Long, total: Double)

  /** Stateful sessionization (the streaming twin of batch q28): events of
    * a user belong to one session while gaps stay ≤ `gapSeconds`; a closed
    * session is emitted once the event-time watermark passes its end + gap
    * (EventTimeTimeout — no wall-clock dependence, fully replayable).
    *
    * Emits in Append mode: each session exactly once, on close.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long, watermarkDelay: String = "0 seconds")
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    def closeSession(userId: Long, s: SessionState): Session =
      Session(userId, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n, s.total)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: the open session is final
            val out = state.getOption.map(closeSession(userId, _))
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.endMs <= gapMs =>
                  cur = Some(SessionState(s.startMs, math.max(s.endMs, t), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += closeSession(userId, s)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.endMs + gapMs)
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact-dedup on event ids — the exactly-once ingestion
    * primitive for at-least-once sources. `dropDuplicatesWithinWatermark`
    * keeps dedup state only `watermarkDelay` long (bounded state), unlike
    * plain `dropDuplicates` whose state grows forever on a stream. */
  def dedupEvents(events: DataFrame, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked tumbling-window counts per event type — the canonical
    * `readStream → window agg → append` shape. Late data beyond
    * `watermarkDelay` is dropped; a window is emitted once final. */
  def windowedTypeCounts(
      events: DataFrame, windowLength: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))
}
