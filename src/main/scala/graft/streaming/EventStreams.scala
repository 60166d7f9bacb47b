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

  /** Pending-session accumulator (public: the state encoder's generated
    * code must be able to reach the constructor and accessors). */
  final case class SessionState(
      startMs: Long, endMs: Long, n: Long, total: Double)

  /** All of one user's not-yet-final sessions. */
  final case class PendingSessions(sessions: List[SessionState])

  /** Stateful sessionization (the streaming twin of batch q28): events of
    * a user belong to one session while gaps stay ≤ `gapSeconds`; a
    * session is emitted ONLY once the event-time watermark strictly
    * passes its end + gap (EventTimeTimeout — no wall-clock dependence,
    * fully replayable). Until then it stays in state, so a late-but-valid
    * event (above the watermark) still lands in the right session — it
    * can extend a pending session on EITHER side (`start − gap ≤ t ≤
    * end + gap`, with the start moving back), or BRIDGE two pending
    * sessions into one. Emitting a session the moment a later in-batch
    * event splits past the gap — the obvious shortcut — is only sound at
    * `watermarkDelay = 0`; with a real delay the next batch may carry an
    * earlier valid event that belonged to the emitted session, and
    * append mode can never amend it.
    *
    * State is O(sessions within the watermark horizon) per user — the
    * same bound the shortcut had plus at most the few sessions a delay
    * keeps amendable. Emits in Append mode: each session exactly once,
    * in start order, when final.
    *
    * Delivery contract: events are assumed delivered ONCE. This operator
    * keeps no per-event-id state (its state is the session accumulator),
    * so a redelivered event_id still above the watermark merges twice
    * and inflates n_events/total_value. Under an at-least-once source,
    * compose [[dedupEvents]] (same watermark) upstream — it holds the
    * per-id state this operator deliberately does not, and the pair is
    * then end-to-end idempotent. The same applies to
    * [[windowedTypeCounts]].
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
      .flatMapGroupsWithState[PendingSessions, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[PendingSessions]) =>
          val wm = state.getCurrentWatermarkMs()
          var pending = state.getOption.map(_.sessions).getOrElse(Nil)
          // below-watermark events are late by contract (Spark's stateful
          // operators filter them; the guard makes the invariant local):
          // every accepted event has t ≥ wm, so an emitted session
          // (end + gap < wm) can never be touched again
          batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val t = e.ts.getTime
            if (t >= wm) {
              val (joinable, rest) =
                pending.partition(s => t >= s.startMs - gapMs && t <= s.endMs + gapMs)
              val merged = joinable.foldLeft(SessionState(t, t, 1L, e.value)) { (a, s) =>
                SessionState(math.min(a.startMs, s.startMs), math.max(a.endMs, s.endMs),
                  a.n + s.n, a.total + s.total)
              }
              pending = merged :: rest
            }
          }
          val (fin, open) = pending.partition(s => s.endMs + gapMs < wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(PendingSessions(open))
            // must exceed the current watermark or Spark rejects it; a
            // session with end + gap == wm is still amendable (an event
            // at exactly end + gap merges), so wake at wm + 1 for it
            state.setTimeoutTimestamp(math.max(open.map(_.endMs + gapMs).min, wm + 1))
          }
          fin.sortBy(_.startMs).map(closeSession(userId, _)).iterator
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
