package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental near-duplicate detection on a document STREAM — the
  * streaming twin of [[graft.operators.Dedup.simhashNearDupPairs]]: as
  * documents arrive, emit every (earlier doc, new doc) pair whose 30-bit
  * SimHash signatures are within `maxHamming`.
  *
  * Shape: the signature is a per-row expression (no state), then each doc
  * is fanned out to its 3 × 10-bit band buckets, and ONE
  * `flatMapGroupsWithState` keyed by (chunk, bucket value) holds the docs
  * seen per bucket. A pair shares up to 3 buckets; it is emitted only in
  * its FIRST shared chunk (both signatures are on hand when comparing), so
  * output is exactly-once without a second stateful stage — the same
  * dedup-without-distinct trick as the batch operator.
  *
  * Recall contract (same banding as the batch twin): full for
  * `maxHamming ≤ 2` — the 3 × 10-bit pigeonhole guarantees a shared
  * chunk — and BEST-EFFORT above (a pair differing in every chunk never
  * meets; the batch operator documents the identical caveat).
  *
  * State is bounded two ways, as a 100 TB/day ingest requires:
  *  - event-time retention: a bucket not touched for `retention` past the
  *    watermark is dropped (EventTimeTimeout — replayable, no wall clock);
  *  - `maxBucket` caps entries per bucket (hot buckets degrade to
  *    most-recent-K matching rather than unbounded growth).
  * Both bounds trade recall, never precision and never duplicate
  * emissions — including one subtle compound case: the first-shared-chunk
  * gate is computed from the SIGNATURES, so a pair whose first shared
  * chunk's bucket evicted the earlier doc is suppressed even if a later
  * shared chunk still holds both (the bucket groups are independent
  * state partitions and cannot see each other's eviction state; lifting
  * this would require a second pair-keyed dedup stage — a shuffle the
  * exactly-once-without-distinct design exists to avoid). Redelivered
  * doc_ids (at-least-once sources) are idempotent WHILE the doc is still
  * resident in its bucket: a doc already present neither re-emits its
  * pairs nor occupies a second slot. The idempotence guard is
  * bucket-presence-based, so the one replay it cannot absorb is a doc
  * that the `maxBucket` cap has already EVICTED: its redelivery
  * re-enters the bucket and may re-emit pairs against entries it paired
  * with before eviction. Absorbing that too would mean remembering
  * evicted ids until watermark expiry (state the cap exists to bound) or
  * a pair-keyed dedup shuffle; under a source that replays past a hot
  * bucket's eviction horizon, dedup pairs downstream (they are
  * value-identical rows — a `dropDuplicates` over the bounded pair
  * stream, not the corpus).
  */
object StreamingDedup {

  final case class Doc(doc_id: Long, text: String, ts: Timestamp)

  /** Streaming twin of [[graft.operators.Dedup.exactDeduplicate]]: keep
    * exactly one document per content hash (the same engine-neutral
    * `md5(text)` key as every batch exact-dedup spelling) on an ingest
    * stream, with bounded state.
    *
    * Relation to the batch operator's gated apply shapes (semi /
    * drop-list anti): a stream needs NEITHER. Both batch spellings exist
    * to ship a globally-computed keep decision back onto a corpus-sized
    * table without shuffling its text; on a stream the decision IS the
    * state lookup — `dropDuplicatesWithinWatermark` holds (hash →
    * seen) exactly as long as the watermark horizon, so each arriving
    * duplicate is dropped at its own state probe and nothing is ever
    * materialized or joined back. The drop-list materializes the
    * decision for a later join; the stream applies it in place — the
    * hash-keyed state is the drop-list, streamed.
    *
    * Two documented deltas from batch, both intrinsic to bounded state:
    *  - SURVIVOR IDENTITY: batch keeps the global min id per group; a
    *    stream cannot know it and keeps the FIRST ARRIVAL within the
    *    horizon. When ingest order is id-monotonic (a crawl increment's
    *    natural order — the spec's replay pins this case) the keep sets
    *    are identical; in general the streaming pick is still exactly
    *    one survivor per group, just arrival-ordered.
    *  - HORIZON: a duplicate arriving later than `watermarkDelay` past
    *    its twin's event time re-admits (its state has been reclaimed) —
    *    the price of state bounded at O(docs per horizon), the same
    *    trade [[graft.streaming.EventStreams.dedupEvents]] documents.
    *    The periodic batch pass over the landed corpus subsumes these.
    *
    * Redelivery (at-least-once sources): a replayed doc hashes onto its
    * own state entry and is dropped — within the horizon the output is
    * exactly-once per content hash with NO extra machinery. */
  def exactDeduplicate(
      docs: org.apache.spark.sql.DataFrame,
      text: org.apache.spark.sql.Column,
      watermarkDelay: String,
      tsCol: String = "ts"): org.apache.spark.sql.DataFrame = {
    require(!docs.columns.contains("__content_hash"),
      "exactDeduplicate adds an internal __content_hash column; rename the input's")
    docs
      .withColumn("__content_hash", md5(text))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")
  }

  /** One doc fanned out to one band bucket (public: encoder codegen). */
  final case class Keyed(doc_id: Long, sig: Long, ts: Timestamp, chunk: Int, value: Long)

  final case class NearDupPair(a_id: Long, b_id: Long, hamming: Int)

  /** Bucket state: (doc_id, sig) of seen docs, most recent first, plus the
    * latest event-time seen (for the retention timeout). */
  final case class BucketState(entries: List[(Long, Long)], lastMs: Long)

  def nearDupPairs(
      docs: Dataset[Doc],
      maxHamming: Int,
      watermarkDelay: String = "0 seconds",
      retentionMs: Long = 3600000L,
      maxBucket: Int = 1024): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    import graft.operators.Dedup.{SimHashChunks, simhashChunk}
    val sig = graft.operators.Dedup.simhash(graft.operators.Dedup.tokenHashes(col("text")))
    val chunkCols = (0 until SimHashChunks).map(c => simhashChunk(col("sig"), c))
    val keyed = docs
      .withWatermark("ts", watermarkDelay)
      .withColumn("sig", sig)
      // null text → null signature: DROP the row like the batch twin's
      // equi-join silently does — without this filter the non-nullable
      // Keyed encoder throws on the first null-text doc and the restarted
      // query replays the same offset forever (a poison pill, where batch
      // parity calls for a silent skip)
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("sig"), col("ts"),
        posexplode(array(chunkCols: _*)).as(Seq("chunk", "value")))
      .as[Keyed]
    keyed
      .groupByKey(k => (k.chunk, k.value))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, Long), batch: Iterator[Keyed], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = Seq.newBuilder[NearDupPair]
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            var lastMs = state.getOption.map(_.lastMs).getOrElse(0L)
            // doc_id order makes same-batch processing deterministic and
            // orients every pair (earlier id = a_id)
            batch.toSeq.sortBy(_.doc_id).foreach { k =>
              // redelivery idempotence: a doc already in the bucket
              // (at-least-once source replay) must not re-emit its pairs
              // or occupy a second slot — both would double later
              // emissions against it
              if (!entries.exists(_._1 == k.doc_id)) {
                entries.foreach { case (pid, psig) =>
                  val ham = java.lang.Long.bitCount(psig ^ k.sig)
                  if (ham <= maxHamming &&
                    graft.operators.Dedup.firstSharedSimHashChunk(psig, k.sig) == k.chunk)
                    out += NearDupPair(math.min(pid, k.doc_id), math.max(pid, k.doc_id), ham)
                }
                entries = ((k.doc_id, k.sig) :: entries).take(maxBucket)
              }
              lastMs = math.max(lastMs, k.ts.getTime)
            }
            state.update(BucketState(entries, lastMs))
            state.setTimeoutTimestamp(
              math.max(lastMs + retentionMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
