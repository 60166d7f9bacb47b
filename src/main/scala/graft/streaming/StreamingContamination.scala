package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Contamination, Dedup, TextAnalysis}

/** Contamination gating on an INGEST STREAM — the streaming twin of
  * [[graft.operators.Contamination.ngramOverlapPairs]]: as train documents
  * arrive, flag every (benchmark doc, incoming doc) pair sharing at least
  * `minShared` distinct n-gram shingles.
  *
  * Shape: a STREAM-STATIC join. The benchmark suite is small and fixed for
  * a training run, so its inverted index ([[benchmarkIndex]]) is a static
  * DataFrame — Spark re-plans it into each micro-batch (broadcast at
  * benchmark sizes; no streaming state for the index side). The stream
  * side explodes each arriving doc to its shingle postings; all of a doc's
  * postings land in the SAME micro-batch (they come from one input row),
  * but the per-pair shared-count still needs an aggregate, so the count
  * runs as a watermarked windowed aggregation — state is bounded by the
  * watermark, emission is append-mode exactly-once when the window closes.
  *
  * At 100 TB/day ingest: per-batch work is postings × matching benchmark
  * buckets (hot shingles already capped when building the index); the only
  * streaming state is the per-(window, pair) counters inside the
  * watermark horizon.
  */
object StreamingContamination {

  /** Static side, built ONCE per run: (h, bench_id, bench_size) postings
    * of the benchmark suite. `maxBenchShingleFreq` drops shingles shared by
    * more than that many BENCHMARK docs (boilerplate).
    *
    * CAP-SEMANTICS DIVERGENCE from the batch operator: the batch
    * [[graft.operators.Contamination.ngramOverlapPairs]] caps TRAIN-side
    * document frequency (the corpus is fully visible there), which is
    * impossible on a stream — train-side df is unknowable per micro-batch —
    * so the streaming gate caps the BENCHMARK side where the index is
    * built. When neither cap binds (the default at 10^6 on benchmark-sized
    * suites) the two operators flag identical pairs — that is the parity
    * the specs pin; when a cap binds they may differ, which is why the
    * parameter is named for the side it actually caps. */
  def benchmarkIndex(
      bench: DataFrame, id: String, text: String, n: Int,
      maxBenchShingleFreq: Long = 1000000L,
      normalize: Column => Column = identity): DataFrame = {
    val postings = Contamination.postings(
      bench, col(id), normalize(col(text)), n, "bench_id", "bench_size")
    val keep = postings.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxBenchShingleFreq).select(col("h"))
    // cached: a stream-static join re-plans the static side into EVERY
    // micro-batch — uncached, a seconds-cadence query would re-shingle
    // the whole suite and re-run the df prune per batch, forever. The
    // entry lives until the caller unpersists the returned frame (the
    // run's natural end)
    postings.join(keep, "h").cache()
  }

  /** Stream side. `docs` must be a STREAMING DataFrame with columns
    * (`idCol`, `textCol`, `tsCol`: timestamp). Emits one row per
    * (window, bench_id, train_id) pair with `n_shared ≥ minShared`, when
    * the event-time window closes under the watermark.
    *
    * At-least-once sources: a replayed doc id is dropped within the
    * watermark horizon (`dropDuplicatesWithinWatermark` BEFORE the
    * shingle explode — a duplicate delivery would otherwise double-count
    * every shared shingle, inflating `n_shared` past the true value and
    * `contaminated_permille` past 1000). A replay arriving after the
    * watermark expired its dedup state emits a second pair row — bound
    * `watermarkDelay` to the source's redelivery horizon.
    * → (window_start, bench_id, train_id, n_shared, contaminated_permille).
    */
  def overlapPairs(
      docs: DataFrame, idCol: String, textCol: String, tsCol: String,
      index: DataFrame, n: Int, minShared: Int,
      watermarkDelay: String = "0 seconds",
      windowLength: String = "10 minutes",
      normalize: Column => Column = identity): DataFrame = {
    val stream = docs
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCol)
      .select(col(tsCol).as("__ts"), col(idCol).as("train_id"),
        explode(Dedup.shingleHashes(normalize(col(textCol)), n)).as("h"))
    stream.join(index, "h") // stream-static: no state on the index side
      .groupBy(window(col("__ts"), windowLength),
        col("bench_id"), col("train_id"))
      .agg(count(lit(1)).as("n_shared"), max(col("bench_size")).as("bench_size"))
      .filter(col("n_shared") >= minShared)
      .select(col("window.start").as("window_start"),
        col("bench_id"), col("train_id"), col("n_shared"),
        TextAnalysis.perMille(col("n_shared"), col("bench_size"))
          .as("contaminated_permille"))
  }
}
