package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — the REAL counterpart of the
  * regex-"BPE-ish" token counter in
  * [[graft.operators.TextAnalysis.bpeishCount]]: trains an actual merge
  * table and applies it, so per-document token counts are the numbers a
  * trainer's tokenizer would produce, not a whitespace proxy. Algorithm
  * re-derived from the published method (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"): train
  * on the WORD HISTOGRAM, merging the most frequent adjacent symbol pair
  * until the merge budget is spent.
  *
  * Scale shape: the corpus contributes exactly ONE distributed pass — a
  * word-count aggregation (map-side partial combine, one shuffle on the
  * word), truncated to the `maxWords` head. The merge loop then runs on
  * that VOCABULARY-BOUNDED histogram driver-side with incremental
  * pair-count maintenance (only words containing the merged pair are
  * touched per iteration) — the same histogram-not-corpus factoring
  * every production BPE trainer uses, because merge decisions depend on
  * the corpus only through word counts. The driver-side `collect()` of
  * the histogram is therefore bounded by vocabulary (`maxWords` rows),
  * never by corpus size — the documented exception to the no-collect
  * rule, like the JDBC bounds probe. Application is a per-row codegen
  * expression ([[graft.functions.BpeTokenCount]]) with the model shipped
  * once per executor as a reference object.
  */
object Bpe {

  /** End-of-word marker, appended as a distinct symbol so merges can
    * distinguish word-final subwords ("est</w>" vs "est"). */
  val EndOfWord = "</w>"

  /** EXACT per-document token count under `model` — codegen kernel, the
    * drop-in upgrade for `TextAnalysis.bpeishCount` wherever the budget/
    * packing stages want real tokenizer numbers. */
  def tokenCount(text: Column, model: Model): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.BpeTokenCount(Bridge.expression(text), model))
  }

  /** The document's token sequence (audit/debug twin). */
  def tokens(text: Column, model: Model): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.BpeTokens(Bridge.expression(text), model))
  }

  /** A trained model: `merges` in rank order (lowest rank merges first
    * at apply time — the training order). */
  final case class Model(merges: Array[(String, String)]) extends Serializable {
    // EXACT tuple keys, same as training: a string-concatenation key with
    // any separator can collide when symbols themselves contain the
    // separator (crawl text legally carries NUL and every other
    // non-whitespace code point), silently merging pairs the model never
    // trained
    @transient lazy val ranks: java.util.HashMap[(String, String), Integer] = {
      val m = new java.util.HashMap[(String, String), Integer](merges.length * 2)
      var i = 0
      while (i < merges.length) {
        m.put(merges(i), i)
        i += 1
      }
      m
    }

    /** Greedy lowest-rank merging of one word (symbols = code points +
      * [[EndOfWord]]) — the standard apply loop. */
    def tokenize(word: String): Array[String] = {
      if (word.isEmpty) return Array.empty
      var syms = {
        val b = Array.newBuilder[String]
        var i = 0
        while (i < word.length) {
          val cp = word.codePointAt(i)
          val n = Character.charCount(cp)
          b += word.substring(i, i + n)
          i += n
        }
        b += EndOfWord
        b.result()
      }
      var continue = syms.length > 1
      while (continue) {
        var bestRank = Int.MaxValue
        var bestAt = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.get((syms(i), syms(i + 1)))
          if (r != null && r < bestRank) { bestRank = r; bestAt = i }
          i += 1
        }
        if (bestAt < 0) continue = false
        else {
          val merged = new Array[String](syms.length - 1)
          System.arraycopy(syms, 0, merged, 0, bestAt)
          merged(bestAt) = syms(bestAt) + syms(bestAt + 1)
          System.arraycopy(syms, bestAt + 2, merged, bestAt + 1, syms.length - bestAt - 2)
          syms = merged
          continue = syms.length > 1
        }
      }
      syms
    }

    def countTokens(word: String): Int = tokenize(word).length
  }

  /** Persist a trained model as a (rank, left, right) parquet table —
    * a tokenizer trained once on the 100 TB corpus is an artifact every
    * downstream job loads, not something each job retrains. */
  def save(model: Model, spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }.toSeq
      .toDF("rank", "left", "right")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model =
    Model(spark.read.parquet(path)
      .select(col("rank"), col("left"), col("right"))
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))))

  /** ONE distributed pass: the (word, count) histogram of `text`'s
    * whitespace tokens, top `maxWords` by count (ties by word — the
    * deterministic head every rerun reproduces).
    *
    * Scale note (found by the r11 30M step-up, 9.7 → 92.9 s at 3×):
    * the global sort+limit plans as per-partition top-K merged on the
    * driver, and once the corpus's distinct-word count passes
    * partitions × maxWords every partition ships its FULL maxWords head
    * — the singleton tail (which dominates a growing vocabulary) rides
    * the sort and the driver merge for nothing. The fix is an EXACT
    * pre-filter: if at least maxWords words occur ≥ 2 times, every
    * count-1 word is provably outside the top-maxWords cut (the order
    * is count desc first), so the sort runs over the multi-occurrence
    * words only. The probe costs one count over the slim (word, count)
    * aggregate, persisted across its two consumers — never the corpus.
    *
    * The filter is LOAD-BEARING, not just faster (r13 `BpeBench`, 10M
    * docs × 20 tokens, Zipf-1 with Heaps β=1.0 — 35.0M distinct words,
    * 24.3M singletons): without it the sort+limit's TakeOrdered driver
    * merge ships each partition's singleton-inflated local head and
    * ABORTS on spark.driver.maxResultSize (1038 MiB > the 1 GiB
    * default, both runs), where the filtered leg completes in 17.6 s.
    * In the multi-dominated regime (β=0.8: 4.33M distinct, 96% multi)
    * the branch fires but has nothing to trim — measured parity
    * (11.98 vs 12.16 s), identical heads. */
  def wordHistogram(df: DataFrame, text: Column, maxWords: Int): Array[(String, Long)] =
    wordHistogramImpl(df, text, maxWords, preFilter = true)

  /** [[wordHistogram]] with the singleton pre-filter switchable — the
    * `preFilter = false` leg exists ONLY so `graft.tools.BpeBench` can
    * A/B the filter against the plain sort+limit on a Heaps-law
    * vocabulary (the regime the filter was built for); production calls
    * go through the public method and always pre-filter. */
  private[graft] def wordHistogramImpl(
      df: DataFrame, text: Column, maxWords: Int,
      preFilter: Boolean): Array[(String, Long)] = {
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    val counts = df.select(explode(split(text, "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val multi = counts.filter(col("c") >= 2)
      val base =
        if (preFilter && multi.count() >= maxWords) multi else counts
      base.orderBy(col("c").desc, col("w").asc)
        .limit(maxWords)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
    } finally {
      counts.unpersist(blocking = false)
      ()
    }
  }

  /** Train `numMerges` merges on `df`'s text. See the object doc for the
    * scale factoring; determinism: pair-count ties break on the
    * lexicographically smallest pair, so the same corpus always yields
    * the same model. */
  def train(df: DataFrame, text: Column, numMerges: Int,
      maxWords: Int = 1000000): Model =
    trainOnHistogram(wordHistogram(df, text, maxWords), numMerges)

  /** The merge loop itself, exposed for spec-level golden tests. */
  def trainOnHistogram(histogram: Array[(String, Long)], numMerges: Int): Model = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    // mutable word representations + their counts
    val words: Array[Array[String]] = histogram.map { case (w, _) =>
      val b = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        b += w.substring(i, i + n)
        i += n
      }
      b += EndOfWord
      b.result()
    }
    val counts: Array[Long] = histogram.map(_._2)

    // pair -> total count, and pair -> indices of words containing it
    // (incremental maintenance: a merge touches only its pair's words)
    val pairCount = new java.util.HashMap[(String, String), Long]()
    val pairWords = new java.util.HashMap[(String, String), java.util.HashSet[Integer]]()
    def addPair(p: (String, String), c: Long, wi: Int): Unit = {
      pairCount.merge(p, c, (a, b) => a + b)
      pairWords.computeIfAbsent(p, _ => new java.util.HashSet[Integer]()).add(wi)
    }
    def subPair(p: (String, String), c: Long): Unit = {
      val nv = pairCount.getOrDefault(p, 0L) - c
      if (nv <= 0L) { pairCount.remove(p); pairWords.remove(p) }
      else pairCount.put(p, nv)
    }
    var wi = 0
    while (wi < words.length) {
      val s = words(wi)
      var i = 0
      while (i < s.length - 1) { addPair((s(i), s(i + 1)), counts(wi), wi); i += 1 }
      wi += 1
    }

    val merges = Array.newBuilder[(String, String)]
    var m = 0
    var exhausted = pairCount.isEmpty
    while (m < numMerges && !exhausted) {
      // argmax with deterministic lexicographic tie-break
      var best: (String, String) = null
      var bestC = 0L
      val it = pairCount.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c > bestC || (c == bestC && best != null &&
          (e.getKey._1 < best._1 || (e.getKey._1 == best._1 && e.getKey._2 < best._2)))) {
          best = e.getKey; bestC = c
        }
      }
      if (best == null) exhausted = true
      else {
        merges += best
        val mergedSym = best._1 + best._2
        val affected = pairWords.get(best)
        val affectedArr =
          if (affected == null) Array.empty[Integer]
          else affected.toArray(new Array[Integer](affected.size))
        var ai = 0
        while (ai < affectedArr.length) {
          val w = affectedArr(ai).intValue()
          val old = words(w)
          val c = counts(w)
          // retract old pairs of this word, rewrite, re-add new pairs
          var i = 0
          while (i < old.length - 1) { subPair((old(i), old(i + 1)), c); i += 1 }
          val nb = Array.newBuilder[String]
          i = 0
          while (i < old.length) {
            if (i < old.length - 1 && old(i) == best._1 && old(i + 1) == best._2) {
              nb += mergedSym; i += 2
            } else { nb += old(i); i += 1 }
          }
          val nw = nb.result()
          words(w) = nw
          i = 0
          while (i < nw.length - 1) { addPair((nw(i), nw(i + 1)), c, w); i += 1 }
          ai += 1
        }
        m += 1
        exhausted = pairCount.isEmpty
      }
    }
    Model(merges.result())
  }
}
