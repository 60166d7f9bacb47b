package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomContains

/** Bloom-filter-accelerated semi/anti joins — the "blocklist/allowlist
  * against a 100 TB fact" shape of a training-data pipeline (drop every
  * document whose key appears in a takedown list; keep only documents on
  * a license allowlist; strip lineitems of cancelled orders).
  *
  * Semantics are EXACTLY the plain `left_anti`/`left_semi` equi-join —
  * the Bloom sketch is a routing optimization, never a source of error:
  *
  *   - the filter side aggregates into one Bloom sketch (distributed
  *     build with partial merges via `stat.bloomFilter`; only the final
  *     KB..MB bitset reaches the driver — the same single-sketch collect
  *     Spark's own AQE runtime filters perform);
  *   - every big-side row probes the sketch inside whole-stage codegen
  *     ([[graft.functions.BloomContains]]);
  *   - "definitely absent" rows are settled MAP-SIDE — for an anti join
  *     they pass through, for a semi join they are dropped, with no
  *     exchange at all;
  *   - only the "maybe present" sliver (true members + the fpp share of
  *     false positives) takes the exact confirming equi-join, so the
  *     shuffle moves ~|matches| + fpp·|big| rows instead of |big|.
  *
  * The anti join reads the big side twice (once per branch) — at scale
  * two pruned columnar scans are far cheaper than shuffling the full
  * fact, which is what a single-pass `left_anti` would do. The semi join
  * is single-scan (the map-side branch only discards).
  *
  * `fpp` trades sketch size against confirm-join traffic; correctness
  * never depends on it, nor on `expectedItems` being a good estimate (an
  * undersized sketch only degrades the fpp, sending more rows to the
  * exact confirm).
  *
  * Both keys are probed through `xxhash64` — pass keys of the SAME data
  * type on both sides (an int and a long hash differently even for equal
  * values; the confirm join would then silently degrade to all-maybe).
  * Null big-side keys follow SQL equi-join semantics: never equal to
  * anything, so an anti join keeps them and a semi join drops them
  * (map-side in both cases is consistent: `xxhash64(null)` is the seed
  * hash, and the confirm join's `===` never matches null).
  */
object BloomJoin {

  /** Distributed build of the filter-side sketch: one Bloom filter over
    * `xxhash64(key)`, returned serialized (readable on any executor via
    * `BloomFilter.readFrom`). Runs as a Tungsten typed-imperative
    * aggregate (Catalyst's own `BloomFilterAggregate` — partial
    * per-partition sketches merge map-side, one bitset reaches the
    * driver); an empty filter side yields the empty sketch rather than
    * the NPE `DataFrameStatFunctions.bloomFilter` hits on null. */
  /** Pass as `expectedItems` to size the sketch by COUNTING the filter
    * side first (one cheap aggregate over the small side). An explicit
    * estimate saves that job — but a low-ball estimate quietly saturates
    * the bitset and the realized fpp routes most of the big side into
    * the confirm join, so auto-sizing is the default everywhere the
    * cardinality isn't provably known. */
  val AutoSize: Long = -1L

  def buildFilter(
      filterSide: DataFrame, key: Column,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    val sized = if (expectedItems == AutoSize) filterSide.count() else expectedItems
    val n = math.max(sized, 1L)
    val numBits = BloomFilter.optimalNumOfBits(n, fpp)
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(key)), Literal(n), Literal(numBits))
    val row = filterSide.select(Bridge.column(agg.toAggregateExpression())).head()
    if (row.isNullAt(0)) serialize(BloomFilter.create(1L, fpp))
    else row.getAs[Array[Byte]](0)
  }

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  private def maybeContains(bytes: Array[Byte], key: Column): Column =
    Bridge.column(BloomContains(bytes, Bridge.expression(xxhash64(key))))

  /** Persist a built sketch for reuse across runs — the daily-pipeline
    * shape: build the takedown/allowlist filter ONCE when the list
    * changes, then every ingest run loads the bytes instead of re-scanning
    * the list (same rationale as the incremental-dedup signature index).
    * One-row parquet via the engine's own IO — works on any Hadoop-visible
    * path, no driver-local filesystem assumptions. */
  def saveFilter(spark: org.apache.spark.sql.SparkSession, bytes: Array[Byte], path: String): Unit = {
    import spark.implicits._
    Seq(Tuple1(bytes)).toDF("filter_bytes").write.mode("overwrite").parquet(path)
  }

  def loadFilter(spark: org.apache.spark.sql.SparkSession, path: String): Array[Byte] =
    spark.read.parquet(path).select(col("filter_bytes")).head().getAs[Array[Byte]](0)

  /** The map-side gate alone, from pre-built sketch bytes: keep rows the
    * sketch may contain (`keep = true`) or provably lacks. A pure
    * deterministic Column — composes into `readStream` unchanged (the
    * streaming ingest gate; pair with a stream-static confirm join for
    * exactness, or accept the fpp as an over-keep).
    *
    * The fpp's error DIRECTION depends on how the gate is wired.
    * `filter(bloomGate(...))` (allowlist / semi shape) over-KEEPS ~fpp of
    * non-members — recoverable by a later confirm join. But
    * `filter(!bloomGate(...))` (blocklist / anti shape) over-DROPS ~fpp of
    * INNOCENT rows — silent data loss no downstream step can recover.
    * Without the confirm join, only the keep direction is safe; for a
    * blocklist use [[bloomAntiJoin]], whose confirm join restores exact
    * anti semantics. */
  def bloomGate(bytes: Array[Byte], key: Column): Column =
    maybeContains(bytes, key)

  /** `big` minus every row whose `bigKey` equals some `blockKey` —
    * exact `left_anti` semantics, bloom-routed (see object doc).
    *
    * PRECONDITION: `big` must be deterministic — the two branches
    * re-evaluate it independently (like any double-referenced
    * DataFrame), so a nondeterministic side (`sample`, `rand()`, a
    * source mutating between jobs) can land a row in both branches or
    * neither. Checkpoint such inputs first; [[bloomSemiJoin]] is
    * single-scan and immune. */
  def bloomAntiJoin(
      big: DataFrame, bigKey: Column,
      block: DataFrame, blockKey: Column,
      expectedItems: Long = AutoSize, fpp: Double = 0.03): DataFrame = {
    val bytes = buildFilter(block, blockKey, expectedItems, fpp)
    val maybe = maybeContains(bytes, bigKey)
    // no false negatives: !maybe rows are provably not in the blocklist
    val pass = big.filter(!maybe)
    // no distinct() on the block side: anti joins are insensitive to
    // build-side multiplicity, so deduping would only add an exchange
    // (pre-distinct a duplicate-HEAVY list yourself if build size bites)
    val confirmed = big.filter(maybe)
      .join(block.select(blockKey.as("__bloom_key")),
        bigKey === col("__bloom_key"), "left_anti")
    pass.unionByName(confirmed)
  }

  /** Rows of `big` whose `bigKey` equals some `allowKey` — exact
    * `left_semi` semantics; non-members are dropped map-side, only
    * bloom-positives shuffle into the confirming semi join. */
  def bloomSemiJoin(
      big: DataFrame, bigKey: Column,
      allow: DataFrame, allowKey: Column,
      expectedItems: Long = AutoSize, fpp: Double = 0.03): DataFrame = {
    val bytes = buildFilter(allow, allowKey, expectedItems, fpp)
    big.filter(maybeContains(bytes, bigKey))
      .join(allow.select(allowKey.as("__bloom_key")),
        bigKey === col("__bloom_key"), "left_semi")
  }
}
