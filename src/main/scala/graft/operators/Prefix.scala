package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Distributed per-group running totals — the primitive under
  * [[Sampling.budgetSelect]], [[Sampling.shuffleShards]] and
  * [[Packing.sequencePacking]].
  *
  * The naive shape — ONE window partitioned by the group key — serializes
  * each group's prefix sum through a single task: groups are languages,
  * sources, or a handful of output shards, so a 100 TB corpus funnels its
  * dominant group through one sort. This is the classic two-pass parallel
  * prefix sum instead:
  *
  *   1. range-partition the corpus on (group, order…): each slice holds a
  *      contiguous run of some group's global order;
  *   2. a window over (slice-id, group) — its hash exchange spreads every
  *      group across all slices — computes WITHIN-SLICE running totals in
  *      parallel (parallelism = slices × groups, task size = corpus/slices);
  *   3. a (slice-id, group) aggregate — a few thousand rows — takes a
  *      running offset per group over the TINY table and broadcast-joins
  *      back: global running total = local total + slice offset.
  *
  * Slice boundaries don't affect the result — any order-consistent slicing
  * yields the same global prefix sums, because `order` must be TOTAL
  * (callers append a unique key), so ties cannot straddle a boundary
  * ambiguously — but the window branch and the totals branch MUST see the
  * same boundaries. That sharing is NOT left to the optimizer: Catalyst
  * clones a twice-consumed subplan (new expression ids), and two cloned
  * range exchanges sample their boundaries independently — ReuseExchange
  * may or may not merge them back (observed not to, which silently
  * corrupts offsets). Instead the range shuffle is materialized ONCE at
  * the RDD layer (`queryExecution.toRdd` + [[Bridge.internalCreateDataFrame]]):
  * one `ShuffledRowRDD` instance means one sampled `RangePartitioner` and
  * one set of map outputs, shared by both consumers through plain object
  * identity — plan cloning above the RDD cannot split it
  * (`SamplingScaleSpec` pins both the values and the plan shape).
  *
  * Costs to know about: the range boundaries sample eagerly when the
  * operator is CALLED (that sampling pass exists in any
  * `repartitionByRange` — here it just runs at construction instead of
  * first action), and the RDD boundary stops Catalyst pushdown from
  * crossing the prefix op (project/filter before calling it).
  */
private[operators] object Prefix {

  private val Helpers = Seq("__pfx_pid", "__pfx_w", "__pfx_cum", "__pfx_tpid", "__pfx_tg", "__pfx_off")

  /** `df` + `out` = the INCLUSIVE running sum of `weight` within each
    * `group`, ordered by `order` (which must be total). The sum's type is
    * `sum(weight)`'s (long for integral weights, double for doubles). */
  def runningSum(
      df: DataFrame, group: Column, order: Seq[Column], weight: Column,
      out: String): DataFrame = {
    require(!df.columns.exists(Helpers.contains),
      s"Prefix.runningSum uses ${Helpers.mkString("/")} helper columns; the input already has one")
    val spark = df.sparkSession
    val part = spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .withColumn("__pfx_w", weight)
      .repartitionByRange(part, (group +: order): _*)
    // ONE materialized shuffle: boundaries sampled once, map outputs
    // reused by both consumers below via RDD object identity
    val base = Bridge.internalCreateDataFrame(
        spark, ranged.queryExecution.toRdd, ranged.schema)
      .withColumn("__pfx_pid", spark_partition_id())
    val wLoc = Window.partitionBy(col("__pfx_pid"), group).orderBy(order: _*)
    val local = base.withColumn("__pfx_cum", sum(col("__pfx_w")).over(wLoc))
    val totals = base.groupBy(col("__pfx_pid").as("__pfx_tpid"), group.as("__pfx_tg"))
      .agg(sum(col("__pfx_w")).as("__pfx_tw"))
    val wOff = Window.partitionBy(col("__pfx_tg")).orderBy(col("__pfx_tpid").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(col("__pfx_tpid"), col("__pfx_tg"),
      sum(col("__pfx_tw")).over(wOff).as("__pfx_off"))
    local.join(broadcast(offsets),
        col("__pfx_pid") === col("__pfx_tpid") && (group <=> col("__pfx_tg")))
      .withColumn(out, col("__pfx_cum") + coalesce(col("__pfx_off"), lit(0)))
      .drop(Helpers: _*)
  }

  /** `df` + `out` = the 1-based rank within each `group` under `order` —
    * `row_number()` without the one-task-per-group window (the order must
    * be total, so rank == running count). */
  def runningRank(
      df: DataFrame, group: Column, order: Seq[Column], out: String): DataFrame =
    runningSum(df, group, order, lit(1L), out)
}
