package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the scale shape of [[Sampling.budgetSelect]]: the distributed
  * two-pass prefix sum must be value-identical to the naive one-window-
  * per-group form (the reference semantics) on adversarial data — null
  * groups, double weights, descending composite orders, groups far
  * larger than one range slice — and the plan must range-shuffle the
  * corpus exactly ONCE (the slice-totals branch reuses the window's
  * exchange; if ReuseExchange ever stopped firing, the two branches
  * could sample different range boundaries and silently disagree).
  */
class SamplingScaleSpec extends SparkSpec {
  import spark.implicits._

  /** Scoped conf set/restore (the session is shared across suites, so
    * always restore). */
  private def withConf[A](key: String, v: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, v)
    try body
    finally prev match {
      case Some(x) => spark.conf.set(key, x)
      case None => spark.conf.unset(key)
    }
  }

  /** Force the gated path for a block: 0 → always two-pass, Long.MaxValue
    * → always the naive window. */
  private def withTwoPassMinBytes[A](v: Long)(body: => A): A =
    withConf(Prefix.TwoPassMinBytesKey, v.toString)(body)

  private def naive(df: org.apache.spark.sql.DataFrame, group: org.apache.spark.sql.Column,
      order: Seq[org.apache.spark.sql.Column], weight: org.apache.spark.sql.Column,
      budget: Long) = {
    val w = Window.partitionBy(group).orderBy(order: _*)
    df.withColumn("cum_weight", sum(weight).over(w))
      .withColumn("kept", col("cum_weight") <= budget)
  }

  test("budgetSelect ≡ naive single-window form (long weights, null group, skewed groups)") {
    // 3 named groups with heavy skew + a null group; deterministic
    // pseudo-random weights; order (q desc, id asc) is total via id
    val df = spark.range(0, 5000).select(
      col("id"),
      when(pmod(col("id"), lit(50)) === 0, lit(null).cast("string"))
        .when(pmod(col("id"), lit(10)) < 7, lit("en"))
        .when(pmod(col("id"), lit(10)) < 9, lit("fr")).otherwise(lit("de")).as("g"),
      pmod(hash(col("id")), lit(97)).cast("long").as("q"),
      (pmod(hash(col("id"), lit(7)), lit(40)) + 1).cast("long").as("w"))
    val order = Seq(col("q").desc, col("id").asc)
    val got = withTwoPassMinBytes(0L) {
      Sampling.budgetSelect(df, col("g"), order, col("w"), budget = 2000L)
      .select("id", "cum_weight", "kept").as[(Long, Long, Boolean)].collect().map { case (a, b, c) => a -> ((b, c)) }.toMap
    }
    val want = naive(df, col("g"), order, col("w"), budget = 2000L)
      .select("id", "cum_weight", "kept").as[(Long, Long, Boolean)].collect().map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(got.size == 5000 && got == want)
  }

  test("runningSum: NULL weights count as 0, identically in both branches") {
    // the bare window-sum convention (skip nulls) would make a null-weight
    // row's total depend on which range slice it landed in; the pinned
    // null→0 convention must agree across the gate
    val df = spark.range(0, 3000).select(
      col("id"),
      pmod(col("id"), lit(3)).cast("string").as("g"),
      when(pmod(col("id"), lit(7)) === 0, lit(null).cast("long"))
        .otherwise(pmod(hash(col("id")), lit(20)) + 20).as("w"))
    def run(force: Long) = withTwoPassMinBytes(force) {
      Prefix.runningSum(df, col("g"), Seq(col("id").asc), col("w"), "cum")
        .select("id", "cum").as[(Long, Long)].collect().toMap
    }
    val twoPass = run(0L)
    val naivePath = run(Long.MaxValue)
    assert(twoPass.size == 3000 && twoPass == naivePath)
    // id=0 is the FIRST row of its group and carries a null weight: its
    // running total must be 0, not NULL (the Long decode above would have
    // thrown on NULL) and not the old all-nulls-prefix NULL
    assert(twoPass(0L) == 0L)
  }

  test("budgetSelect ≡ naive on double weights") {
    val df = spark.range(0, 1000).select(
      col("id"),
      pmod(col("id"), lit(3)).cast("string").as("g"),
      (pmod(hash(col("id"), lit(3)), lit(1000)).cast("double") / 10.0).as("w"))
    val order = Seq(col("id").asc)
    val got = withTwoPassMinBytes(0L) {
      Sampling.budgetSelect(df, col("g"), order, col("w"), budget = 5000L)
      .select("id", "cum_weight", "kept").as[(Long, Double, Boolean)].collect().map { case (a, b, c) => a -> ((b, c)) }.toMap
    }
    val want = naive(df, col("g"), order, col("w"), budget = 5000L)
      .select("id", "cum_weight", "kept").as[(Long, Double, Boolean)].collect().map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (c, k)) =>
      val (wc, wk) = want(id)
      assert(math.abs(c - wc) < 1e-6 && k == wk, s"row $id: got ($c,$k) want ($wc,$wk)")
    }
  }

  test("shuffleShards ≡ naive row_number window (few big shards)") {
    val df = spark.range(0, 4000).toDF("id")
    val got = withTwoPassMinBytes(0L) {
      Sampling.shuffleShards(df, col("id"), numShards = 3)
        .select("id", "shard", "pos_in_shard")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    }
    // naive reference: one window per shard
    val mixed = Sampling.mixedHash(col("id"), "v1")
    val w = Window.partitionBy(col("shard")).orderBy(mixed.asc, col("id").asc_nulls_first)
    val want = df.withColumn("shard", pmod(mixed, lit(3L)))
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
      .select("id", "shard", "pos_in_shard")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 4000 && got == want)
  }

  test("sequencePacking ≡ naive exclusive-sum window (few big shards)") {
    val df = spark.range(0, 3000).select(
      col("id"), pmod(col("id"), lit(2)).cast("string").as("lang"),
      (pmod(hash(col("id")), lit(200)) + 1).cast("long").as("tok"))
    val got = withTwoPassMinBytes(0L) {
      Packing.sequencePacking(df, "lang", "id", col("tok"), capacity = 512L)
        .select("id", "pack_offset", "bin_id", "offset_in_bin", "spans_boundary")
        .as[(Long, Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    }
    val w = Window.partitionBy(col("lang")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("pack_offset", coalesce(sum(col("tok")).over(w), lit(0L)))
      .withColumn("bin_id", expr("pack_offset div 512"))
      .withColumn("offset_in_bin", pmod(col("pack_offset"), lit(512L)))
      .withColumn("spans_boundary",
        col("tok") > 0 && expr("(pack_offset + tok - 1) div 512") > col("bin_id"))
      .select("id", "pack_offset", "bin_id", "offset_in_bin", "spans_boundary")
      .as[(Long, Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got.size == 3000 && got == want)
  }

  test("budgetSelect plan shape: one shared materialized range shuffle, sliced windows") {
    val df = spark.range(0, 2000).select(
      col("id"), pmod(col("id"), lit(2)).cast("string").as("g"),
      lit(1L).as("w"))
    val res = withTwoPassMinBytes(0L) {
      Sampling.budgetSelect(df, col("g"), Seq(col("id").asc), col("w"), 100L)
    }
    res.collect() // materialize so AQE finalizes the plan
    val plan = res.queryExecution.executedPlan.toString
    // the range shuffle lives in ONE pre-materialized RDD shared by both
    // branches (plan cloning cannot split it into two independently
    // sampled exchanges — the silent-corruption mode this design kills);
    // the consuming plan must scan that RDD, not re-range-partition
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"expected the shared materialized range shuffle, got plan:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"no consumer may re-sample its own range exchange, got plan:\n$plan")
    // the corpus-scale window is sliced — partitioned by (slice, group),
    // never by the group alone
    assert(plan.contains("windowspecdefinition(__pfx_pid"),
      s"expected slice-partitioned window, got plan:\n$plan")
  }

  test("size gate: small inputs take the naive window plan, values identical to two-pass") {
    val df = spark.range(0, 800).select(
      col("id"), pmod(col("id"), lit(3)).cast("string").as("g"), lit(2L).as("w"))
    val gated = Sampling.budgetSelect(df, col("g"), Seq(col("id").asc), col("w"), 50L)
    val plan = gated.queryExecution.executedPlan.toString
    // default gate (128 MB) >> this input: the plain one-window plan, no
    // materialized RDD hop, no slice column, no broadcast join
    assert(!plan.contains("ExistingRDD") && !plan.contains("__pfx_pid"),
      s"small input must take the naive window plan:\n$plan")
    val got = gated.select("id", "cum_weight", "kept")
      .as[(Long, Long, Boolean)].collect().toSet
    val want = withTwoPassMinBytes(0L) {
      Sampling.budgetSelect(df, col("g"), Seq(col("id").asc), col("w"), 50L)
        .select("id", "cum_weight", "kept").as[(Long, Long, Boolean)].collect().toSet
    }
    assert(got == want)
  }

  test("non-AQE offsets hint is size-gated: tiny offsets broadcast, over-gate degrades shuffled") {
    // with AQE off nothing converts the offsets join at runtime, so the
    // two-pass branch decides the hint itself — from the offsets table's
    // MEASURED row count (plan-time estimates read corpus-sized here),
    // so a pathological high-cardinality group key degrades to a
    // shuffled join instead of a forced-broadcast OOM
    val df = spark.range(0, 2000).select(
      col("id"), pmod(col("id"), lit(3)).cast("string").as("g"), lit(1L).as("w"))
    def run(maxBytes: Long) =
      withConf("spark.sql.adaptive.enabled", "false") {
        withConf(Prefix.OffsetsBroadcastMaxBytesKey, maxBytes.toString) {
          withTwoPassMinBytes(0L) {
            val res = Sampling.budgetSelect(df, col("g"), Seq(col("id").asc), col("w"), 100L)
            (res.select("id", "cum_weight", "kept").as[(Long, Long, Boolean)].collect().toSet,
              res.queryExecution.executedPlan.toString)
          }
        }
      }
    val want = naive(df, col("g"), Seq(col("id").asc), col("w"), 100L)
      .select("id", "cum_weight", "kept").as[(Long, Long, Boolean)].collect().toSet
    val (gotTiny, planTiny) = run(Prefix.OffsetsBroadcastMaxBytesDefault)
    assert(gotTiny == want)
    assert(planTiny.contains("BroadcastHashJoin"),
      s"tiny offsets under the default gate must keep the broadcast fast path:\n$planTiny")
    val (gotHuge, planHuge) = run(0L)
    assert(gotHuge == want)
    assert(!planHuge.contains("BroadcastHashJoin"),
      s"an over-gate offsets table must degrade to a shuffled join:\n$planHuge")
  }

  test("non-AQE offsets gate MEASURES variable-length group keys, not defaultSize") {
    // 30 groups × ~4 KB string keys ≈ 120 KB of key bytes; defaultSize
    // prices each string at 20 bytes (~3.7 KB total). Gate at 16 KB: the
    // old fixed-width estimate would broadcast (under-gate), the measured
    // width must degrade to a shuffled join — the r12 review's OOM path.
    val longKey = concat(lit("k" * 4096), pmod(col("id"), lit(30)).cast("string"))
    val df = spark.range(0, 600).select(col("id"), longKey.as("g"), lit(1L).as("w"))
    def run(maxBytes: Long) =
      withConf("spark.sql.adaptive.enabled", "false") {
        withConf(Prefix.OffsetsBroadcastMaxBytesKey, maxBytes.toString) {
          withTwoPassMinBytes(0L) {
            val res = Sampling.budgetSelect(df, col("g"), Seq(col("id").asc), col("w"), 100L)
            (res.select("id", "cum_weight", "kept").as[(Long, Long, Boolean)].collect().toSet,
              res.queryExecution.executedPlan.toString)
          }
        }
      }
    val want = naive(df, col("g"), Seq(col("id").asc), col("w"), 100L)
      .select("id", "cum_weight", "kept").as[(Long, Long, Boolean)].collect().toSet
    val (gotTight, planTight) = run(16L * 1024)
    assert(gotTight == want)
    assert(!planTight.contains("BroadcastHashJoin"),
      s"measured key bytes exceed the gate — must not broadcast:\n$planTight")
    // same data under a roomy gate still broadcasts (the measurement is
    // an estimate refinement, not a blanket disable)
    val (gotRoomy, planRoomy) = run(64L * 1024 * 1024)
    assert(gotRoomy == want)
    assert(planRoomy.contains("BroadcastHashJoin"),
      s"under-gate measured size must keep the broadcast fast path:\n$planRoomy")
  }

  test("hashSampleK on duplicate keys still returns exactly k rows per group (both paths)") {
    // every key appears twice — a flat violation of the unique-key
    // precondition; the ROWS-frame prefix count must still hand ties
    // distinct ranks so the k-cut keeps exactly k rows, never fewer
    val df = spark.range(0, 300)
      .select(pmod(col("id"), lit(150)).as("key"), pmod(col("id"), lit(3)).cast("string").as("g"))
    for (force <- Seq(0L, Long.MaxValue)) {
      val counts = withTwoPassMinBytes(force) {
        Sampling.hashSampleK(df, col("g"), col("key"), k = 10)
          .groupBy("g").count().as[(String, Long)].collect().toMap
      }
      assert(counts.values.toSet == Set(10L), s"force=$force got $counts")
    }
  }

  test("sequencePacking: a null token count packs as an empty doc, not a null bin") {
    val df = Seq((1L, "en", Some(5L)), (2L, "en", None), (3L, "en", Some(7L)))
      .toDF("id", "lang", "tok")
    val got = Packing.sequencePacking(df, "lang", "id", col("tok"), capacity = 8L)
      .select("id", "pack_offset", "bin_id", "offset_in_bin", "spans_boundary")
      .as[(Long, Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(2L) == ((2L, 5L, 0L, 5L, false)), s"null-tok row: ${got(2L)}")
    assert(got(3L) == ((3L, 5L, 0L, 5L, true)), s"row after null-tok: ${got(3L)}")
  }
}
