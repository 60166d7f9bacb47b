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
    val got = Sampling.budgetSelect(df, col("g"), order, col("w"), budget = 2000L)
      .select("id", "cum_weight", "kept").as[(Long, Long, Boolean)].collect().map { case (a, b, c) => a -> ((b, c)) }.toMap
    val want = naive(df, col("g"), order, col("w"), budget = 2000L)
      .select("id", "cum_weight", "kept").as[(Long, Long, Boolean)].collect().map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(got.size == 5000 && got == want)
  }

  test("budgetSelect ≡ naive on double weights") {
    val df = spark.range(0, 1000).select(
      col("id"),
      pmod(col("id"), lit(3)).cast("string").as("g"),
      (pmod(hash(col("id"), lit(3)), lit(1000)).cast("double") / 10.0).as("w"))
    val order = Seq(col("id").asc)
    val got = Sampling.budgetSelect(df, col("g"), order, col("w"), budget = 5000L)
      .select("id", "cum_weight", "kept").as[(Long, Double, Boolean)].collect().map { case (a, b, c) => a -> ((b, c)) }.toMap
    val want = naive(df, col("g"), order, col("w"), budget = 5000L)
      .select("id", "cum_weight", "kept").as[(Long, Double, Boolean)].collect().map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (c, k)) =>
      val (wc, wk) = want(id)
      assert(math.abs(c - wc) < 1e-6 && k == wk, s"row $id: got ($c,$k) want ($wc,$wk)")
    }
  }

  test("budgetSelect range-shuffles the corpus exactly once (ReuseExchange pinned)") {
    val df = spark.range(0, 2000).select(
      col("id"), pmod(col("id"), lit(2)).cast("string").as("g"),
      lit(1L).as("w"))
    val res = Sampling.budgetSelect(df, col("g"), Seq(col("id").asc), col("w"), 100L)
    res.collect() // materialize so AQE finalizes the plan
    val plan = res.queryExecution.executedPlan.toString
    val nRange = "rangepartitioning".r.findAllIn(plan).length
    val reused = plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage") ||
      plan.contains("StageReuse")
    assert(nRange >= 1, s"expected a range exchange in:\n$plan")
    assert(reused || nRange == 1,
      s"slice-totals branch must reuse the window's range exchange, got plan:\n$plan")
  }
}
