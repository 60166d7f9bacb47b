package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("nearest-rank quantiles: pinned positions on 1..10") {
    val df = (1 to 10).map(i => ("g", i.toLong, i.toLong)).toDF("grp", "v", "id")
    val got = Stats.groupedQuantiles(df, Seq("grp"), "v", "id", Seq(500, 900, 990))
      .as[(String, Long, Long, Long, Long)].head()
    // ranks: ceil(10*.5)=5, ceil(10*.9)=9, ceil(10*.99)=10
    assert(got == (("g", 10L, 5L, 9L, 10L)))
  }

  test("singleton group: every quantile is the single member") {
    val df = Seq(("a", 7L, 1L), ("b", 3L, 2L), ("b", 4L, 3L)).toDF("grp", "v", "id")
    val got = Stats.groupedQuantiles(df, Seq("grp"), "v", "id", Seq(500, 990))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 7L, 7L), ("b", 2L, 3L, 4L)))
  }

  test("null values sort last: low quantiles never return null") {
    val df = Seq(("g", Option(5L), 1L), ("g", Option.empty[Long], 2L), ("g", Option(9L), 3L))
      .toDF("grp", "v", "id")
    val got = Stats.groupedQuantiles(df, Seq("grp"), "v", "id", Seq(500, 1000))
      .as[(String, Long, Option[Long], Option[Long])].head()
    // rank ceil(3*.5)=2 over [5, 9, null] -> 9 (nulls-first default would
    // have returned 5); p1000 is the last element -> the null itself
    assert(got == (("g", 3L, Some(9L), None)))
  }

  test("quantileBuckets: tercile split on 1..9, value == cut lands low") {
    val df = (1L to 9L).map(i => ("g", i, i)).toDF("grp", "v", "id")
    // cuts: rank ceil(9*.333)=3 -> 3, rank ceil(9*.667)=7 -> 7; value
    // STRICTLY above a cut moves up, so 3 stays in bucket 0 and 7 in 1
    val got = Stats.quantileBuckets(df, Seq("grp"), "v", "id", Seq(333, 667))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._2 -> r._4).toMap
    assert(got == Map(
      1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L,
      8L -> 2L, 9L -> 2L))
  }

  test("quantileBuckets: per-group cuts are independent") {
    val df = (Seq(("a", 100L, 1L)) ++ (1L to 3L).map(i => ("b", i, 10L + i)))
      .toDF("grp", "v", "id")
    val got = Stats.quantileBuckets(df, Seq("grp"), "v", "id", Seq(500))
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap // (grp, value) -> bucket
    // a: single member is its own median -> bucket 0; b: median of
    // [1,2,3] is 2 -> only 3 exceeds it
    assert(got == Map(
      ("a", 100L) -> 0L, ("b", 1L) -> 0L, ("b", 2L) -> 0L, ("b", 3L) -> 1L))
  }

  test("quantileBuckets: null group survives, null value lands in the TOP bucket") {
    val df = Seq(
      (Option("g"), Option(1L), 1L), (Option("g"), Option(2L), 2L),
      (Option("g"), Option.empty[Long], 3L), // null VALUE in group g
      (Option.empty[String], Option(5L), 4L)) // null GROUP, single member
      .toDF("grp", "v", "id")
    val got = Stats.quantileBuckets(df, Seq("grp"), "v", "id", Seq(500))
      .as[(Option[String], Long, Option[Long], Long)].collect()
      .map(r => r._2 -> r._4).toMap // id -> bucket
    // g's cut: rank ceil(3*.5)=2 over [1, 2, null] (nulls LAST) -> 2; the
    // null value ranked last for the cut must also label as the tail;
    // the null group's row must survive the null-safe threshold join
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("approx_percentile (the 100 TB sketch path) stays near the exact ranks") {
    // the documented scale substitution: one t-digest sketch instead of a
    // per-group sort. Pin its error against groupedQuantiles on real data
    // so "approx is close" is a measured claim, not a hope.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = Stats.groupedQuantiles(docs, Seq("lang"), "n_chars", "doc_id", Seq(500, 900))
      .select("lang", "p500_n_chars", "p900_n_chars")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val approx = docs.groupBy("lang")
      .agg(org.apache.spark.sql.functions.expr(
        "approx_percentile(n_chars, array(0.5, 0.9), 1000)").as("q"))
      .select("lang", "q").as[(String, Seq[Long])].collect()
      .map(r => r._1 -> (r._2.head, r._2(1))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (lang, (e50, e90)) =>
      val (a50, a90) = approx(lang)
      assert(math.abs(a50 - e50) <= math.max(2L, e50 / 20), s"$lang p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) <= math.max(2L, e90 / 20), s"$lang p90: $a90 vs $e90")
    }
  }

  test("grouped quantiles ≡ naive sorted-index (property)") {
    val gen = Gen.choose(1, 30).flatMap(k =>
      Gen.listOfN(k, Gen.zip(Gen.oneOf("x", "y"), Gen.choose(0L, 50L))))
    val ps = Seq(100, 500, 900, 1000)
    val prop = Prop.forAll(gen) { (rows: List[(String, Long)]) =>
      val df = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("grp", "v", "id")
      val got = Stats.groupedQuantiles(df, Seq("grp"), "v", "id", ps)
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, Seq(r._3, r._4, r._5, r._6))).toMap
      val expected = rows.groupBy(_._1).map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted
        val n = sorted.length
        g -> ((n.toLong, ps.map(p =>
          sorted(math.max(1, math.ceil(n * p / 1000.0).toInt) - 1))))
      }
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
