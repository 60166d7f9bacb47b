package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("topOnePerGroup picks the first row under the given total order") {
    val df = Seq(
      ("a", 3, "x"), ("a", 1, "y"), ("a", 2, "z"),
      ("b", 5, "p")).toDF("k", "v", "tag")
    val got = Relational.topOnePerGroup(df, Seq(col("k")), Seq(col("v").asc))
      .orderBy("k").collect()
    assert(got.toSeq == Seq(Row("a", 1, "y"), Row("b", 5, "p")))
  }

  test("relativeThresholdTopOne drops below max/factor then ranks") {
    // reference semantics: src/benchmark.py:128-133 — candidates with
    // relevance < max/10 are discarded BEFORE the (year asc, rel desc) pick.
    val df = Seq(
      // group g: max score 100 → threshold 10. The earliest year (1990)
      // has score 5 < 10 so it must NOT win despite being earliest.
      ("g", 1990, 5.0, "tooWeak"),
      ("g", 2001, 100.0, "strong"),
      ("g", 1995, 20.0, "winner")).toDF("k", "year", "score", "tag")
    val got = Relational.relativeThresholdTopOne(
      df, Seq(col("k")), col("score"), 10.0,
      Seq(col("year").asc, col("score").desc)).collect()
    assert(got.length == 1 && got(0).getAs[String]("tag") == "winner")
  }

  test("unionDistinct applies set semantics across branches") {
    val a = Seq("x", "y").toDF("name")
    val b = Seq("y", "z").toDF("name")
    val c = Seq("z", "z").toDF("name")
    val got = Relational.unionDistinct(Seq(a, b, c)).as[String].collect().sorted
    assert(got.toSeq == Seq("x", "y", "z"))
  }

  test("hierarchyCoalesceWalk climbs until first non-null attr, else default") {
    // chain: 1 -> 2 -> 3 -> 4 ; attrs only on 3. node 9 has no edges/attr.
    val start = Seq(1, 9).toDF("id")
    val edges = Seq((1, 2), (2, 3), (3, 4)).toDF("c", "p")
    val attrs = Seq((3, "hit"), (4, "beyond")).toDF("k", "v")
    val got = Relational.hierarchyCoalesceWalk(
      start, "id", edges, "c", "p", attrs, "k", "v",
      hops = 3, default = lit("none"), outCol = "out")
      .select("id", "out").orderBy("id").collect()
    assert(got.toSeq == Seq(Row(1, "hit"), Row(9, "none")))
  }

  test("lastWriteWins resolves key conflicts deterministically") {
    val df = Seq((1, 10, "old"), (1, 20, "new"), (2, 5, "only"))
      .toDF("id", "prio", "payload")
    val got = Relational.lastWriteWins(df, Seq(col("id")), Seq(col("prio").desc))
      .orderBy("id").select("payload").as[String].collect()
    assert(got.toSeq == Seq("new", "only"))
  }

  test("asofJoin ≡ naive latest-preceding lookup (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // small key/ts domains force collisions (equal ts across and within sides)
    val genRow = for {
      u <- Gen.choose(1L, 3L); t <- Gen.choose(1L, 6L)
    } yield (u, t)
    val gen = for {
      nl <- Gen.choose(0, 12); nr <- Gen.choose(0, 12)
      ls <- Gen.listOfN(nl, genRow); rs <- Gen.listOfN(nr, genRow)
    } yield (ls, rs)
    val prop = Prop.forAll(gen) { case (ls, rs) =>
      val lrows = ls.zipWithIndex.map { case ((u, t), i) => (u, t, 1000L + i) }
      val rrows = rs.zipWithIndex.map { case ((u, t), i) => (u, t, 2000L + i) }
      val got = Relational.asofJoin(
        lrows.toDF("user_id", "ts_us", "event_id"),
        rrows.toDF("user_id", "ts_us", "event_id"),
        keys = Seq("user_id"), tsCol = "ts_us", tieCol = "event_id",
        rightPayload = Seq("event_id"), prefix = "r_")
        .select("event_id", "r_event_id")
        .as[(Long, Option[Long])].collect().toMap
      val expected = lrows.map { case (u, t, id) =>
        id -> rrows.filter(r => r._1 == u && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      }.toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("rangeJoin ≡ naive θ-join (property, bucket-boundary collisions)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // bucketWidth 5 with values -10..20: intervals straddle bucket edges,
    // points land exactly on lo/hi, and the negative range exercises the
    // truncating-division (not floor) bucketing — monotonicity keeps it
    // complete there too
    val genPoint = for { u <- Gen.choose(1L, 2L); t <- Gen.choose(-10L, 20L) } yield (u, t)
    val genIv = for {
      u <- Gen.choose(1L, 2L); lo <- Gen.choose(-10L, 20L); len <- Gen.choose(0L, 7L)
    } yield (u, lo, lo + len)
    val gen = for {
      np <- Gen.choose(0, 10); ni <- Gen.choose(0, 10)
      ps <- Gen.listOfN(np, genPoint); ivs <- Gen.listOfN(ni, genIv)
    } yield (ps, ivs)
    val prop = Prop.forAll(gen) { case (ps, ivs) =>
      val prows = ps.zipWithIndex.map { case ((u, t), i) => (u, t, 1000L + i) }
      val irows = ivs.zipWithIndex.map { case ((u, lo, hi), i) => (u, lo, hi, 2000L + i) }
      val got = Relational.rangeJoin(
        prows.toDF("user_id", "pt", "p_id"), Seq("user_id"), "pt",
        irows.toDF("i_user", "lo", "hi", "i_id"), Seq("i_user"), "lo", "hi",
        bucketWidth = 5L)
        .select("p_id", "i_id").as[(Long, Long)].collect().toSeq
      val expected = for {
        (u, t, pid) <- prows
        (iu, lo, hi, iid) <- irows
        if iu == u && t >= lo && t <= hi
      } yield (pid, iid)
      got.sorted == expected.sorted // exactly-once: multiplicities too
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("rangeJoin pairs each point with every covering interval") {
    val points = Seq((1L, 10L, 900L), (1L, 15L, 901L), (2L, 10L, 902L))
      .toDF("user_id", "pt", "p_id")
    val ivs = Seq((1L, 5L, 12L, 100L), (1L, 10L, 20L, 101L), (2L, 11L, 12L, 102L))
      .toDF("i_user", "lo", "hi", "i_id")
    val got = Relational.rangeJoin(
      points, Seq("user_id"), "pt", ivs, Seq("i_user"), "lo", "hi", bucketWidth = 4L)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got == Set((900L, 100L), (900L, 101L), (901L, 101L)))
  }

  test("asofJoin attaches the latest right row at or before each left ts") {
    // user 1: rights at ts 10, 20, 20 (ids 100, 101, 102) — equal-ts tie
    // goes to the highest id; lefts at ts 5 (nothing precedes), 20
    // (equal ts counts, expect id 102), 25 (expect id 102).
    // user 2: right at 30, left at 29 -> null.
    val left = Seq((1L, 5L, 900L), (1L, 20L, 901L), (1L, 25L, 902L), (2L, 29L, 903L))
      .toDF("user_id", "ts_us", "event_id")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 20L, 102L), (2L, 30L, 104L))
      .toDF("user_id", "ts_us", "event_id")
    val got = Relational.asofJoin(left, right,
      keys = Seq("user_id"), tsCol = "ts_us", tieCol = "event_id",
      rightPayload = Seq("event_id", "ts_us"), prefix = "r_")
      .select("event_id", "r_event_id", "r_ts_us")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (900L, None, None),
      (901L, Some(102L), Some(20L)),
      (902L, Some(102L), Some(20L)),
      (903L, None, None)))
  }
}
