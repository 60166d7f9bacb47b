package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** SURVEY §5: "similarity join J14 (naive vs blocked equivalence — property
  * test with ScalaCheck random strings: blocked join ≡ filter lev ≤ 1)".
  */
class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deletionVariants = the string plus each single-deletion, deduped") {
    val out = Seq("abc", "", "aa").toDF("s")
      .select(sort_array(SimilarityJoin.deletionVariants(col("s"))).as("v"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("ab", "abc", "ac", "bc"))
    assert(out(1) == Seq(""))
    assert(out(2) == Seq("a", "aa")) // both deletions give "a" — deduped
  }

  test("deletionVariants of null is null (row drops out via explode)") {
    val df = Seq((1, Option.empty[String]), (2, Some("x"))).toDF("id", "s")
    val n = df.select(col("id"), explode(SimilarityJoin.deletionVariants(col("s")))).count()
    assert(n == 2) // only "x" and its one deletion ""
  }

  private def naivePairs(left: Seq[String], right: Seq[String]): Set[(String, String)] =
    (for {
      a <- left; b <- right
      if levenshteinDist(a, b) <= 1
    } yield (a, b)).toSet

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("blocked lev<=1 join ≡ naive cross-join filter (property, small alphabet)") {
    // Small alphabet maximizes collisions and near-miss pairs (the "ab"/"ba"
    // false-candidate case the verify step must reject).
    val genStr = Gen.choose(0, 5).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    val genCorpus = Gen.listOfN(30, genStr)
    val prop = Prop.forAll(genCorpus, genCorpus) { (ls: List[String], rs: List[String]) =>
      val left = ls.distinct.toDF("l")
      val right = rs.distinct.toDF("r")
      val rows = SimilarityJoin.levenshtein1Join(left, "l", right, "r")
        .as[(String, String)].collect().toSeq
      // exactly-once: the witness filter must keep ONE row per matching pair
      // even when the pair shares several variants (equal strings share all)
      rows.distinct == rows && rows.toSet == naivePairs(ls.distinct, rs.distinct)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("lev1_witness: analytic witness is a shared deletion variant (property)") {
    // the exactly-once selector is sound iff, whenever lev(a,b) <= 1, the
    // witness is a member of BOTH deletion neighborhoods — then exactly one
    // joined row satisfies __lv === witness
    def variants(s: String): Set[String] =
      (s +: s.indices.map(i => s.take(i) + s.drop(i + 1))).toSet
    val genStr = Gen.choose(0, 6).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    val prop = Prop.forAll(genStr, genStr) { (a: String, b: String) =>
      val witness = org.apache.spark.sql.graft.Bridge.column(
        graft.functions.Lev1Witness(
          org.apache.spark.sql.graft.Bridge.expression(col("a")),
          org.apache.spark.sql.graft.Bridge.expression(col("b"))))
      val w = Seq((a, b)).toDF("a", "b")
        .select(witness.as("w"))
        .as[Option[String]].head()
      if (levenshteinDist(a, b) <= 1)
        w.exists(v => variants(a).contains(v) && variants(b).contains(v))
      else w.isEmpty // self-contained: EVERY lev >= 2 pair yields null,
                     // including same-length and ±1-length pairs — the
                     // function is safe for standalone SQL use
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("blocked join on real-shaped keys finds substitution/insert/delete/equal") {
    val aliases = Seq((1, "fleetwoodmac"), (2, "pearljam"), (3, "nirvana")).toDF("id", "alias")
    val probes = Seq(("fleetwod mac", "fleetwodmac"), ("pearl jam", "pearljam"),
      ("nirvanna", "nirvanna"), ("queen", "queen")).toDF("probe", "key")
    val hits = SimilarityJoin.levenshtein1Join(probes, "key", aliases, "alias")
      .select("probe", "id").as[(String, Int)].collect().toSet
    assert(hits == Set(("fleetwod mac", 1), ("pearl jam", 2), ("nirvanna", 3)))
  }
}
