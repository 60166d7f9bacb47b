package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("running offsets, bins, and boundary straddles (capacity 10)") {
    val docs = Seq(
      ("s1", 1L, "a b c d"),            // 4 toks: offset 0, bin 0
      ("s1", 2L, "e f g h i"),          // 5 toks: offset 4, bin 0
      ("s1", 3L, "j k l"),              // 3 toks: offset 9, bin 0, straddles into 1
      ("s1", 4L, ""),                   // 0 toks: offset 12, bin 1, no straddle
      ("s2", 9L, "x y"))                // other shard packs independently
      .toDF("source", "doc_id", "text")
    val got = Packing.sequencePacking(docs, "source", "doc_id",
      TextAnalysis.tokenCount(col("text")), capacity = 10L)
      .select("doc_id", "pack_offset", "bin_id", "offset_in_bin", "spans_boundary")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 0L, false),
      (2L, 4L, 0L, 4L, false),
      (3L, 9L, 0L, 9L, true),
      (4L, 12L, 1L, 2L, false),
      (9L, 0L, 0L, 0L, false)))
  }

  test("packing is a partition of the token stream (property)") {
    val gen = Gen.choose(1, 20).flatMap(k =>
      Gen.listOfN(k, Gen.choose(0, 12)))
    val prop = Prop.forAll(gen) { (toks: List[Int]) =>
      val docs = toks.zipWithIndex
        .map { case (t, i) => ("s", i.toLong, Seq.fill(t)("w").mkString(" ")) }
        .toDF("source", "doc_id", "text")
      // run once on the natural layout and once explicitly scattered over
      // 7 partitions — the "deterministic on any partitioning" claim
      val rows = Packing.sequencePacking(docs, "source", "doc_id",
        TextAnalysis.tokenCount(col("text")), capacity = 7L)
        .select("doc_id", "pack_offset").as[(Long, Long)].collect()
        .sortBy(_._1)
      val scattered = Packing.sequencePacking(docs.repartition(7), "source", "doc_id",
        TextAnalysis.tokenCount(col("text")), capacity = 7L)
        .select("doc_id", "pack_offset").as[(Long, Long)].collect()
        .sortBy(_._1)
      // offsets are exactly the exclusive prefix sums — no token lost, no
      // token double-packed, independent of Spark's physical partitioning
      val expected = toks.scanLeft(0L)(_ + _).init
      rows.map(_._2).toSeq == expected && scattered.toSeq == rows.toSeq
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
