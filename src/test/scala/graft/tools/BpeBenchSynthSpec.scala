package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the Zipf/Heaps law of [[BpeBench]]'s synthetic corpus — the
  * published pre-filter claim (load-bearing at β=1.0, harmless at
  * β=0.8) is only meaningful while the generator actually produces
  * the regime each β promises: a hot head, a 1/r tail, and a
  * singleton share that flips between the two exponents. */
class BpeBenchSynthSpec extends SparkSpec {
  import spark.implicits._

  private val n = 20000L

  private def wordCounts(beta: Double) =
    BpeBench.synth(spark, n, beta)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()

  test("synth is deterministic, fully sized, fixed tokens per doc") {
    val docs = BpeBench.synth(spark, n, 1.0)
    assert(docs.count() == n)
    assert(docs.select(size(split(col("text"), " ")).as("k"))
      .filter(col("k") =!= BpeBench.TokensPerDoc).count() == 0)
    val a = docs.orderBy("doc_id").collect()
    val b = BpeBench.synth(spark, n, 1.0).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("Zipf head: rank-1 word dominates, counts fall roughly as 1/r") {
    // ranks map to words "w1", "w2", ...; under P(r) ∝ 1/r the count
    // ratio c(w1)/c(w10) ≈ 10 — assert within loose [4, 25] bounds
    // (the law matters, not the constant)
    val c = wordCounts(1.0).filter(col("w").isin("w1", "w10"))
      .as[(String, Long)].collect().toMap
    val ratio = c("w1").toDouble / c("w10")
    assert(ratio > 4 && ratio < 25, s"c(w1)/c(w10) = $ratio")
  }

  test("Heaps β flips the singleton regime the published A/B rests on") {
    def shares(beta: Double): (Long, Long) = {
      val counts = wordCounts(beta).persist()
      val d = counts.count()
      val singles = counts.filter(col("count") === 1).count()
      counts.unpersist()
      (d, singles)
    }
    val (d08, s08) = shares(0.8)
    val (d10, s10) = shares(1.0)
    // β=0.8: multi-dominated — singletons a small minority
    assert(s08.toDouble / d08 < 0.3, s"beta=0.8 singleton share ${s08.toDouble / d08}")
    // β=1.0: the singleton tail dominates the distinct-word count
    assert(s10.toDouble / d10 > 0.5, s"beta=1.0 singleton share ${s10.toDouble / d10}")
    assert(d10 > 2 * d08, s"beta=1.0 vocabulary must be far larger ($d10 vs $d08)")
  }
}
