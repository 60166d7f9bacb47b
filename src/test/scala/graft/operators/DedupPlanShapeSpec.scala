package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape guards for the dedup tier: these operators were specifically
  * engineered down to a known shuffle budget (see Dedup scaladoc), and a
  * careless refactor — a distinct() for pair dedup, an aggregate
  * formulation of the signature — silently reintroduces corpus-wide
  * exchanges that only show up as cost at scale.
  */
class DedupPlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f"), (2L, "a b c d e g"), (3L, "x y z w v u"))
    .toDF("doc_id", "text")

  private def nExchanges(df: DataFrame): Int =
    "(?<!Broadcast)Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length

  test("minhash signatures are narrow-only: zero exchanges") {
    val sig = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), n = 3, k = 8)
    assert(nExchanges(sig) == 0,
      s"per-row signature must not shuffle:\n${sig.queryExecution.executedPlan}")
  }

  test("fused LSH near-dup pairs: one exchange per self-join side, no distinct aggregate") {
    val pairs = Dedup.minhashNearDupPairs(
      docs, col("doc_id"), col("text"), n = 3, k = 8, bands = 4, minJaccardPermille = 200)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(nExchanges(pairs) <= 2, s"LSH pair plan grew extra shuffles:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"pair dedup must be the first-shared-band filter, not an aggregate:\n$plan")
  }

  test("simhash near-dup pairs keep the single-exchange shape") {
    val pairs = Dedup.simhashNearDupPairs(docs, col("doc_id"), col("text"), maxHamming = 2)
    assert(nExchanges(pairs) <= 2,
      s"simhash pair plan grew extra shuffles:\n${pairs.queryExecution.executedPlan}")
  }

  test("stratified sample is pure map-side: zero exchanges") {
    val sampled = Sampling.stratifiedHashSample(
      docs.withColumn("lang", TextAnalysis.langId(col("text"))),
      col("lang"), col("doc_id"), Map("en" -> 200), 500)
    assert(nExchanges(sampled) == 0,
      s"sampling must compose into the scan:\n${sampled.queryExecution.executedPlan}")
  }
}
