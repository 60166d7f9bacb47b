package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Plan probe: how many times do the gate kernels appear in the optimized
  * plan of the CurationBench gate stage shape? */
object ScratchGatePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = CurationBench.synth(spark, 1000L)
    val sw = TextAnalysis.StopwordProfiles.toMap.apply("en") ++
      TextAnalysis.StopwordProfiles.toMap.apply("fr")
    val stage = docs.join(
      TextAnalysis.qualityGate(docs, $"doc_id", $"text", sw,
        minTokens = 20L, minStopwordPermille = 10L, maxTopGramPermille = 300L)
        .filter($"keep").select("doc_id"), "doc_id")
    val plan = stage.queryExecution.optimizedPlan.toString
    println("== optimized ==")
    println("gate_stats occurrences: " + "gate_stats".r.findAllIn(plan).length)
    println("gram_repetition occurrences: " + "gram_repetition".r.findAllIn(plan).length)
    val phys = stage.queryExecution.executedPlan.toString
    println("physical gate_stats: " + "gate_stats".r.findAllIn(phys).length)
    println("physical gram_repetition: " + "gram_repetition".r.findAllIn(phys).length)
    println(plan.take(4000))
    spark.stop()
  }
}
