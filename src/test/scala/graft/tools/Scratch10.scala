package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Pii, TextAnalysis}

/** Dev probe: 3-pass regex scrub chain vs the fused PiiScrub kernel on
  * CurationBench-synth docs (6% carry an email+phone suffix), alone and
  * fused with langId as in curation stage 02. Usage:
  * runMain graft.tools.Scratch10 [nDocs]
  */
object Scratch10 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = CurationBench.synth(spark, n).persist()
    println(s"docs: ${docs.count()}")
    def time(label: String)(c: org.apache.spark.sql.Column): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val chars = docs.select(sum(length(c))).head().getLong(0)
        println(f"[scratch10] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.2fs chars=$chars")
      }
    }
    time("regex chain scrub")(Pii.scrubComposed(col("text")))
    time("fused PiiScrub")(Pii.scrub(col("text")))
    time("regex scrub + langId")(
      concat(Pii.scrubComposed(col("text")), TextAnalysis.langId(col("text"))))
    time("fused scrub + langId")(
      concat(Pii.scrub(col("text")), TextAnalysis.langId(col("text"))))
    spark.stop()
  }
}
