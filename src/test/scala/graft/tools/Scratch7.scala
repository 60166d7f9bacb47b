package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Dev probe: regex-chain stripMarkup vs the structural htmlText kernel
  * on 1M CurationBench-synth docs (9% HTML-wrapped). Usage:
  * runMain graft.tools.Scratch7 [nDocs]
  */
object Scratch7 {
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
        println(f"[scratch7] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.2fs chars=$chars")
      }
    }
    time("regex stripMarkup")(TextAnalysis.stripMarkup(col("text")))
    time("structural htmlText")(TextAnalysis.htmlText(col("text")))
    spark.stop()
  }
}
