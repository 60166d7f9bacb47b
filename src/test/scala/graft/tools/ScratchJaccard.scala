package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measurement probe (dev-only): current jaccardPairs (df-prune via a
  * separate aggregate branch = 2 corpus shingle passes) vs a window-based
  * df-prune over the single h-exchange (1 corpus pass, 2 index sorts).
  * Run: Test/runMain graft.tools.ScratchJaccard /root/testdata/sf0.1
  */
object ScratchJaccard {
  def windowVariant(
      df: DataFrame, id: org.apache.spark.sql.Column, text: org.apache.spark.sql.Column,
      n: Int, minJaccardPermille: Int, maxShingleFreq: Long): DataFrame = {
    val docs = df.select(id.as("doc"), Dedup.shingleHashes(text, n).as("hs"))
      .filter(size(col("hs")) > 0)
    val index = docs
      .select(col("doc"), size(col("hs")).as("sz"), explode(col("hs")).as("h"))
    val wh = Window.partitionBy(col("h"))
    val pruned = index.withColumn("df_count", count(lit(1)).over(wh))
      .filter(col("df_count") <= maxShingleFreq && col("df_count") >= 2)
      .drop("df_count")
    val sizeCompatible =
      col("a_size") * lit(1000L) >= col("b_size") * lit(minJaccardPermille.toLong) &&
      col("b_size") * lit(1000L) >= col("a_size") * lit(minJaccardPermille.toLong)
    pruned.select(col("h"), col("doc").as("a_id"), col("sz").as("a_size"))
      .hint("shuffle_hash")
      .join(pruned.select(col("h").as("h2"), col("doc").as("b_id"), col("sz").as("b_size")),
        col("h") === col("h2") && col("a_id") < col("b_id") && sizeCompatible)
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("common"),
        max(col("a_size")).as("a_size"), max(col("b_size")).as("b_size"))
      .withColumn("jaccard_permille",
        floor(col("common") * lit(1000L) / (col("a_size") + col("b_size") - col("common"))).cast("long"))
      .filter(col("jaccard_permille") >= minJaccardPermille)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def cur() = Dedup.jaccardPairs(docs, col("doc_id"), col("text"), 3, 200, 1000000L)
    def win() = windowVariant(docs, col("doc_id"), col("text"), 3, 200, 1000000L)
    // same params as q24's registration? print both counts to confirm equality
    println(s"current=${cur().count()} window=${win().count()}")
    def time(f: () => DataFrame, label: String): Unit = {
      f().count() // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time(cur, "current")
    time(win, "window ")
    spark.stop()
  }
}
