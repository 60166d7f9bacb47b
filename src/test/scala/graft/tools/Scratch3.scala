package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev probe: LSH ANN recall/candidate tradeoff across (planes, probeBits). */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet").cache()
      val queries = emb.filter(col("vec_id") < 20)
      val exact = Similarity.bruteForceTopK(queries, emb, 5, Similarity.quantizedDot)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      for (planes <- Seq(6, 8); pb <- Seq(1, 2); tables <- Seq(4, 8)) {
        val t0 = System.nanoTime()
        val approx = Similarity.lshTopK(queries, emb, 5, planes,
          Similarity.quantizedDot, probeBits = pb, tables = tables)
          .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
        val recall = exact.intersect(approx).size.toDouble / exact.size
        println(f"[lsh] $sf planes=$planes probe=$pb tables=$tables recall=$recall%.2f t=${(System.nanoTime()-t0)/1e9}%.1fs")
      }
    }
    spark.stop()
  }
}
