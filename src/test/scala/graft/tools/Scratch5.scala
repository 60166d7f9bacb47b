package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does q39_semdedup's wall time go? Times the three
  * stages (k-means fit, within-cell pair mining, connected components)
  * separately on the same session config Bench uses. */
object Scratch5 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Components, Similarity}
    import graft.sources.Tables

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[s5] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    for (rep <- 1 to 3) {
      println(s"[s5] --- rep $rep")
      val corpus = Tables.embeddings(spark, sfDir)
      val centroids = time("fitCells")(
        Similarity.fitCells(corpus, nlist = 16, seed = 42L, maxIter = 3)
          .cache()).localCheckpoint()
      val cells = corpus.select(col("vec_id").as("id"), col("embedding").as("emb"))
        .crossJoin(broadcast(centroids))
        .withColumn("__dist", -Similarity.quantizedDot(col("emb"), col("centroid")))
        .withColumn("__r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("id")).orderBy(col("__dist").asc, col("cell_id").asc)))
        .filter(col("__r") <= 2)
        .select(col("id"), col("emb"), col("cell_id"))
      val a = cells.select(col("cell_id"), col("id").as("a_id"), col("emb").as("a_emb"))
      val b = cells.select(col("cell_id").as("cell2"), col("id").as("b_id"), col("emb").as("b_emb"))
      val pairs = time("pairs") {
        val p = a.hint("shuffle_hash")
          .join(b, col("cell_id") === col("cell2") && col("a_id") < col("b_id"))
          .withColumn("score_q", Similarity.quantizedDot(col("a_emb"), col("b_emb")))
          .filter(col("score_q") >= 400000L)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
          .distinct().localCheckpoint()
        println(s"[s5] n_pairs=${p.count()}")
        p
      }
      time("components")(
        Components.connectedComponents(
          corpus.select(col("vec_id").as("id")), pairs).count())
    }
    spark.stop()
  }
}
