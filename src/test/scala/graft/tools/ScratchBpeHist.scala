package graft.tools

/** Dev probe: time Bpe.wordHistogram on a resident bench corpus — used
  * to verify the r11 singleton pre-filter at the 30M size where the
  * step-up measured the histogram super-linear. Not a test. */
object ScratchBpeHist {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft_span_bench/corpus_30000000")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", "/tmp/graft_curation_scratch")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(path)
    val t0 = System.nanoTime()
    val hist = graft.operators.Bpe.wordHistogram(
      df, org.apache.spark.sql.functions.col("text"), 1000000)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"bpe_hist","path":"$path","sec":$sec%.2f,"words":${hist.length},"top":"${hist.head._1}:${hist.head._2}"}""")
    spark.stop()
  }
}
