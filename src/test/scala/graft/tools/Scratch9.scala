package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: idle re-measure of q17_simjoin_lev1 and q23_simhash_pairs
  * at sf0.1 — both drifted +15-18% across two rounds with no code change
  * (VERDICT r7 ask #7); min-of-5 on an idle host settles drift vs real
  * regression the same way the q46 question was settled. */
object Scratch9 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("q17_simjoin_lev1", "q23_simhash_pairs")) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warmup
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"query":"$name","min":${times.min}%.3f,"all":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
