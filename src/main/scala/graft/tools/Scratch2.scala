package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bisect q13 first-run cost: planning vs codegen vs execution. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch2] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val df = time("build df")(
      Tables.customer(spark, d).select(lower(col("c_name")).as("name")).distinct())
    time("plan")(df.queryExecution.executedPlan)
    time("exec count 1")(df.count())
    time("exec count 2")(df.count())
    val df2 = time("build df2")(
      Tables.customer(spark, d).select(upper(col("c_name")).as("name")).distinct())
    time("exec df2 count")(df2.count())
    // plain shuffle, no agg
    val df3 = Tables.customer(spark, d).repartition(32, col("c_name"))
    time("repartition count")(df3.count())
    spark.stop()
  }
}
