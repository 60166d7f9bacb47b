package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Dev probe: diff sequencePacking (two-pass prefix) vs the naive window. */
object Scratch8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = spark.range(0, 3000).select(
      col("id"), pmod(col("id"), lit(2)).cast("string").as("lang"),
      (pmod(hash(col("id")), lit(200)) + 1).cast("long").as("tok"))
    val got = Packing.sequencePacking(df, "lang", "id", col("tok"), capacity = 512L)
      .select(col("id"), col("pack_offset").as("got_off"))
    val w = Window.partitionBy(col("lang")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("want_off", coalesce(sum(col("tok")).over(w), lit(0L)))
      .select(col("id"), col("want_off"), col("lang"), col("tok"))
    val j = got.join(want, "id").filter(col("got_off") =!= col("want_off"))
      .orderBy("id")
    println("mismatches: " + j.count())
    j.show(20, false)
    spark.stop()
  }
}
// appended probe: plan dump
object Scratch8b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(0, 3000).select(
      col("id"), pmod(col("id"), lit(2)).cast("string").as("lang"),
      (pmod(hash(col("id")), lit(200)) + 1).cast("long").as("tok"))
    val got = Packing.sequencePacking(df, "lang", "id", col("tok"), capacity = 512L)
    got.collect()
    val p = got.queryExecution.executedPlan.toString
    println("== rangepartitioning count: " + "rangepartitioning".r.findAllIn(p).length)
    println("== ReusedExchange: " + p.contains("ReusedExchange"))
    println(p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Window") || l.contains("Aggregate") || l.contains("Join")).mkString("\n"))
    spark.stop()
  }
}
