package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: how does Spark 4 read the driver's ns-timestamp events table? */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      df.printSchema()
      df.show(3, truncate = false)
    } catch { case e: Throwable => println("READ FAILED: " + e.getMessage.take(500)) }
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df2 = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      df2.printSchema()
      df2.show(3, truncate = false)
    } catch { case e: Throwable => println("LEGACY READ FAILED: " + e.getMessage.take(500)) }
    spark.stop()
  }
}
