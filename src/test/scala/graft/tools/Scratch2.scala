package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SimilarityJoin

/** Dev probe: stage-by-stage cardinality/cost of the blocked lev-join. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
    val a = c.select(col("c_custkey").as("a_key"), col("c_name").as("a_name"))
    val b = c.select(col("c_custkey").as("b_key"), col("c_name").as("b_name"))
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[s2] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val l = a.withColumn("__lv", explode(SimilarityJoin.deletionVariants(col("a_name"))))
    val r = b.withColumn("__rv", explode(SimilarityJoin.deletionVariants(col("b_name"))))
    time("explode left count")(println(l.count()))
    val joined = l.join(r, col("__lv") === col("__rv"))
    time("join count")(println(joined.count()))
    val filtered = joined.filter(col("a_key") < col("b_key"))
    time("join+pairfilter count")(println(filtered.count()))
    val lev = filtered.filter(levenshtein(col("a_name"), col("b_name"), 1) >= 0)
    time("join+pair+lev count")(println(lev.count()))
    time("full op count")(println(
      SimilarityJoin.levenshtein1Join(a, "a_name", b, "b_name",
        pairFilter = Some(col("a_key") < col("b_key"))).count()))
    spark.stop()
  }
}
