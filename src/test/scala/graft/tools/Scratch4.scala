package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.functions.MinHashSig
import graft.operators.Dedup
import graft.sources.Tables

/** One-off q25 decomposition timing. */
object Scratch4 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch4] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 3; val k = 8; val bands = 4; val r = k / bands

    val docs = Tables.documents(spark, sfDir)
    val base = docs.select(col("doc_id").as("doc"), Dedup.shingleHashes(col("text"), n).as("hs"))
      .withColumn("__sig", Bridge.column(MinHashSig(Bridge.expression(col("hs")), k)))
      .filter(col("__sig").isNotNull)
    val bandSig = (b: Int) => concat_ws("_", (0 until r).map(i => col("__sig")(b * r + i)): _*)
    val withB = base.select(col("doc"), col("hs"), array((0 until bands).map(bandSig): _*).as("bs"))
    val buckets = withB.select(col("doc"), col("hs"), col("bs"),
      posexplode(col("bs")).as(Seq("band", "sig")))

    for (_ <- 1 to 2) {
      time("base count")(base.count())
      time("buckets count")(buckets.count())
      val a = buckets.select(col("band"), col("sig"), col("doc").as("a_id"), col("bs").as("a_bs"), col("hs").as("a_hs"))
      val b = buckets.select(col("band").as("band2"), col("sig").as("sig2"), col("doc").as("b_id"), col("bs").as("b_bs"), col("hs").as("b_hs"))
      val rawPairs = a.hint("shuffle_hash").join(b,
        col("band") === col("band2") && col("sig") === col("sig2") && col("a_id") < col("b_id"))
      time("raw bucket pairs")(rawPairs.count())
      val firstShared = (0 until bands - 1).foldRight(lit(bands - 1): org.apache.spark.sql.Column) { (i, rest) =>
        when(col("a_bs")(i) === col("b_bs")(i), lit(i)).otherwise(rest) }
      time("dedup pairs")(rawPairs.filter(col("band") === firstShared).count())
      time("full q25")(graft.SparkEntry.queries("q25_lsh_pairs")(spark, sfDir).count())
    }
    spark.stop()
  }
}
