package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev probe: head-to-head of the r8 LSH pair shape (string band keys,
  * count-window cap, verify-below-join, no candidate cache) vs the
  * committed operator, same JVM + corpus so the host band cancels.
  * Usage: runMain graft.tools.Scratch13 [nDocs]
  */
object Scratch13 {

  /** The r8 shape, reconstructed test-side for the A/B; `numKey` and
    * `verifyAbove` toggle the two r9 changes independently. */
  private def oldPairs(df: DataFrame, id: Column, text: Column,
      n: Int, k: Int, bands: Int, minJaccardPermille: Int,
      maxBucketSize: Int = 10000,
      numKey: Boolean = false, verifyAbove: Boolean = false): DataFrame = {
    val r = k / bands
    def bandKeyOld(values: Seq[Column]): Column =
      if (numKey) values(0) * lit(1000000007L) + values(1)
      else concat_ws("_", values: _*)
    val base = df.select(id.as("doc"), Dedup.minhashSigArray(text, n, k).as("__sig"))
      .filter(col("__sig").isNotNull)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        bandKeyOld((0 until r).map(i => element_at(col("__sig"), b * r + i + 1))).as("sig"))
    }
    val exploded = base.select(col("doc"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    val wBucket = Window.partitionBy(col("band"), col("sig"))
    val buckets = exploded.withColumn("__bsz", count(lit(1)).over(wBucket))
      .filter(col("__bsz") <= maxBucketSize).drop("__bsz")
    def side(p: String) = buckets.select(
      col("band").as(s"${p}band"), col("sig").as(s"${p}sig"), col("doc").as(s"${p}_doc"))
    val cand = side("a").hint("shuffle_hash").join(side("b"),
      col("aband") === col("bband") && col("asig") === col("bsig") &&
        col("a_doc") < col("b_doc"))
      .groupBy(col("a_doc").as("a_id"), col("b_doc").as("b_id"))
      .agg(count(lit(1)).as("__nb")).drop("__nb")
    val candIds = cand.select(col("a_id").as("doc"))
      .unionByName(cand.select(col("b_id").as("doc"))).distinct()
    val hsCand =
      if (verifyAbove)
        df.select(id.as("doc"), text.as("__text"))
          .join(candIds, Seq("doc"), "left_semi")
          .select(col("doc"), Dedup.shingleHashes(col("__text"), n).as("hs"))
          .filter(col("hs").isNotNull)
      else
        df.select(id.as("doc"), Dedup.shingleHashes(text, n).as("hs"))
          .filter(col("hs").isNotNull)
          .join(candIds, Seq("doc"), "left_semi")
    cand
      .join(hsCand.select(col("doc").as("a_id"), col("hs").as("a_hs")), Seq("a_id"))
      .join(hsCand.select(col("doc").as("b_id"), col("hs").as("b_hs")), Seq("b_id"))
      .withColumn("common", size(array_intersect(col("a_hs"), col("b_hs"))))
      .withColumn("jaccard_permille",
        expr("(common * 1000) div (size(a_hs) + size(b_hs) - common)"))
      .filter(col("jaccard_permille") >= minJaccardPermille)
      .select(col("a_id"), col("b_id"), col("jaccard_permille"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "128m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = s"/tmp/scratch11_${n}_uniq"
    val docs = spark.read.parquet(dir)
    println(s"docs: ${docs.count()}")
    def time(label: String)(f: => Any): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val r = f
        println(f"[s13] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
      }
    }
    time("A string key, verify below") {
      oldPairs(docs, $"doc_id", $"text", 3, 8, 4, 800).count()
    }
    time("B numeric key, verify below") {
      oldPairs(docs, $"doc_id", $"text", 3, 8, 4, 800, numKey = true).count()
    }
    time("C string key, verify above") {
      oldPairs(docs, $"doc_id", $"text", 3, 8, 4, 800, verifyAbove = true).count()
    }
    time("D numeric key, verify above") {
      oldPairs(docs, $"doc_id", $"text", 3, 8, 4, 800, numKey = true, verifyAbove = true).count()
    }
    time("E committed operator") {
      Dedup.minhashNearDupPairs(docs, $"doc_id", $"text", 3, 8, 4, 800).count()
    }
    if (args.contains("plans")) {
      val d = oldPairs(docs, $"doc_id", $"text", 3, 8, 4, 800, numKey = true, verifyAbove = true)
      val e = Dedup.minhashNearDupPairs(docs, $"doc_id", $"text", 3, 8, 4, 800)
      println("==== D PLAN ====\n" + d.queryExecution.executedPlan.toString)
      println("==== E PLAN ====\n" + e.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
