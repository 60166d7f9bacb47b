package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev probe: where does LSH pair mining (CurationBench stage 05a)
  * spend its wall? Times the minhash-signature scan, the slim band
  * exchange + hot-bucket cap window, the bucket self-join + pair
  * aggregate, and the full operator, on the post-dedup-shaped synth
  * corpus. Usage: runMain graft.tools.Scratch12 [nDocs]
  */
object Scratch12 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "128m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = s"/tmp/scratch11_${n}_uniq" // reuse Scratch11's corpus
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) {
      CurationBench.synth(spark, n)
        .filter(pmod($"doc_id", lit(25)) =!= 3 && pmod($"doc_id", lit(10)) =!= 1)
        .write.parquet(dir)
    }
    val docs = spark.read.parquet(dir)
    println(s"docs: ${docs.count()}")

    def time(label: String)(f: => Any): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val r = f
        println(f"[s12] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
      }
    }

    val (ng, k, bands, thr) = (3, 8, 4, 800)
    // 1. minhash signature scan only
    time("minhash sig scan") {
      docs.select(Dedup.minhashSigArray($"text", ng, k).as("sig"))
        .select(sum(element_at($"sig", 1))).head().getLong(0)
    }
    // 1b. exchange + hash agg only (the anti-cap build cost)
    time("band exchange + count agg") {
      val r = k / bands
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          (element_at($"__sig", b * r + 1) * lit(1000000007L) +
            element_at($"__sig", b * r + 2)).as("sig"))
      }
      val exploded = docs.select($"doc_id".as("doc"), Dedup.minhashSigArray($"text", ng, k).as("__sig"))
        .filter($"__sig".isNotNull)
        .select($"doc", explode(array(bandCols: _*)).as("bk"))
        .select($"doc", $"bk.band".as("band"), $"bk.sig".as("sig"))
      exploded.groupBy($"band", $"sig").agg(count(lit(1)).as("c")).filter($"c" > 10000).count()
    }
    // 2. band rows through the exchange + cap window (no join)
    time("band exchange + cap window") {
      val base = docs.select($"doc_id".as("doc"), Dedup.minhashSigArray($"text", ng, k).as("__sig"))
        .filter($"__sig".isNotNull)
      val r = k / bands
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          (element_at($"__sig", b * r + 1) * lit(1000000007L) +
            element_at($"__sig", b * r + 2)).as("sig"))
      }
      val withB = base.select($"doc", array(bandCols: _*).as("bs"))
      val exploded = withB.select($"doc", explode($"bs").as("bk"))
        .select($"doc", $"bk.band".as("band"), $"bk.sig".as("sig"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"band", $"sig")
      exploded.withColumn("__bsz", count(lit(1)).over(w))
        .filter($"__bsz" <= 10000).count()
    }
    // 2b. candidate pairs only (bucketedPairs + pair agg, no verify)
    time("cand pairs via operator-internal DAG") {
      val sigs = Dedup.minhashSignatures(docs, $"doc_id", $"text", ng, k)
      val r = k / bands
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          (col(s"mh_${b * r}") * lit(1000000007L) + col(s"mh_${b * r + 1}")).as("sig"))
      }
      val exploded = sigs.select($"doc", explode(array(bandCols: _*)).as("bk"))
        .select($"doc", $"bk.band".as("band"), $"bk.sig".as("sig"))
      val hot = exploded.groupBy($"band", $"sig").agg(count(lit(1)).as("c"))
        .filter($"c" > 10000).select($"band", $"sig")
      val buckets = exploded.join(broadcast(hot), Seq("band", "sig"), "left_anti")
      def side(p: String) = buckets.select($"band".as(p + "band"), $"sig".as(p + "sig"), $"doc".as(p + "_doc"))
      side("a").hint("shuffle_hash").join(side("b"),
        col("aband") === col("bband") && col("asig") === col("bsig") && col("a_doc") < col("b_doc"))
        .groupBy(col("a_doc"), col("b_doc")).agg(count(lit(1)))
        .count()
    }
    // 3. full candidate pairs (pre-verify)
    time("full pairs incl. verify") {
      Dedup.minhashNearDupPairs(docs, $"doc_id", $"text", ng, k, bands, thr).count()
    }
    spark.stop()
  }
}
