package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Dev probe: where does the duplicate-span mask stage (06a) spend its
  * wall? Times the shingle scan alone, the posting explode, the global
  * count exchange, and the full mask DAG on CurationBench-synth docs.
  * Usage: runMain graft.tools.Scratch11 [nDocs]
  */
object Scratch11 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // drop the planted exact (id%25==3) and near (eb%10==1) copies — the
    // realistic 06a input is the POST-dedup corpus
    val uniq = args.length > 1 && args(1) == "uniq"
    val dir = s"/tmp/scratch11_${n}${if (uniq) "_uniq" else ""}"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) {
      val all = CurationBench.synth(spark, n)
      val out = if (uniq) all.filter(pmod($"doc_id", lit(25)) =!= 3 && pmod($"doc_id", lit(10)) =!= 1)
                else all
      out.write.parquet(dir)
    }
    val docs = spark.read.parquet(dir)
    println(s"docs: ${docs.count()}")

    def time(label: String)(f: => Any): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val r = f
        println(f"[s11] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
      }
    }

    val gram = 13
    val pathsOnly = args.contains("paths")
    if (!pathsOnly) {
      // 1. shingle kernel scan only (no explode, no shuffle)
      time("scan: sum(size(wide shingles))") {
        docs.select(sum(size(TextAnalysis.ngramHashesWideMultiset($"text", gram)))).head().getLong(0)
      }
      // 2. scan + posexplode (generation cost), no shuffle
      val postings = docs
        .select($"doc_id", posexplode(TextAnalysis.ngramHashesWideMultiset($"text", gram)))
        .select($"doc_id", $"pos".cast("long").as("pos"), $"col".as("h"))
      time("scan+posexplode: count") { postings.count() }
      // 3. count pass: the global gram-count exchange
      time("count pass: groupBy(h) >=2") {
        postings.groupBy($"h").agg(count(lit(1)).as("c")).filter($"c" >= 2).count()
      }
      // 3b. h-only exchange (no doc/pos carried)
      time("count pass h-only projection") {
        docs.select(explode(TextAnalysis.ngramHashesWideMultiset($"text", gram)).as("h"))
          .groupBy($"h").agg(count(lit(1)).as("c")).filter($"c" >= 2).count()
      }
    }
    // 4. full mask DAG
    time("full duplicateSpans (lazy path)") {
      Dedup.duplicateSpans(docs, $"doc_id", $"text", gram).count()
    }
    // 4b. the sketch path (forced above-gate)
    spark.conf.set(Dedup.BroadcastGateMinBytesKey, "0")
    time("full duplicateSpans (sketch path)") {
      Dedup.duplicateSpans(docs, $"doc_id", $"text", gram).count()
    }
    spark.conf.unset(Dedup.BroadcastGateMinBytesKey)
    // 5. rewrite
    if (!pathsOnly) time("removeSpans") {
      val spans = Dedup.duplicateSpans(docs, $"doc_id", $"text", gram)
      Dedup.removeSpans(docs, $"doc_id", $"text", spans).agg(sum(length($"clean_text"))).head().getLong(0)
    }
    spark.stop()
  }
}
