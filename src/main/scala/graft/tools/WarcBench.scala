package graft.tools

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Warc

/** Measured WARC/WET interchange throughput — the numbers behind the
  * source's scale claims: (w) export the synthetic curation corpus as
  * per-record-gzip-member WET shards, then read it back (r1) full-payload,
  * (r2) metadata-only — column pruning SKIPS payload bytes, so the census
  * must beat the full read by a wide margin — and (r3) with a pushed
  * `record_type` filter that materializes only the 10% minority class.
  *
  * Usage: runMain graft.tools.WarcBench [nDocs] [runs]
  * Prints one JSON line per stage and a closing summary line
  * (MB of shard bytes, per-stage sec + MB/s, min over runs).
  */
object WarcBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val root = "/tmp/graft_warc_bench"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)

    val stages = scala.collection.mutable.LinkedHashMap.empty[String, Array[Double]]
    def time(name: String, run: Int)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = body
      val sec = (System.nanoTime() - t0) / 1e9
      stages.getOrElseUpdate(name, Array.fill(runs)(0.0))(run) = sec
      println(f"""{"stage":"$name","run":$run,"sec":$sec%.2f,"result":$out}""")
    }

    var shardBytes = 0L
    for (run <- 0 until runs) {
      fs.delete(new Path(root), true)
      val docs = CurationBench.synth(spark, n)
        .withColumn("record_type",
          when(pmod(col("doc_id"), lit(10)) === 0, "metadata").otherwise("conversion"))
        .select(
          col("record_type"),
          concat(lit("https://bench.example.com/"), col("doc_id")).as("target_uri"),
          col("text").cast("binary").as("content"))
        .repartition(64)

      time("w_export", run) {
        docs.write.format("warc").mode("overwrite").save(root)
        shardBytes = fs.listStatus(new Path(root))
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_")).map(_.getLen).sum
        shardBytes
      }
      time("r1_full_read", run) {
        Warc.read(spark, root)
          .agg(sum(length(col("content")))).head().getLong(0)
      }
      time("r2_meta_census", run) {
        // content pruned out of the scan: payload bytes are skipped, not read
        Warc.read(spark, root)
          .agg(count(lit(1)), sum(col("content_length"))).head().getLong(1)
      }
      time("r3_filtered_read", run) {
        // pushed record_type filter gates payload materialization: only the
        // 10% minority class decompresses its bodies into rows
        Warc.read(spark, root).filter(col("record_type") === "metadata")
          .agg(sum(length(col("content")))).head().getLong(0)
      }
    }

    val mb = shardBytes / 1e6
    val parts = stages.map { case (k, v) =>
      val s = v.min
      f""""$k":{"sec":$s%.2f,"mb_per_sec":${mb / s}%.1f}"""
    }.mkString("{", ",", "}")
    println(f"""{"metric":"warc_bench","n_docs":$n,"runs":$runs,"shard_mb":$mb%.1f,"stages":$parts}""")
    fs.delete(new Path(root), true)
    spark.stop()
  }
}
