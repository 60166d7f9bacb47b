package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan pins for the bucketed-layout contract: co-bucketed joins and
  * bucket-key aggregates must plan with ZERO exchanges, and bucket-key
  * equality filters must prune buckets at planning time. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def withTables(names: String*)(body: => Unit): Unit =
    try body finally names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))

  private def noBroadcast(body: => Unit): Unit = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("co-bucketed tables join and aggregate with zero exchanges") {
    withTables("bk_docs", "bk_scores") {
      noBroadcast {
        val docs = (1L to 500L).map(i => (i, s"text $i")).toDF("doc_id", "text")
        val scores = (1L to 500L).map(i => (i, i % 7)).toDF("doc_id", "score")
        Bucketing.writeBucketed(docs, "bk_docs", 8, Seq("doc_id"), Seq("doc_id"))
        Bucketing.writeBucketed(scores, "bk_scores", 8, Seq("doc_id"), Seq("doc_id"))

        val joined = Bucketing.table(spark, "bk_docs")
          .join(Bucketing.table(spark, "bk_scores"), "doc_id")
        val jPlan = joined.queryExecution.executedPlan.toString
        assert(jPlan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$jPlan")
        assert(!jPlan.contains("Exchange"),
          s"co-bucketed join must shuffle NOTHING:\n$jPlan")
        assert(joined.count() == 500L)

        val agg = Bucketing.table(spark, "bk_docs").groupBy("doc_id").count()
        val aPlan = agg.queryExecution.executedPlan.toString
        assert(!aPlan.contains("Exchange"),
          s"bucket-key aggregate must not re-shuffle:\n$aPlan")
        assert(agg.count() == 500L)
      }
    }
  }

  test("in-bucket sort lets the sort-merge join skip its sorts (opt-in conf)") {
    withTables("bk_a", "bk_b") {
      noBroadcast {
        val a = (1L to 300L).map(i => (i, i * 2)).toDF("id", "x")
        val b = (1L to 300L).map(i => (i, i * 3)).toDF("id", "y")
        Bucketing.writeBucketed(a, "bk_a", 4, Seq("id"), Seq("id"))
        Bucketing.writeBucketed(b, "bk_b", 4, Seq("id"), Seq("id"))
        // Spark 3+ only trusts bucket sort order under this conf (and
        // with one file per bucket, which writeBucketed guarantees)
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        try {
          val j = spark.table("bk_a").join(spark.table("bk_b"), "id")
          val plan = j.queryExecution.executedPlan.toString
          assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"), plan)
          assert(!plan.contains("Sort ["),
            s"sorted single-file buckets must not re-sort:\n$plan")
          assert(j.count() == 300L)
        } finally spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      }
    }
  }

  test("bucket-key equality filter prunes to one bucket at planning time") {
    withTables("bk_pruned") {
      val docs = (1L to 400L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      Bucketing.writeBucketed(docs, "bk_pruned", 8, Seq("doc_id"))
      // DisableUnnecessaryBucketedScan flips a scan with no distribution
      // requirement back to a flat read — turn auto mode off to pin the
      // pruning capability itself
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try {
        val q = spark.table("bk_pruned").filter(col("doc_id") === 123L)
        val plan = q.queryExecution.executedPlan.toString
        assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
          s"a bucket-key literal must prune to its single bucket:\n$plan")
        assert(q.count() == 1L)
      } finally spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    }
  }

  test("mismatched bucket counts still join correctly (one side re-shuffles)") {
    withTables("bk_m8", "bk_m4") {
      noBroadcast {
        val a = (1L to 100L).map(i => (i, i)).toDF("id", "x")
        Bucketing.writeBucketed(a, "bk_m8", 8, Seq("id"), Seq("id"))
        Bucketing.writeBucketed(a.withColumnRenamed("x", "y"), "bk_m4", 4, Seq("id"), Seq("id"))
        val j = spark.table("bk_m8").join(spark.table("bk_m4"), "id")
        assert(j.count() == 100L) // correctness first; plan may coalesce or exchange
      }
    }
  }
}
