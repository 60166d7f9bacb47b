package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup, TextAnalysis}

/** Pins the planted structure of [[CurationBench]]'s synthetic corpus —
  * the throughput table in README is only meaningful while every stage
  * has its planted work, and a silent drift here (a seed change, a
  * share change) would quietly turn stages into no-ops. */
class CurationBenchSynthSpec extends SparkSpec {
  import spark.implicits._

  private val n = 10000L
  private lazy val docs = CurationBench.synth(spark, n).persist()

  test("synth is deterministic and fully sized") {
    assert(docs.count() == n)
    val again = CurationBench.synth(spark, n)
    assert(docs.select("doc_id", "text").except(again.select("doc_id", "text")).count() == 0)
  }

  test("language mix: ~20% fr, junk tier tags und, rest en") {
    val langs = docs
      .withColumn("t", TextAnalysis.htmlText($"text"))
      .select(TextAnalysis.langId($"t").as("lang"))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(langs("fr") > n / 10 && langs("fr") < n * 3 / 10, s"fr share off: $langs")
    assert(langs("en") > n / 2, s"en share off: $langs")
    assert(langs.getOrElse("und", 0L) > n / 60 && langs.getOrElse("und", 0L) < n / 20,
      s"junk (und) share off: $langs")
  }

  test("exact copies: ~4% duplicate their predecessor after markup strip") {
    val stripped = docs.select($"doc_id", TextAnalysis.htmlText($"text").as("t"))
    val groups = Dedup.exactGroups(stripped, $"t", $"doc_id")
      .filter($"n_copies" >= 2)
    val dupDocs = groups.agg(sum($"n_copies" - 1)).head().getLong(0)
    assert(dupDocs > n / 50 && dupDocs < n / 15, s"exact-copy share off: $dupDocs")
  }

  test("near copies: planted pairs sit above the 0.8-jaccard dedup bar") {
    val stripped = docs.select($"doc_id", TextAnalysis.htmlText($"text").as("t"))
    val pairs = Dedup.minhashNearDupPairs(stripped, $"doc_id", $"t", 3, 8, 4, 800)
    // planted near-pairs: eb%10==1 copies eb-1 (exact copies also collide;
    // both count as dedup work) — expect at least ~8% of docs in pairs
    assert(pairs.count() > n / 15, s"near-dup pair mass off: ${pairs.count()}")
  }

  test("skew corpus plants the three adversarial pathologies") {
    val skewed = CurationBench.synth(spark, n, skew = true).persist()
    try {
      val stripped = skewed.select($"doc_id", TextAnalysis.htmlText($"text").as("t"))
      // 1. dominant language: fr collapses from ~20% to ~5%
      val langs = stripped.select(TextAnalysis.langId($"t").as("lang"))
        .groupBy("lang").count().as[(String, Long)].collect().toMap
      assert(langs("fr") > n / 50 && langs("fr") < n / 10, s"skew fr share off: $langs")
      // 2. boilerplate cluster: 10% of docs share constant body1+body2
      // blocks — their band signatures collide into buckets of cluster
      // scale, which a production cap (smaller than the cluster) must
      // surface as capped
      val capped = Dedup.cappedLshBuckets(
        stripped, $"doc_id", $"t", n = 3, k = 8, bands = 4, maxBucketSize = 100)
        .agg(max($"bucket_size")).head().getLong(0)
      assert(capped > n / 50, s"boilerplate bucket too small to stress the cap: $capped")
      // ...and the cluster members are NOT near-dups (shared blocks, but
      // distinct mid/tail): the capped join must PRUNE them, not absorb
      // them as legitimate dedup output
      val bp = stripped
        .filter(pmod($"doc_id", lit(10)) === 7 && pmod($"doc_id", lit(37)) =!= 7)
        .limit(2).select("t").as[String].collect()
      val sh = (s: String) => s.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val (a, b) = (sh(bp(0)), sh(bp(1)))
      val jac = a.intersect(b).size.toDouble / a.union(b).size
      assert(jac > 0.1 && jac < 0.8, s"boilerplate pair jaccard out of band: $jac")
      // 3. hot dup-gram mass: planted span runs are 10x denser
      val spans = Dedup.duplicateSpans(stripped, $"doc_id", $"t", n = 13)
      assert(spans.count() > n / 50, s"skew span mass off: ${spans.count()}")
    } finally { skewed.unpersist(); () }
  }

  test("eval set leaks: each bench doc shares its 36-token body with its source") {
    val bench = CurationBench.synthBench(spark, n, 50L)
    val stripped = docs.select($"doc_id", TextAnalysis.htmlText($"text").as("t"))
    val flagged = graft.operators.Contamination.ngramOverlapPairs(
      bench, $"bench_id", $"text", stripped, $"doc_id", $"t", 13, 5)
      .select("bench_id").distinct().count()
    // junk sources (id%37==7) have no 36-token body to leak; the rest flag
    assert(flagged > 40, s"only $flagged of 50 bench docs flagged their source")
  }
}
