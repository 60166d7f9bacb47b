package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Executes the README's "Composing the pipeline tier: a curation DAG"
  * example on the real fixture, so the documented composition cannot
  * drift from the actual operator signatures, and pins the invariants a
  * curation pass must hold: stages only shrink the corpus, dedup keeps
  * exactly one doc per duplicate group, the contamination gate removes
  * every flagged doc, and packing assigns every survivor a valid slot.
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("quality gate → dedup → contamination gate → packing holds its invariants") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val total = docs.count()

    // 1. quality gates: cheap per-row signals first
    val scored = docs.withColumn("lang", TextAnalysis.langId($"text"))
    val quality = TextAnalysis.repetitionStats(scored, $"doc_id", $"text", n = 2)
    val kept = scored.join(quality.filter($"top_gram_permille" < 300).select("doc_id"), "doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= total)

    // 2. near-dup dedup: LSH pairs -> components -> keep each group's min id
    val pairs = Dedup.minhashNearDupPairs(kept, $"doc_id", $"text", 3, 8, 4, 800)
    val comp = Components.connectedComponents(
      kept.select($"doc_id".as("id")),
      pairs.select($"a_id".as("src"), $"b_id".as("dst")))
    val uniq = kept.join(comp.filter($"id" === $"component_id"),
      kept("doc_id") === comp("id"), "left_semi")
    val nUniq = uniq.count()
    val nGroups = comp.select("component_id").distinct().count()
    assert(nUniq == nGroups, "exactly one survivor per duplicate group")
    assert(nUniq <= nKept)

    // 3. contamination gate against a held-out "benchmark" (source src0)
    val benchDocs = docs.filter($"source" === "src0").select("doc_id", "text")
    val flagged = Contamination.ngramOverlapPairs(benchDocs, $"doc_id", $"text",
        uniq, $"doc_id", $"text", 3, 2)
      .select($"train_id".as("doc_id")).distinct()
    val clean = uniq.join(flagged, Seq("doc_id"), "left_anti")
    val nClean = clean.count()
    assert(nClean == nUniq - flagged.join(uniq.select("doc_id"), "doc_id").count())

    // 4. pack the survivors into context windows per language shard
    val packed = Packing.sequencePacking(clean, "lang", "doc_id",
      TextAnalysis.tokenCount($"text"), capacity = 4096)
    assert(packed.count() == nClean)
    val bad = packed.filter($"offset_in_bin" < 0 || $"offset_in_bin" >= 4096 ||
      $"bin_id" < 0 || $"pack_offset" < 0).count()
    assert(bad == 0, "every survivor has a valid window slot")
  }
}
