package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Executes the README's "Composing the pipeline tier: a curation DAG"
  * example on the real fixture, so the documented composition cannot
  * drift from the actual operator signatures, and pins the invariants a
  * curation pass must hold: redaction is identity on a PII-free corpus,
  * stages only shrink the corpus, dedup keeps exactly one doc per
  * duplicate group, the contamination gate removes every flagged doc,
  * packing assigns every survivor a valid slot, and the final hash split
  * covers every survivor deterministically.
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("pii scrub → quality gate → dedup → contamination gate → packing → split holds its invariants") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val total = docs.count()

    // 0. PII redaction + language tag (map-side projection, NO join/
    // shuffle; corpus carries no PII, so redaction must be the identity —
    // pinned below)
    val redacted = docs.withColumn("text", Pii.scrub($"text"))
      .withColumn("lang", TextAnalysis.langId($"text"))
    assert(redacted.count() == total)
    assert(redacted.join(docs.select($"doc_id", $"text".as("orig")), "doc_id")
      .filter($"text" =!= $"orig").count() == 0, "no PII in fixture -> identity")

    // 1. composite quality gate: named per-rule flags, keep = conjunction
    val kept = redacted.join(
      TextAnalysis.qualityGate(redacted, $"doc_id", $"text",
        minTokens = 20L, minStopwordPermille = 10L, maxTopGramPermille = 300L)
        .filter($"keep").select("doc_id"), "doc_id")
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

    // 5. deterministic split LAST: total cover, and re-running the whole
    // DAG cannot move a doc between train and val (hash of doc_id alone)
    val split = Sampling.hashSplit(packed, $"doc_id", Seq("train" -> 950, "val" -> 50))
    assert(split.filter($"split".isNull).count() == 0)
    assert(split.count() == nClean)
    val again = Sampling.hashSplit(packed, $"doc_id", Seq("train" -> 950, "val" -> 50))
    assert(split.select("doc_id", "split").except(again.select("doc_id", "split")).count() == 0)
  }
}
