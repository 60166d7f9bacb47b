package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: documents are concatenated in a
  * deterministic order and sliced into fixed-capacity context windows
  * (GPT-style packing — a document may straddle a window boundary; the
  * loader masks across it). The packing decision per document is pure
  * arithmetic over a running token total:
  *
  *   offset  = Σ tokens of preceding docs (same shard, id order)
  *   bin     = offset div capacity
  *   in-bin  = offset mod capacity
  *
  * Packing is PER SHARD (a language, a source, a hash bucket), and the
  * running sum is [[Prefix.runningSum]]'s two-pass distributed prefix
  * sum — so even a corpus packed into a handful of shards never
  * serializes a shard's order through one task: parallelism comes from
  * range slices, shard count only shapes the output. Deterministic by
  * construction — same (shard, id, token count) rows → same bins, on any
  * partitioning, any engine, any retry — PROVIDED `idCol` is unique per
  * row within its shard (the same precondition [[Sampling.hashSampleK]]
  * and [[Sampling.shuffleShards]] document): duplicate ids tie on the
  * whole packing order and resolve by engine/scan order, so their
  * relative offsets are arbitrary (per Prefix's Ties note).
  */
object Packing {

  /** → input columns + (pack_offset, bin_id, offset_in_bin,
    * spans_boundary). `tokenCount` must be a non-negative integer column
    * expression (e.g. [[TextAnalysis.tokenCount]]); a NULL count is
    * treated as 0 — the doc occupies no span and gets a well-defined
    * offset, instead of poisoning its own bin arithmetic (the window sum
    * skips nulls, so without the coalesce a null-count row would emit
    * null pack_offset/bin_id while its neighbours pack normally).
    *
    * Call-time contract (inherited from [[Prefix.runningSum]]): above the
    * size gate an eager boundary-sampling job runs when this is CALLED,
    * and `shardCol`/`idCol` resolve by name against the materialized
    * frame — see the Prefix scaladoc.
    */
  def sequencePacking(
      df: DataFrame, shardCol: String, idCol: String, tokenCount: Column,
      capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val emitted = Seq("__tok", "__cuminc", "pack_offset", "bin_id", "offset_in_bin", "spans_boundary")
    require(!df.columns.exists(emitted.contains),
      s"sequencePacking adds ${emitted.mkString("/")} columns; the input already has one")
    df.withColumn("__tok", coalesce(tokenCount.cast("long"), lit(0L)))
      .transform(Prefix.runningSum(_, col(shardCol), Seq(col(idCol)), col("__tok"), "__cuminc"))
      // EXCLUSIVE prefix: tokens strictly before this doc in its shard
      .withColumn("pack_offset", col("__cuminc") - col("__tok"))
      .drop("__cuminc")
      .withColumn("bin_id", expr(s"pack_offset div $capacity"))
      .withColumn("offset_in_bin", pmod(col("pack_offset"), lit(capacity)))
      // an empty doc (0 tokens) occupies no span — it never straddles
      .withColumn("spans_boundary",
        col("__tok") > 0 &&
          expr(s"(pack_offset + __tok - 1) div $capacity") > col("bin_id"))
      .drop("__tok")
  }
}
