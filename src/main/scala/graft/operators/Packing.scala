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
  * Packing is PER SHARD (a language, a source, a hash bucket): the running
  * sum is a window partitioned by the shard key, so shards pack in
  * parallel and adding shards scales out. A single global concatenation
  * order would serialize the prefix sum through one partition — at 100 TB
  * that is the difference between a window aggregate and a bottleneck.
  * Deterministic by construction: same (shard, id, token count) rows →
  * same bins, on any partitioning, any engine, any retry.
  */
object Packing {

  /** → input columns + (pack_offset, bin_id, offset_in_bin,
    * spans_boundary). `tokenCount` must be a non-negative integer column
    * expression (e.g. [[TextAnalysis.tokenCount]]).
    */
  def sequencePacking(
      df: DataFrame, shardCol: String, idCol: String, tokenCount: Column,
      capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__tok", tokenCount.cast("long"))
      .withColumn("pack_offset", coalesce(sum(col("__tok")).over(w), lit(0L)))
      .withColumn("bin_id", expr(s"pack_offset div $capacity"))
      .withColumn("offset_in_bin", pmod(col("pack_offset"), lit(capacity)))
      // an empty doc (0 tokens) occupies no span — it never straddles
      .withColumn("spans_boundary",
        col("__tok") > 0 &&
          expr(s"(pack_offset + __tok - 1) div $capacity") > col("bin_id"))
      .drop("__tok")
  }
}
