package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Hash-based Bernoulli sampling: a row is kept iff
  * `rolling_hash(stratum ':' key) mod 1000 < rate(stratum)`. Compared to
  * `df.sample()` this is (a) reproducible across runs, engines and
  * partitionings — no RNG state, the decision is a pure function of the
  * row; (b) pure map-side — no shuffle, composes into scans; (c) stable
  * under re-partitioning and retries, which matters when a 100 TB sampling
  * job resumes mid-way. The engine-neutral hash lets the DuckDB oracle
  * replay the exact sample.
  */
object Sampling {

  /** Per-mille keep-bucket of a (stratum, key) pair — pinned hash
    * arithmetic, shared by the oracle generator. */
  def sampleBucket(stratum: Column, key: Column): Column =
    pmod(Dedup.rollingHash(concat(stratum, lit(":"), key.cast("string"))), lit(1000L))

  /** Deterministic train/val/test assignment: the row's hash bucket falls
    * into one of the cumulative per-mille ranges of `splitsPermille`
    * (which must sum to 1000). Same guarantees as
    * [[stratifiedHashSample]] — pure map-side, engine-replayable, stable
    * under repartitioning and retries — which is exactly what a training
    * pipeline needs: a document NEVER migrates between train and eval
    * across runs, engines, or cluster layouts (`randomSplit` guarantees
    * none of that). `salt` versions the split: bump it to redraw.
    * Null keys hash as the empty string, so they too get a deterministic
    * total assignment (all landing in one split) rather than a silent
    * `split = null` that downstream train/val filters would drop. */
  def hashSplit(
      df: DataFrame,
      key: Column,
      splitsPermille: Seq[(String, Int)],
      salt: String = "v1"): DataFrame = {
    require(splitsPermille.map(_._2).sum == 1000,
      s"split per-milles must sum to 1000, got ${splitsPermille.map(_._2).sum}")
    val bucket = sampleBucket(lit(salt), coalesce(key.cast("string"), lit("")))
    val (assign, _) = splitsPermille.foldLeft((lit(null).cast("string"): Column, 0)) {
      case ((acc, cum), (name, p)) =>
        (when(bucket >= cum && bucket < cum + p, name).otherwise(acc), cum + p)
    }
    df.withColumn("split", assign)
  }

  /** Keep each row with per-stratum probability `ratesPermille(stratum)`
    * (fallback `defaultPermille`), decided by the deterministic hash
    * bucket. `key` must be unique per row for an unbiased sample. */
  def stratifiedHashSample(
      df: DataFrame,
      stratum: Column,
      key: Column,
      ratesPermille: Map[String, Int],
      defaultPermille: Int): DataFrame = {
    val rate = ratesPermille.foldLeft(lit(defaultPermille): Column) {
      case (acc, (s, r)) => when(stratum === s, lit(r)).otherwise(acc)
    }
    df.filter(sampleBucket(stratum, key) < rate)
  }
}
