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
