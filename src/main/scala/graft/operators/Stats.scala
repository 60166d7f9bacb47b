package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-profiling statistics for a training-data pipeline: exact grouped
  * quantiles with pinned nearest-rank semantics.
  *
  * The quantile definition is spelled out (rank = max(1, ⌈p·n⌉) over the
  * group sorted by (value, tieCol)) instead of delegating to an engine's
  * `percentile_disc`/`quantile_disc`, because the ANSI and DuckDB
  * discrete-quantile definitions disagree at some (p, n) combinations —
  * the explicit rank is replayable bit-for-bit on any engine and returns
  * an actual member of the set, never an interpolated float.
  *
  * Scale shape: one shuffle on the group key + a per-partition sort (the
  * window), then an ordinary hash aggregate. For 100 TB profiling where an
  * exact per-group sort is too much, `approx_percentile` (t-digest sketch,
  * map-side combinable) is the drop-in approximate path; this operator is
  * the exact form and the oracle for that sketch's error.
  */
object Stats {

  /** One row per group: group columns, `n_<valueCol>` count, and a
    * `p<NN>_<valueCol>` column per requested per-mille quantile
    * (nearest-rank, value at position max(1, ⌈p·n⌉) in sort order).
    */
  def groupedQuantiles(
      df: DataFrame, groupCols: Seq[String], valueCol: String, tieCol: String,
      psPermille: Seq[Int]): DataFrame = {
    require(psPermille.nonEmpty && psPermille.forall(p => p > 0 && p <= 1000),
      s"quantiles must be in (0, 1000] permille, got $psPermille")
    val grp = groupCols.map(col)
    // nulls pinned LAST explicitly: Spark's ASC default is NULLS FIRST but
    // DuckDB/Postgres default NULLS LAST — without the pin a nullable
    // value column gives engine-divergent ranks and lets null win the low
    // quantiles. With it, nulls can only surface at p near 1000.
    val w = Window.partitionBy(grp: _*)
      .orderBy(col(valueCol).asc_nulls_last, col(tieCol).asc_nulls_last)
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(grp: _*)))
    val qCols = psPermille.map { p =>
      val rank = greatest(lit(1L), ceil(col("__n") * lit(p) / lit(1000.0)))
      min(when(col("__rn") === rank, col(valueCol))).as(s"p${p}_$valueCol")
    }
    ranked.groupBy(grp: _*)
      .agg(max(col("__n")).as(s"n_$valueCol"), qCols: _*)
  }
}
