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
    require(psPermille.distinct.size == psPermille.size,
      s"duplicate quantiles would emit duplicate output columns, got $psPermille")
    // the sibling-module collision guards: the helper columns would
    // silently REPLACE same-named input columns (withColumn semantics)
    // before the quantile reads them, and an output name colliding with a
    // group column would be ambiguous downstream
    require(!df.columns.contains("__rn") && !df.columns.contains("__n"),
      "groupedQuantiles uses __rn/__n helper columns; the input already has one")
    val outNames = s"n_$valueCol" +: psPermille.map(p => s"p${p}_$valueCol")
    require(!outNames.exists(groupCols.contains),
      s"a group column collides with an output column name (${outNames.mkString(", ")})")
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

  /** CCNet-style per-group quantile bucketing: label every row with the
    * number of per-group cut values its `valueCol` strictly EXCEEDS —
    * cuts (333, 667) give the head/middle/tail split CCNet uses for
    * per-language perplexity curricula (head = bucket 0). Cut values are
    * the nearest-rank members from [[groupedQuantiles]], so a value equal
    * to a cut lands in the LOWER bucket and the semantics replay
    * bit-for-bit on any engine — no interpolated floats.
    *
    * Scale shape: the threshold table is one row per group — broadcast
    * back onto the corpus, so beyond the quantile computation itself the
    * labeling pass is map-side only. (At 100 TB swap the exact quantiles
    * for `approx_percentile` and keep this join unchanged.)
    *
    * → group cols + (tieCol, valueCol, bucket). */
  def quantileBuckets(
      df: DataFrame, groupCols: Seq[String], valueCol: String, tieCol: String,
      cutsPermille: Seq[Int]): DataFrame = {
    val grp = groupCols.map(col)
    // collision guards in the sibling-module style: a pre-existing
    // p<NN>_<valueCol> column would be ambiguous after the threshold
    // join, and __t_/bucket would silently collide
    require(!cutsPermille.exists(p => df.columns.contains(s"p${p}_$valueCol")),
      s"the input already carries a p<NN>_$valueCol column the threshold join would shadow")
    require(!df.columns.exists(_.startsWith("__t_")) && !df.columns.contains("bucket"),
      "quantileBuckets uses __t_* helper columns and emits `bucket`; the input already has one")
    val thresholds = broadcast(
      groupedQuantiles(df, groupCols, valueCol, tieCol, cutsPermille)
        .select((groupCols.map(g => col(g).as(s"__t_$g")) ++
          cutsPermille.map(p => col(s"p${p}_$valueCol"))): _*))
    // null value rows land in the TOP bucket — [[groupedQuantiles]] ranks
    // nulls last (largest), and the bucket label must agree or a
    // null-score doc counted in the tail for the cuts would be labeled
    // head
    val bucket = when(col(valueCol).isNull, lit(cutsPermille.size.toLong))
      .otherwise(cutsPermille
        .map(p => when(col(valueCol) > col(s"p${p}_$valueCol"), lit(1L)).otherwise(lit(0L)))
        .reduce(_ + _))
    // null-safe group match: groupBy above emits a threshold row for a
    // NULL group, and a plain equi-join would silently drop its rows
    val cond = groupCols.map(g => col(g) <=> col(s"__t_$g")).reduce(_ && _)
    df.join(thresholds, cond)
      .select((grp :+ col(tieCol) :+ col(valueCol) :+ bucket.as("bucket")): _*)
  }
}
