package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2) to a
  * DataFrame program over the driver testdata dir; `oracleSql` holds the
  * DuckDB-equivalent SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q03_join5")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ PipelineQueries.oracleSql

  /** Queries that keep NO oracle ON PURPOSE — reason + declared output
    * schema, so the correctness artifact can distinguish
    * "rows-only by design" (schema still checkable) from "broken".
    * [[Verify]] dumps this as `no_oracle_by_design.json`. */
  def rowsOnlyByDesign: Map[String, (String, Seq[(String, String)])] =
    PipelineQueries.rowsOnlyByDesign
}
