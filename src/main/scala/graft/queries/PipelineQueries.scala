package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SimilarityJoin
import graft.sources.Tables

/** Training-data-pipeline operators (builder prompt: dedup / similarity /
  * text analysis / multimodal) + the reference's similarity join (SURVEY
  * J14), each instantiated over the driver testdata with a DuckDB oracle
  * where SQL-expressible.
  */
object PipelineQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J14: deletion-neighborhood blocked levenshtein<=1 self-join — the
    // equi-join rewrite of the reference's fuzzy alias lookup
    // (src/benchmark.py:69-79). Oracle is the naive cross-join form; the
    // property test in SimilarityJoinSpec proves equivalence in general.
    "q17_simjoin_lev1" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val a = c.select(col("c_custkey").as("a_key"), col("c_name").as("a_name"))
      val b = c.select(col("c_custkey").as("b_key"), col("c_name").as("b_name"))
      SimilarityJoin.levenshtein1Join(a, "a_name", b, "b_name")
        .filter(col("a_key") < col("b_key"))
        .select(col("a_key"), col("b_key"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q17_simjoin_lev1" ->
      """SELECT a.c_custkey AS a_key, b.c_custkey AS b_key
        |FROM customer a, customer b
        |WHERE a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 1""".stripMargin)
}
