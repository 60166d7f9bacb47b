package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver testdata layout (`TESTDATA.md`):
  * one parquet file per table under `\$dir/<name>.parquet`.
  *
  * The reference reads its inputs as Postgres tables
  * (`/root/reference/src/main.py:130-141`, `sql/3:4`); here the same role is
  * played by columnar parquet scans so Catalyst gets predicate pushdown and
  * column pruning for free. At cluster scale the same accessors work on a
  * directory of many files; nothing here assumes a single file.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
