package graft.musicbrainz

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader for the reference's golden benchmark CSV format
  * (`/root/reference/benchmark/default.csv`, consumed at
  * `src/benchmark.py:236-242`): UTF-8 with BOM, header row, quoted fields;
  * columns id, title, album_id, album_title, release_year, musicbrainz_id,
  * artist_id, artist_name, artist_country_id, artist_musicbrainz_id,
  * artist2_id, artist2_name, artist2_country_id, artist2_musicbrainz_id.
  *
  * Spark's CSV source strips the BOM from the first header cell natively
  * (SURVEY S2) — no preprocessing step.
  */
object GoldenCsv {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)

  /** → the matcher's query shape (query_id, artist_name, artist2_name,
    * title). Empty-string artist2 (unquoted empty CSV field) is null. */
  def toQueries(golden: DataFrame): DataFrame =
    golden.select(
      col("id").cast("long").as("query_id"),
      col("artist_name"),
      when(col("artist2_name") === "", lit(null)).otherwise(col("artist2_name"))
        .as("artist2_name"),
      col("title"))

  /** → the expectation shape for [[MatchOps.accuracy]]. */
  def toExpectations(golden: DataFrame): DataFrame =
    golden.select(col("id").cast("long").as("query_id"), col("musicbrainz_id"))

  /** → the diff-report shape for [[MatchOps.diffReport]]: query identity
    * plus the DB-side expected album (the `db_*` fields of the reference's
    * MatchResult, `src/benchmark.py:145-156`). */
  def toDbExpectations(golden: DataFrame): DataFrame =
    golden.select(
      col("id").cast("long").as("query_id"),
      col("artist_name"), col("title"),
      col("musicbrainz_id").as("db_album_mb_id"),
      col("album_title").as("db_album_title"),
      col("release_year").cast("int").as("db_album_year"))
}
