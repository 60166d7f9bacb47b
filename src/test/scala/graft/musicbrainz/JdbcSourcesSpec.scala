package graft.musicbrainz

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types.{DataType, StringType}

import graft.SparkSpec

/** Spark's built-in Derby dialect maps StringType to CLOB, which Derby cannot
  * compare in pushed-down predicates (and whose setNull type code then
  * mismatches a VARCHAR column). Registered ahead of it for the spec so
  * string columns round-trip as VARCHAR, like a real Postgres deployment's
  * `varchar` DDL (`/root/reference/sql/2_export_tables.sql`).
  */
object DerbyVarcharDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType => Some(JdbcType("VARCHAR(255)", java.sql.Types.VARCHAR))
    case _          => None // common JDBC mappings cover INTEGER etc.
  }
}

/** SURVEY S1 "live parity": the engine reading its sources from a real JDBC
  * database instead of parquet snapshots (reference reads live Postgres,
  * `/root/reference/src/main.py:335-340`).
  *
  * The fixture corpus is loaded into an embedded in-memory Derby database
  * (the Derby jars ship with Spark), then `MbSources.fromJdbc` re-reads it —
  * partitioned on the id PKs, exercising the bounds probe — and the full
  * GenerateDataset DAG must produce byte-identical export tables to the
  * in-memory fixture run.
  *
  * Derby folds unquoted identifiers to uppercase and reserves words like
  * RELEASE, so the spec addresses tables through the quoting `table` mapper —
  * the same hook a user needs for a non-default Postgres schema.
  */
class JdbcSourcesSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:mbjdbc;create=true"
  private val jdbcOptions = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def load(name: String, df: DataFrame): Unit =
    df.write.format("jdbc")
      .option("url", url).options(jdbcOptions)
      .option("dbtable", "\"" + name + "\"")
      .mode("overwrite").save()

  private lazy val jdbcSources: MbSources = {
    JdbcDialects.registerDialect(DerbyVarcharDialect)
    val src = MbFixture.sources(spark)
    // Real MusicBrainz column names where the fixture abbreviates.
    val tables = Seq(
      "artist" -> src.artist,
      "area" -> src.area,
      "iso_3166_1" -> src.iso31661,
      "l_area_area" -> src.lAreaArea,
      "l_artist_url" -> src.lArtistUrl.withColumnRenamed("url", "entity1"),
      "artist_alias" -> src.artistAlias,
      "artist_credit" -> src.artistCredit,
      "artist_credit_name" -> src.artistCreditName,
      "l_artist_artist" -> src.lArtistArtist,
      "link" -> src.link,
      "link_attribute" -> src.linkAttribute,
      "release_group" -> src.releaseGroup,
      "release_group_secondary_type_join" -> src.releaseGroupSecondaryTypeJoin,
      "l_release_group_release_group" -> src.lReleaseGroupReleaseGroup,
      "release" -> src.release,
      "release_country" -> src.releaseCountry,
      "medium" -> src.medium,
      "track" -> src.track,
      "recording" -> src.recording,
      "recording_alias" -> src.recordingAlias,
      "l_recording_work" -> src.lRecordingWork,
      "work" -> src.work,
      "work_alias" -> src.workAlias,
      "language" -> src.language,
      "work_language" -> src.workLanguage)
    tables.foreach { case (n, df) => load(n, df) }
    MbSources.fromJdbc(spark, url, jdbcOptions,
      table = name => "\"" + name + "\"", numPartitions = 3)
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("partitioned JDBC scan: bounds probe splits the artist table") {
    assert(jdbcSources.artist.rdd.getNumPartitions == 3)
    assert(jdbcSources.artist.count() == 6)
  }

  test("writeJdbc ships the export to a serving DB; readJdbc reads it back identical") {
    JdbcDialects.registerDialect(DerbyVarcharDialect)
    val serveUrl = "jdbc:derby:memory:mbserve;create=true"
    val quoted: String => String = name => "\"" + name + "\""
    val expected = MbFixtureExport.cached(spark)
    GenerateDataset.writeJdbc(
      expected, serveUrl, jdbcOptions, table = quoted, writePartitions = 2)
    val back = GenerateDataset.readJdbc(spark, serveUrl, jdbcOptions, table = quoted)
    assert(rows(back.mbArtist) == rows(expected.mbArtist))
    assert(rows(back.mbArtistAlias) == rows(expected.mbArtistAlias))
    assert(rows(back.mbAlbum) == rows(expected.mbAlbum))
    assert(rows(back.mbSong) == rows(expected.mbSong))
    assert(rows(back.mbSongAlias) == rows(expected.mbSongAlias))
  }

  test("full GenerateDataset over JDBC sources matches the in-memory fixture run") {
    val viaJdbc = GenerateDataset(jdbcSources)
    val expected = MbFixtureExport.cached(spark)
    try {
      assert(rows(viaJdbc.mbArtist) == rows(expected.mbArtist))
      assert(rows(viaJdbc.mbArtistAlias) == rows(expected.mbArtistAlias))
      assert(rows(viaJdbc.mbAlbum) == rows(expected.mbAlbum))
      assert(rows(viaJdbc.mbSong) == rows(expected.mbSong))
      assert(rows(viaJdbc.mbSongAlias) == rows(expected.mbSongAlias))
    } finally viaJdbc.unpersist()
  }
}
