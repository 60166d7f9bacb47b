package graft.musicbrainz

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The MusicBrainz-shaped source tables the reference reads (FIXTURES.md §2.1;
  * column inventory from `/root/reference/src/main.py:130-141`, `sql/1`,
  * `sql/3`, `sql/4`, `sql/5`). Each is a plain DataFrame with the minimal
  * column set the queries touch — at production scale these are parquet
  * snapshots (or JDBC reads) of the live Postgres tables.
  *
  * Passing them as one bundle keeps every operator a pure
  * DataFrame→DataFrame function — no session-global table registry.
  */
final case class MbSources(
    artist: DataFrame,             // id, gid, name, area
    area: DataFrame,               // id
    iso31661: DataFrame,           // area, code
    lAreaArea: DataFrame,          // link, entity0 (parent), entity1 (child)
    lArtistUrl: DataFrame,         // entity0 (artist)
    artistAlias: DataFrame,        // artist, name
    artistCredit: DataFrame,       // id
    artistCreditName: DataFrame,   // artist_credit, artist, position, name
    lArtistArtist: DataFrame,      // link, entity0, entity1
    link: DataFrame,               // id, link_type
    linkAttribute: DataFrame,      // link, attribute_type
    releaseGroup: DataFrame,       // id, gid, name, type, artist_credit
    releaseGroupSecondaryTypeJoin: DataFrame, // release_group, secondary_type
    lReleaseGroupReleaseGroup: DataFrame,     // link, entity0 (single), entity1 (album)
    release: DataFrame,            // id, release_group, status
    releaseCountry: DataFrame,     // release, date_year (nullable)
    medium: DataFrame,             // id, release
    track: DataFrame,              // medium, recording
    recording: DataFrame,          // id, gid, name, artist_credit
    recordingAlias: DataFrame,     // recording, name
    lRecordingWork: DataFrame,     // entity0 (recording), entity1 (work), link_order
    work: DataFrame,               // id, gid, name
    workAlias: DataFrame,          // work, name
    language: DataFrame,           // id, iso_code_1 (nullable), iso_code_3
    workLanguage: DataFrame        // work, language
)

/** Constructors for [[MbSources]] over a live JDBC database — SURVEY S1
  * "live parity". The reference reads the MusicBrainz Postgres mirror
  * directly (`/root/reference/src/main.py:335-340`, `sql/3:4`); this is the
  * equivalent entry point: one `spark.read.format("jdbc")` per source table,
  * range-partitioned on the numeric primary key so a 1000-executor cluster
  * scans the ~100 GB mirror in parallel instead of through one connection.
  *
  * Each table is projected to the minimal column set the pipeline touches
  * immediately after load — Spark's JDBC source prunes columns and pushes
  * simple predicates server-side, so the generated SQL reads only those
  * columns.
  */
object MbSources {

  /** Read every MusicBrainz source table over JDBC.
    *
    * @param url     JDBC url (e.g. `jdbc:postgresql://host/musicbrainz`)
    * @param options extra JDBC options (user, password, driver,
    *                fetchsize, ...), passed through to every read
    * @param table   logical table name → SQL-addressable name; defaults to
    *                the `musicbrainz` schema. Override to re-point at
    *                another schema or to quote identifiers for a dialect
    *                that folds case (the Derby spec does this).
    * @param numPartitions per-table read parallelism. With `> 1` each scan
    *                is split on the table's id PK; the min/max bounds are
    *                fetched first with one tiny aggregate query per table
    *                (the standard Spark JDBC recipe — bounds must be
    *                supplied, they are not discovered).
    */
  def fromJdbc(
      spark: SparkSession,
      url: String,
      options: Map[String, String] = Map.empty,
      table: String => String = name => s"musicbrainz.$name",
      numPartitions: Int = 1): MbSources = {

    def reader = spark.read.format("jdbc").option("url", url).options(options)

    /** One table: partitioned scan when asked for, pruned to `cols`.
      * With `numPartitions > 1` each call runs a blocking one-row bounds
      * probe against the live mirror, so the 24 table reads below are
      * dispatched CONCURRENTLY (Futures on the global pool) — serially
      * they cost tens of seconds of pure startup latency on a loaded
      * ~100 GB Postgres. (MbSources is deliberately an eager bundle: a
      * job touching one subtree still probes all tables once — the cost
      * is this one constructor, paid in parallel.) */
    def read(name: String, pk: String, cols: String*): DataFrame = {
      val base =
        if (numPartitions <= 1) reader.option("dbtable", table(name)).load()
        else {
          // Bounds probe: a one-row server-side aggregate. The pk is quoted
          // with the url's registered JdbcDialect (double quotes on
          // Postgres/Derby, backticks on MySQL-family mirrors) — same
          // quoting the rest of the reader delegates to Spark.
          val q = org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier(pk)
          val b = reader
            .option("dbtable",
              s"(SELECT MIN($q) AS lo, MAX($q) AS hi FROM ${table(name)}) bounds")
            .load().collect().head
          if (b.isNullAt(0)) reader.option("dbtable", table(name)).load()
          else reader.option("dbtable", table(name))
            .option("partitionColumn", pk)
            .option("lowerBound", b.get(0).toString)
            .option("upperBound", b.get(1).toString)
            .option("numPartitions", numPartitions.toString)
            .load()
        }
      base.select(cols.map(col): _*)
    }

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    def readF(name: String, pk: String, cols: String*): Future[DataFrame] =
      Future(read(name, pk, cols: _*))
    def read2(f: Future[DataFrame]): DataFrame = Await.result(f, Duration.Inf)

    val fs = Map(
      "artist" -> readF("artist", "id", "id", "gid", "name", "area"),
      "area" -> readF("area", "id", "id"),
      "iso_3166_1" -> readF("iso_3166_1", "area", "area", "code"),
      "l_area_area" -> readF("l_area_area", "entity1", "link", "entity0", "entity1"),
      "l_artist_url" -> readF("l_artist_url", "entity0", "entity0"),
      "artist_alias" -> readF("artist_alias", "artist", "artist", "name"),
      "artist_credit" -> readF("artist_credit", "id", "id"),
      "artist_credit_name" -> readF("artist_credit_name", "artist_credit",
        "artist_credit", "artist", "position", "name"),
      "l_artist_artist" -> readF("l_artist_artist", "entity0", "link", "entity0", "entity1"),
      "link" -> readF("link", "id", "id", "link_type"),
      "link_attribute" -> readF("link_attribute", "link", "link", "attribute_type"),
      "release_group" -> readF("release_group", "id", "id", "gid", "name", "type", "artist_credit"),
      "release_group_secondary_type_join" -> readF("release_group_secondary_type_join",
        "release_group", "release_group", "secondary_type"),
      "l_release_group_release_group" -> readF("l_release_group_release_group",
        "entity0", "link", "entity0", "entity1"),
      "release" -> readF("release", "id", "id", "release_group", "status"),
      "release_country" -> readF("release_country", "release", "release", "date_year"),
      "medium" -> readF("medium", "id", "id", "release"),
      "track" -> readF("track", "medium", "medium", "recording"),
      "recording" -> readF("recording", "id", "id", "gid", "name", "artist_credit"),
      "recording_alias" -> readF("recording_alias", "recording", "recording", "name"),
      "l_recording_work" -> readF("l_recording_work", "entity0", "entity0", "entity1", "link_order"),
      "work" -> readF("work", "id", "id", "gid", "name"),
      "work_alias" -> readF("work_alias", "work", "work", "name"),
      "language" -> readF("language", "id", "id", "iso_code_1", "iso_code_3"),
      "work_language" -> readF("work_language", "work", "work", "language"))

    MbSources(
      artist = read2(fs("artist")),
      area = read2(fs("area")),
      iso31661 = read2(fs("iso_3166_1")),
      lAreaArea = read2(fs("l_area_area")),
      lArtistUrl = read2(fs("l_artist_url")),
      artistAlias = read2(fs("artist_alias")),
      artistCredit = read2(fs("artist_credit")),
      artistCreditName = read2(fs("artist_credit_name")),
      lArtistArtist = read2(fs("l_artist_artist")),
      link = read2(fs("link")),
      linkAttribute = read2(fs("link_attribute")),
      releaseGroup = read2(fs("release_group")),
      releaseGroupSecondaryTypeJoin = read2(fs("release_group_secondary_type_join")),
      lReleaseGroupReleaseGroup = read2(fs("l_release_group_release_group")),
      release = read2(fs("release")),
      releaseCountry = read2(fs("release_country")),
      medium = read2(fs("medium")),
      track = read2(fs("track")),
      recording = read2(fs("recording")),
      recordingAlias = read2(fs("recording_alias")),
      lRecordingWork = read2(fs("l_recording_work")),
      work = read2(fs("work")),
      workAlias = read2(fs("work_alias")),
      language = read2(fs("language")),
      workLanguage = read2(fs("work_language")))
  }
}

/** Domain constants that are semantics, not configuration
  * (SURVEY §1.4 "Domain constants baked into queries").
  */
object MbConstants {
  /** `l_area_area.link` id of the area "part of" relation (`sql/1:14,16,18`). */
  val AreaPartOfLink = 118734
  /** `link.link_type` of the "single from" release-group relation (`src/main.py:87`). */
  val SingleFromLinkType = 11
  /** `link.link_type` + `link_attribute.attribute_type` of the alias-producing
    * artist-artist relation (`sql/4:25,27`). */
  val ArtistRenameLinkType = 103
  val ArtistRenameAttributeType = 1094
  /** `release.status` = official (`src/main.py:142,190`). */
  val ReleaseStatusOfficial = 1
  /** `release_group.type`: 1 = Album, 2 = Single (`src/main.py:31,249`). */
  val TypeAlbum = 1
  val TypeSingle = 2
  /** secondary types: 1 = Compilation, 2 = Soundtrack (`src/main.py:34,37,190`). */
  val SecondaryCompilation = 1
  val SecondarySoundtrack = 2
}
