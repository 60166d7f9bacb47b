package graft.musicbrainz

import org.apache.spark.sql.DataFrame

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
