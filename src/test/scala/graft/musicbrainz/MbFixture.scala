package graft.musicbrainz

import org.apache.spark.sql.SparkSession

/** Hand-curated MusicBrainz-shaped mini-corpus (FIXTURES.md §2.2-2.3).
  * Every scenario from the reference's README / semantics is represented;
  * expected outputs are hand-computed in the specs.
  *
  * Entity id ranges: areas 1-9, artists 1-9, credits 10-99, recordings
  * 100-199, release groups 200-299, releases 300-399, mediums 400-499,
  * links 500-599, works 600-699, languages 700-799.
  */
object MbFixture {

  def sources(spark: SparkSession): MbSources = {
    import spark.implicits._

    val area = Seq(1, 2, 3, 4, 5).toDF("id")
    val iso31661 = Seq((1, "BE"), (3, "US")).toDF("area", "code")
    // child "part of" parent: Ghent(2)→BE(1), Seattle(4)→US(3); one noise
    // edge with a different link id that must be ignored
    val lAreaArea = Seq(
      (118734, 1, 2), (118734, 3, 4), (99, 5, 4)).toDF("link", "entity0", "entity1")

    // artists: 1 Nirvana (Seattle, 10 urls), 2 Motörhead (BE, 2 urls),
    // 3 Alpha (US, 9 urls), 4 Beta (US, 12 urls), 5 Obscure (US, 3 urls —
    // NOT exported), 7 Old Name (rename-source of 1, 0 urls — NOT exported)
    val artist = Seq(
      (1, "a-1", "Nirvana", Some(4)),
      (2, "a-2", "Motörhead", Some(1)),
      (3, "a-3", "Alpha", Some(3)),
      (4, "a-4", "Beta", Some(3)),
      (5, "a-5", "Obscure", Some(3)),
      (7, "a-7", "Old Name", None)
    ).toDF("id", "gid", "name", "area")
    val lArtistUrl = ((1 to 10).map(i => (1, i)) ++ (1 to 2).map(i => (2, i)) ++
      (1 to 9).map(i => (3, i)) ++ (1 to 12).map(i => (4, i)) ++
      (1 to 3).map(i => (5, i))).toDF("entity0", "url")

    val artistAlias = Seq((1, "Nirvana US")).toDF("artist", "name")
    // rename relation: artist 7 is the earlier name of artist 1
    // (link 500: link_type 103 + attribute 1094)
    val lArtistArtist = Seq((500, 7, 1)).toDF("link", "entity0", "entity1")
    val link = Seq((500, 103), (501, 11), (502, 11)).toDF("id", "link_type")
    val linkAttribute = Seq((500, 1094)).toDF("link", "attribute_type")

    // credits: 10 Nirvana, 11 Motörhead, 30 Alpha&Beta, 40 Beta, 99 "VA"
    val artistCredit = Seq(10, 11, 30, 40, 99).toDF("id")
    val artistCreditName = Seq(
      (10, 1, 0, "Nirvana"),
      (11, 2, 0, "Motörhead"),
      (30, 3, 0, "Alpha"), (30, 4, 1, "Beta"),
      (40, 4, 0, "Beta"),
      (99, 5, 0, "Various Artists")
    ).toDF("artist_credit", "artist", "position", "name")

    // recordings (scenarios 1-7 per FIXTURES §2.3 + Motörhead)
    val recording = Seq(
      (100, "r-100", "Come as You Are", 10), // S1: single ±same year vs album
      (101, "r-101", "Oldie", 10),           // S2: single >1y earlier
      (102, "r-102", "Hitsong", 10),         // S3: explicit single-from
      (103, "r-103", "Deep Cut", 10),        // S4: compilation genuinely first
      (104, "r-104", "Movie Song", 10),      // S5: VA soundtrack (branch 2 only)
      (105, "r-105", "Unreleased", 10),      // S6: only null-year release → dropped
      (106, "r-106", "Duet Song", 30),       // S7: duo album, second artist
      (107, "r-107", "Beta Song", 40),       // S7: same album via Beta
      (108, "r-108", "Ace of Spades", 11)    // Motörhead
    ).toDF("id", "gid", "name", "artist_credit")

    val releaseGroup = Seq(
      (200, "g-200", "Come as You Are", 2, 10),  // single
      (201, "g-201", "Nevermind", 1, 10),        // main album
      (202, "g-202", "Oldie", 2, 10),            // single 1990
      (203, "g-203", "Latecomer", 1, 10),        // album 1992
      (204, "g-204", "Hitsong", 2, 10),          // single 1991
      (205, "g-205", "Hits Collection", 1, 10),  // compilation, single-from target
      (206, "g-206", "Early Comp", 1, 10),       // compilation 1989
      (207, "g-207", "Standard Album", 1, 10),   // main album 1991
      (208, "g-208", "Movie OST", 1, 99),        // VA soundtrack
      (209, "g-209", "Shelved", 1, 10),          // null-year release only
      (210, "g-210", "Shared Album", 1, 30),     // duo album 1995
      (211, "g-211", "Ace of Spades", 2, 11),    // single 1980
      (212, "g-212", "Ace of Spades", 1, 11)     // album 1980
    ).toDF("id", "gid", "name", "type", "artist_credit")

    val releaseGroupSecondaryTypeJoin = Seq(
      (205, 1), (206, 1), (208, 2)).toDF("release_group", "secondary_type")

    // "single from": single 204 is taken from album 205 (link 501, type 11);
    // link 502 also type 11 but unused noise is fine to include
    val lReleaseGroupReleaseGroup = Seq((501, 204, 205)).toDF("link", "entity0", "entity1")

    // releases: id, release_group, status (1 = official)
    val release = Seq(
      (300, 200, 1), (301, 201, 1), (302, 202, 1), (303, 203, 1),
      (304, 204, 1), (305, 205, 1), (306, 206, 1), (307, 207, 1),
      (308, 208, 1), (309, 209, 1), (310, 210, 1),
      (311, 201, 2), // UNOFFICIAL early Nevermind pressing: affects
                     // release_group_year (1989) but not candidate years
      (312, 211, 1), (313, 212, 1)
    ).toDF("id", "release_group", "status")

    val releaseCountry = Seq(
      (300, Some(1991)), (301, Some(1991)), (302, Some(1990)), (303, Some(1992)),
      (304, Some(1991)), (305, Some(1992)), (306, Some(1989)), (307, Some(1991)),
      (308, Some(1994)), (309, None), (310, Some(1995)), (311, Some(1989)),
      (312, Some(1980)), (313, Some(1980))
    ).toDF("release", "date_year")

    val medium = Seq(
      (400, 300), (401, 301), (402, 302), (403, 303), (404, 304), (405, 305),
      (406, 306), (407, 307), (408, 308), (409, 309), (410, 310),
      (412, 312), (413, 313)
    ).toDF("id", "release")

    val track = Seq(
      (400, 100), (401, 100),
      (402, 101), (403, 101),
      (404, 102), (405, 102),
      (406, 103), (407, 103),
      (408, 104),
      (409, 105),
      (410, 106), (410, 107),
      (412, 108), (413, 108)
    ).toDF("medium", "recording")

    val recordingAlias = Seq((100, "Come As You Are!")).toDF("recording", "name")
    // works: 600 linked to rec 100 (order 0) with language en; 601 to rec
    // 103 with zxx; 602 linked to rec 100 with link_order 2 → ignored
    val lRecordingWork = Seq(
      (100, 600, 0), (103, 601, 0), (100, 602, 2)).toDF("entity0", "entity1", "link_order")
    val work = Seq(
      (600, "w-600", "Come as You Are (work)"),
      (601, "w-601", "Deep Cut (work)"),
      (602, "w-602", "Wrong Order Work")
    ).toDF("id", "gid", "name")
    val workAlias = Seq((600, "CAYA")).toDF("work", "name")
    val language = Seq(
      (700, Some("en"), "eng"),
      (701, None, "zxx"),
      (702, None, "und") // filtered: iso1 null and iso3 != zxx
    ).toDF("id", "iso_code_1", "iso_code_3")
    val workLanguage = Seq((600, 700), (601, 701), (601, 702)).toDF("work", "language")

    MbSources(
      artist = artist, area = area, iso31661 = iso31661, lAreaArea = lAreaArea,
      lArtistUrl = lArtistUrl, artistAlias = artistAlias,
      artistCredit = artistCredit, artistCreditName = artistCreditName,
      lArtistArtist = lArtistArtist, link = link, linkAttribute = linkAttribute,
      releaseGroup = releaseGroup,
      releaseGroupSecondaryTypeJoin = releaseGroupSecondaryTypeJoin,
      lReleaseGroupReleaseGroup = lReleaseGroupReleaseGroup,
      release = release, releaseCountry = releaseCountry,
      medium = medium, track = track,
      recording = recording, recordingAlias = recordingAlias,
      lRecordingWork = lRecordingWork, work = work, workAlias = workAlias,
      language = language, workLanguage = workLanguage)
  }
}
