package graft.musicbrainz

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch matcher over the fixture export — §3.2 semantics: fuzzy artist
  * lookup, duo-split fallback, two-phase song lookup, relevance ranking,
  * and the A6 accuracy counters (replica of `benchmark.py:245-274`).
  */
class MatchOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val export = MbFixtureExport.cached(spark)

  private lazy val queries = Seq(
    (1, "Nirvana", Option.empty[String], "Come as You Are"),  // exact
    (2, "Nirvanna", None, "Come as You Are"),                 // artist lev=1
    (3, "Motorhead", None, "Ace of Spades"),                  // unaccented probe
    (4, "Alpha", Some("Beta"), "Duet Song"),                  // duo fallback
    (5, "Nirvana", None, "Hitsong"),                          // single-from boost
    (6, "Queen", None, "Bohemian"),                           // no artist match
    (7, "Nirvana", None, "CAYA"),                             // work-alias hit
    (8, "Nirvana", None, "Come as"),                          // phase-1 prefix
    (9, "Nirvana", None, "Come as You Arf"),                  // phase-2 lev
    (10, "Nirvana", None, "Oldie")                            // wrong-expectation row
  ).toDF("query_id", "artist_name", "artist2_name", "title")

  private lazy val matches =
    MatchOps.matchSongs(queries, export).cache()

  test("matched albums per query (artist fuzz, duo fallback, two phases)") {
    val got = matches.select("query_id", "album_mb_id").as[(Int, String)]
      .collect().toMap
    assert(got == Map(
      1 -> "g-201", 2 -> "g-201", 3 -> "g-212", 4 -> "g-210", 5 -> "g-205",
      7 -> "g-201", 8 -> "g-201", 9 -> "g-201", 10 -> "g-202"))
    assert(!got.contains(6)) // missing: no artist within distance 1
  }

  test("matched song detail: alias provenance and artist fields") {
    val m7 = matches.filter(col("query_id") === 7)
      .select("song_mb_id", "matched_alias", "artist_mb_id", "country_id")
      .as[(String, String, String, String)].head()
    assert(m7 == (("r-100", "caya", "a-1", "us")))
  }

  test("relevance boosts: single-from song ranks its source album first") {
    val m5 = matches.filter(col("query_id") === 5)
      .select("song_mb_id", "relevance").as[(String, Int)].head()
    // score 2 × 10 (single-from) × 1 (not main) × 10 (exact) = 200
    assert(m5 == (("r-102", 200)))
  }

  test("accuracy counters (A6): total/correct/missing/wrong") {
    val golden = Seq(
      (1, "g-201"), (2, "g-201"), (3, "g-212"), (4, "g-210"), (5, "g-205"),
      (6, "g-000"), // matcher finds nothing → missing
      (7, "g-201"), (8, "g-201"), (9, "g-201"),
      (10, "g-777") // matcher finds g-202 → wrong
    ).toDF("query_id", "musicbrainz_id")
    val stats = MatchOps.accuracy(golden, matches)
      .as[(Long, Long, Long, Long)].head()
    assert(stats == ((10L, 1L, 1L, 8L))) // total, missing, wrong, correct
  }
}
