package graft.musicbrainz

import graft.SparkSpec

/** Plan-shape regression guards: the generation DAG and the batch matcher
  * are join-heavy enough that one bad refactor (a dropped join key, an
  * accidental both-sides filter) silently degrades to a cartesian /
  * nested-loop plan that "works" on the fixture and dies at scale.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def assertNoQuadraticJoin(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"$what has a cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"$what has a nested-loop join:\n$plan")
  }

  test("dataset generation plans contain no cartesian / nested-loop joins") {
    val src = MbFixture.sources(spark)
    val artists = ArtistOps.mbArtist(src)
    assertNoQuadraticJoin(artists, "mb_artist")
    assertNoQuadraticJoin(ArtistOps.artistAliases(src, artists), "mb_artist_alias")
    val (album, song, _) = CanonicalOps.exportTables(src, artists)
    assertNoQuadraticJoin(album, "mb_album")
    assertNoQuadraticJoin(song, "mb_song")
    assertNoQuadraticJoin(SongAliasOps.songAliases(src, song), "mb_song_alias")
  }

  test("batch matcher plan contains no cartesian / nested-loop joins") {
    val queries = Seq((1, "Nirvana", Option.empty[String], "Come as You Are"))
      .toDF("query_id", "artist_name", "artist2_name", "title")
    val m = MatchOps.matchSongs(queries, MbFixtureExport.cached(spark))
    assertNoQuadraticJoin(m, "matchSongs")
  }
}
