package graft.musicbrainz

import org.apache.spark.sql.SparkSession

/** The fixture's export dataset, computed once and cached across suites —
  * every assertion otherwise re-executes the full ~30-join generation DAG.
  */
object MbFixtureExport {
  private var memo: Option[GenerateDataset.Export] = None

  def cached(spark: SparkSession): GenerateDataset.Export = synchronized {
    memo.getOrElse {
      val e = GenerateDataset(MbFixture.sources(spark))
      val c = GenerateDataset.Export(
        mbArtist = e.mbArtist.cache(),
        mbArtistAlias = e.mbArtistAlias.cache(),
        mbAlbum = e.mbAlbum.cache(),
        mbSong = e.mbSong.cache(),
        mbSongAlias = e.mbSongAlias.cache())
      memo = Some(c)
      c
    }
  }
}
