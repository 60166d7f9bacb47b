package graft.musicbrainz

import org.apache.spark.sql.DataFrame

/** §3.1 end-to-end: MusicBrainz-shaped sources → the 5-table export dataset
  * (`/root/reference/README.md:21`; schema contract `sql/2_export_tables.sql`).
  *
  * The reference's pipeline is `sql/1` → `sql/3` → `python src/main.py`
  * (~8 h) → `sql/4` → `sql/5` (~12 min); this is the same dependency chain
  * as one lazy DAG per output. Call `.write.parquet` (or JDBC) per table —
  * a single atomic overwrite replaces the reference's per-artist upsert
  * transactions (SURVEY S5/S7/S9).
  */
object GenerateDataset {

  final case class Export(
      mbArtist: DataFrame,
      mbArtistAlias: DataFrame,
      mbAlbum: DataFrame,
      mbSong: DataFrame,
      mbSongAlias: DataFrame)

  def apply(src: MbSources): Export = {
    val artists = ArtistOps.mbArtist(src)
    val (album, song) = CanonicalOps.exportTables(src, artists)
    Export(
      mbArtist = artists,
      mbArtistAlias = ArtistOps.artistAliases(src, artists),
      mbAlbum = album,
      mbSong = song,
      mbSongAlias = SongAliasOps.songAliases(src, song))
  }
}
