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
      mbSongAlias: DataFrame,
      hinges: Seq[DataFrame] = Nil) {
    /** Release the hinge caches installed by [[GenerateDataset.apply]]
      * (no-op on never-persisted frames). `hinges` carries the INTERNAL
      * persisted handles — e.g. the candidates-DAG hinge inside
      * [[CanonicalOps.exportTables]] — which the exported frames' own
      * unpersist() can never reach (they are derived plans). */
    def unpersist(): Unit =
      (Seq(mbArtist, mbArtistAlias, mbAlbum, mbSong, mbSongAlias) ++ hinges)
        .foreach(_.unpersist())
  }

  /** `persistHinge` (default on) caches the DataFrames every sink shares —
    * the filtered artist set, the candidates join spine, the song table.
    * The export fans out into FIVE sinks; without the caches each write
    * action re-executes the full upstream DAG, turning one pipeline pass
    * into five (measured 140 s → 30 s for 10k synthetic artists). Pass
    * false to keep the plan fully lazy (single-sink or plan-inspection
    * use).
    */
  def apply(src: MbSources, persistHinge: Boolean = true): Export = {
    val artists0 = ArtistOps.mbArtist(src)
    val artists = if (persistHinge) artists0.persist() else artists0
    val (album, song0, hinge) = CanonicalOps.exportTables(src, artists, persistHinge)
    val song = if (persistHinge) song0.persist() else song0
    Export(
      mbArtist = artists,
      mbArtistAlias = ArtistOps.artistAliases(src, artists),
      mbAlbum = album,
      mbSong = song,
      mbSongAlias = SongAliasOps.songAliases(src, song),
      hinges = hinge.toSeq)
  }

  /** Persist the export as parquet, one directory per table — the engine's
    * replacement for the reference's pg_dump/pg_restore shipping step
    * (`README.md:206-227`, SURVEY S9). Each table is written atomically
    * (overwrite), replacing the per-artist upsert transactions (S7).
    *
    * Alias tables are repartitioned AND sorted by their lookup key: at
    * serving scale the matcher's first move is an equi-join on `alias`, so
    * co-locating equal keys gives downstream readers a ready-made
    * shuffle-free build side, and key-sorted row groups give parquet
    * min/max pruning for point probes.
    */
  def write(export: Export, dir: String, aliasPartitions: Int = 32): Unit = {
    export.mbArtist.write.mode("overwrite").parquet(s"$dir/mb_artist")
    export.mbAlbum.write.mode("overwrite").parquet(s"$dir/mb_album")
    export.mbSong.write.mode("overwrite").parquet(s"$dir/mb_song")
    export.mbArtistAlias
      .repartition(aliasPartitions, org.apache.spark.sql.functions.col("alias"))
      .sortWithinPartitions("alias")
      .write.mode("overwrite").parquet(s"$dir/mb_artist_alias")
    export.mbSongAlias
      .repartition(aliasPartitions, org.apache.spark.sql.functions.col("alias"))
      .sortWithinPartitions("alias")
      .write.mode("overwrite").parquet(s"$dir/mb_song_alias")
  }

  /** Ship the export to a serving database over JDBC — the final leg of the
    * reference's deployment story (`README.md:206-227` dumps the 5 tables
    * with pg_dump and restores them into the serving Postgres). `overwrite`
    * is Spark's drop-recreate-insert — NOT atomic from a concurrent
    * reader's view (readers mid-write see a missing or partial table).
    * Like the reference's restore flow, load into a FRESH schema/database
    * (the `table` mapper re-points the names) and switch the serving
    * alias over once the load commits; don't overwrite live tables in
    * place.
    *
    * `writePartitions` bounds write parallelism: every task holds one JDBC
    * connection, and a 1000-executor cluster must not open 32k connections
    * against one serving DB — coalesce (no shuffle) narrows the plan to at
    * most that many concurrent inserts. Batch size and any dialect options
    * (user, password, driver, `batchsize`, `isolationLevel`) pass through
    * `options`.
    */
  def writeJdbc(
      export: Export,
      url: String,
      options: Map[String, String] = Map.empty,
      table: String => String = name => s"musicbrainz.$name",
      writePartitions: Int = 8): Unit = {
    def ship(df: DataFrame, name: String): Unit =
      df.coalesce(writePartitions)
        .write.format("jdbc")
        .option("url", url).options(options)
        .option("dbtable", table(name))
        .mode("overwrite").save()
    ship(export.mbArtist, "mb_artist")
    ship(export.mbArtistAlias, "mb_artist_alias")
    ship(export.mbAlbum, "mb_album")
    ship(export.mbSong, "mb_song")
    ship(export.mbSongAlias, "mb_song_alias")
  }

  /** Re-open a JDBC-shipped export — the serving-side reader twin of
    * [[writeJdbc]] (parity checks, or running the matcher against the
    * serving DB exactly as the reference's benchmark does).
    */
  def readJdbc(
      spark: org.apache.spark.sql.SparkSession,
      url: String,
      options: Map[String, String] = Map.empty,
      table: String => String = name => s"musicbrainz.$name"): Export = {
    def rd(name: String): DataFrame =
      spark.read.format("jdbc")
        .option("url", url).options(options)
        .option("dbtable", table(name)).load()
    Export(
      mbArtist = rd("mb_artist"),
      mbArtistAlias = rd("mb_artist_alias"),
      mbAlbum = rd("mb_album"),
      mbSong = rd("mb_song"),
      mbSongAlias = rd("mb_song_alias"))
  }

  /** Re-open a written export. */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String): Export =
    Export(
      mbArtist = spark.read.parquet(s"$dir/mb_artist"),
      mbArtistAlias = spark.read.parquet(s"$dir/mb_artist_alias"),
      mbAlbum = spark.read.parquet(s"$dir/mb_album"),
      mbSong = spark.read.parquet(s"$dir/mb_song"),
      mbSongAlias = spark.read.parquet(s"$dir/mb_song_alias"))
}
