package graft.musicbrainz

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.normalize
import graft.operators.Relational

/** `sql/5_song_alias_data.sql` re-expressed (SURVEY U2): song aliases from
  * 4 sources — recording name ∪ recording aliases ∪ linked work names ∪
  * work aliases — normalized and deduplicated.
  */
object SongAliasOps {

  /** → mb_song_alias(song_id, alias). `mbSong.mb_id` is the recording gid
    * (`sql/5:7` joins back through it). Normalization uses
    * [[normalize.searchKey]] on both store and probe sides (SURVEY §7.4.3);
    * empty keys are null and dropped. `ON CONFLICT DO NOTHING` → distinct.
    */
  def songAliases(src: MbSources, mbSong: DataFrame): DataFrame = {
    val songRec = mbSong.select(col("id").as("song_id"), col("mb_id"))
      .join(src.recording.select(col("gid"), col("id").as("rec_id"), col("name").as("rec_name")),
        col("mb_id") === col("gid"))
      .select(col("song_id"), col("rec_id"), col("rec_name"))

    val own = songRec.select(col("song_id"), col("rec_name").as("name"))
    val recAlias = songRec
      .join(src.recordingAlias.select(col("recording"), col("name")),
        col("rec_id") === col("recording"))
      .select(col("song_id"), col("name"))
    val workLinked = songRec
      .join(src.lRecordingWork.select(col("entity0"), col("entity1")),
        col("rec_id") === col("entity0"))
      .join(src.work.select(col("id").as("w_id"), col("name").as("w_name")),
        col("entity1") === col("w_id"))
    val workName = workLinked.select(col("song_id"), col("w_name").as("name"))
    val workAlias = workLinked
      .join(src.workAlias.select(col("work").as("wa_work"), col("name").as("wa_name")),
        col("w_id") === col("wa_work"))
      .select(col("song_id"), col("wa_name").as("name"))

    Relational.unionDistinct(Seq(own, recAlias, workName, workAlias))
      .select(col("song_id"), normalize.searchKey(col("name")).as("alias"))
      .filter(col("alias").isNotNull)
      .distinct()
  }
}
