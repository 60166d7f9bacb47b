package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the storage-level half of the 100 TB join
  * strategy. The curation DAG joins back to the corpus on `doc_id` again
  * and again (dedup verdicts, span masks, contamination verdicts, score
  * tables); on a flat layout every one of those is a corpus-sized
  * exchange. Writing the corpus ONCE bucketed (and sorted) by `doc_id`
  * moves that cost to the write: every later equi-join or aggregate on
  * the bucket key plans with ZERO exchange on the bucketed side (Spark's
  * scan reports the hash-clustered distribution the join/agg requires),
  * and two tables bucketed the same way co-locate — their join shuffles
  * NOTHING. An equality filter on the bucket key additionally prunes to
  * the one matching bucket at planning time.
  *
  * This is deliberately Spark's own catalog bucketing, not a bespoke
  * layout: it survives session restarts, is readable by any Spark job,
  * and Catalyst already knows how to exploit it. The helpers exist so the
  * pipeline tier has one documented, spec-pinned way to do it.
  *
  * Scale notes: `numBuckets` fixes max scan parallelism for the table —
  * size it to the CLUSTER (e.g. 2-4× total executor cores at the target
  * corpus), not the test; a bucketed write sorts within buckets, so the
  * one-off write cost is a shuffle + sort it would have paid on the first
  * join anyway. Spark does not split a bucket file, so avoid low counts
  * over huge corpora (bucket skew is id-hash-uniform, unlike value skew).
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally in-bucket-sorted) managed
    * parquet table, ONE FILE PER BUCKET. The pre-write repartition hashes
    * by the same Murmur3 `HashPartitioning` the bucket layout uses, so
    * task i holds exactly bucket i — without it every writer task emits a
    * file into every bucket (tasks × buckets small files at corpus
    * scale), and Spark only trusts the in-bucket sort order when a bucket
    * is a single file, so multi-file buckets silently re-sort in every
    * downstream sort-merge join. Sorting by the bucket key lets those
    * joins skip their sorts entirely — Spark 3+ additionally gates that
    * behind `spark.sql.legacy.bucketedTableScan.outputOrdering=true`
    * (both the conf and the no-re-sort plan are pinned in
    * `BucketingSpec`); without the conf the sorted single-file layout
    * still pays off via run-length-friendly encoding and min-max
    * row-group pruning on the key. */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
      keys: Seq[String], sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    import org.apache.spark.sql.functions.col
    val aligned = df.repartition(numBuckets, keys.map(col): _*)
    val w = aligned.write.format("parquet").mode(mode)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
