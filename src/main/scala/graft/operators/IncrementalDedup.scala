package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.SnapshotStore

/** Incremental first-seen-wins corpus ingestion — the training-data
  * pipeline's front door. Each batch of documents is deduplicated
  * against everything EVER ingested (exact text dedup by fingerprint),
  * and only first-seen texts enter the corpus; re-ingesting a batch is
  * a no-op (exactly-once corpus semantics across replays).
  *
  * Scale shape (100 TB stance): the corpus snapshot is the bucketed,
  * manifest-committed [[SnapshotStore]] layout keyed by text
  * fingerprint, so one ingest
  *  1. fingerprints the batch map-side (xxhash64 of the text);
  *  2. collapses in-batch duplicates to the lowest-id row — one
  *     fingerprint-keyed shuffle of the BATCH;
  *  3. anti-joins against ONLY the snapshot buckets the batch's
  *     fingerprints hash into (a batch touching t of B buckets reads
  *     t/B of the corpus, not all of it);
  *  4. merges survivors through [[SnapshotStore.merge]], which rewrites
  *     only those same buckets and commits via one manifest rename.
  * Corpus-sized data is never shuffled; every step is bounded by the
  * batch plus the touched bucket slices.
  */
object IncrementalDedup {

  final case class IngestStats(
      batchRows: Long, withinBatchDups: Long, alreadyKnown: Long,
      accepted: Long)

  /** Ingest `batch` into the corpus snapshot at `dir`. Batch rows must
    * carry `idCol` (provenance id, lowest wins within a batch) and
    * `textCol`. Extra columns ride along untouched.
    *
    * @param numBuckets bucket count for the FIRST ingest only; later
    *   ingests read it from the committed manifest (a mismatched
    *   parameter would prune the anti-join with the wrong bucket
    *   function and let duplicates through) */
  def ingest(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String, numBuckets: Int = 16): IngestStats = {
    val buckets = graft.streaming.SnapshotStore.currentManifest(spark, dir)
      .map(_.numBuckets).getOrElse(numBuckets)
    // the snapshot key is (fingerprint, text), not the fingerprint
    // alone: the fp routes bucketing and keeps the shuffle keys small,
    // while the text equality makes a 64-bit collision merge two rows
    // instead of silently dropping a distinct document (at the
    // multi-billion-doc scale this targets, fp-only equality WILL
    // collide; the text rides in the same bucket, so comparing it
    // costs nothing extra)
    val keys = Seq("__fp", textCol)
    val keyed = batch.withColumn("__fp", xxhash64(col(textCol)))
      .localCheckpoint(true) // feeds stats + winner pick + anti-join
    val batchRows = keyed.count()
    // first-seen within the batch: lowest id per text
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(idCol).asc)
    val winners = keyed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .localCheckpoint(true)
    val winnerRows = winners.count()
    // anti-join against only the buckets this batch can touch
    val touched = winners
      .select(SnapshotStore.bucketCol(keys, buckets).as("__b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val fresh = SnapshotStore.readBuckets(spark, dir, touched) match {
      case Some(existing) =>
        winners.join(existing.select(keys.map(col): _*), keys, "left_anti")
          .localCheckpoint(true)
      case None => winners
    }
    val accepted = fresh.count()
    if (accepted > 0)
      SnapshotStore.merge(spark, dir, fresh, keys = keys,
        numBuckets = buckets, orderCol = None)
    IngestStats(batchRows, batchRows - winnerRows, winnerRows - accepted,
      accepted)
  }

  /** The ingested corpus (all buckets), fingerprint column dropped. */
  def corpus(spark: SparkSession, dir: String): DataFrame =
    SnapshotStore.read(spark, dir).drop("__fp")
}
