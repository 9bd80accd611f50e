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
    * @param numBuckets first ingest fixes the snapshot's bucket count
    *   (validated by the manifest on every later merge) */
  def ingest(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String, numBuckets: Int = 16): IngestStats = {
    val keyed = batch.withColumn("__fp", xxhash64(col(textCol)))
      .localCheckpoint(true) // feeds stats + winner pick + anti-join
    val batchRows = keyed.count()
    // first-seen within the batch: lowest id per fingerprint
    val w = Window.partitionBy("__fp").orderBy(col(idCol).asc)
    val winners = keyed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .localCheckpoint(true)
    val winnerRows = winners.count()
    // anti-join against only the buckets this batch can touch
    val touched = winners
      .select(SnapshotStore.bucketCol(Seq("__fp"), numBuckets).as("__b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val fresh = SnapshotStore.readBuckets(spark, dir, touched) match {
      case Some(existing) =>
        winners.join(existing.select("__fp"), Seq("__fp"), "left_anti")
          .localCheckpoint(true)
      case None => winners
    }
    val accepted = fresh.count()
    if (accepted > 0)
      SnapshotStore.merge(spark, dir, fresh, keys = Seq("__fp"),
        numBuckets = numBuckets, orderCol = None)
    IngestStats(batchRows, batchRows - winnerRows, winnerRows - accepted,
      accepted)
  }

  /** The ingested corpus (all buckets), fingerprint column dropped. */
  def corpus(spark: SparkSession, dir: String): DataFrame =
    SnapshotStore.read(spark, dir).drop("__fp")
}
