package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Incremental NEAR-duplicate detection — the history-aware half of the
  * dedup family: each arriving batch is checked against everything ever
  * indexed WITHOUT touching the historical corpus text, via a persisted
  * MinHash-LSH band index. Completes the production ingest loop that
  * [[IncrementalDedup]] opens for exact dedup: exact first-seen-wins on
  * the text fingerprint, then near-dup candidates against the
  * accumulated index, so a re-crawl paraphrase is caught the day it
  * arrives, not at the next full-corpus near-dup job.
  *
  * Index layout: parquet hash-partitioned by `__bkt` =
  * pmod(xxhash64(band_idx, band_hash), parts) — each row carries
  * (doc_id, band_idx, band_hash, mh0..mh{k-1}). The signature rides ON
  * the band row (k longs × bands/doc) so a lookup is ONE
  * partition-pruned join: no second corpus-sized signature table, no
  * read of historical text. A batch touching t of `parts` partitions
  * reads t/parts of the index — batch-bounded, like the exact path's
  * bucket pruning.
  *
  * Deliberately NOT a transactional store (contrast SnapshotStore): the
  * index is a CANDIDATE GENERATOR over derived state — rebuildable from
  * the corpus snapshot at any time — and its appends are replay-stable
  * in effect: a crash-replayed batch re-appends duplicate band rows
  * (duplicate candidate rows collapse in the `distinct()` before
  * confirmation), and candidates whose history side is a member of the
  * CURRENT batch are anti-joined away, so the replay returns the same
  * history-pair set as the first attempt even though that attempt
  * already indexed the batch. At-least-once appends + dedup-on-read is
  * the cheapest protocol that stays correct for this role; correctness
  * proper lives in the similarity confirmation (signature-estimated
  * Jaccard here; callers wanting exact confirmation join the candidate
  * pairs to text they own, exactly as q_dedup_minhash does).
  *
  * Batch-INTERNAL near-dups are out of scope by design (the in-batch
  * job — q_dedup_minhash / q_neardup — owns those); this operator
  * answers "is this new document a near-copy of anything in history".
  */
object IncrementalNearDup {

  /** (doc_id, band_idx, band_hash, mh0..mh{k-1}) for a batch — the rows
    * both sides of the lookup join carry, and the rows the index
    * stores. */
  def bandRows(batch: DataFrame, idCol: String, textCol: String,
      k: Int, rowsPerBand: Int, shingleWidth: Int = 3): DataFrame = {
    val ex = TextOps.shingleRows(batch, idCol, textCol, shingleWidth)
    val sig = TextOps.minhashSignature(ex, idCol, "shingle", k)
    TextOps.lshBands(sig, idCol, k, rowsPerBand).join(sig, idCol)
  }

  /** Check `batch` against the index at `indexDir`, then add the batch
    * to the index. Returns confirmed (new_id, old_id, est_jaccard)
    * pairs — history-side ids under `old_id`; est_jaccard is the
    * signature agreement fraction, threshold-filtered.
    *
    * Replay-stable: candidates whose history side belongs to THIS batch
    * are excluded, so a crash-replayed ingest (whose first attempt
    * already appended the batch's band rows) returns the identical
    * history-pair set instead of leaking batch-internal pairs.
    *
    * @param parts partition count for the FIRST ingest only; later
    *   ingests read it from the index's `_parts` marker (the partition
    *   function is the pruning key — an unchecked mismatch would look
    *   up the wrong slices and silently drop near-dups). Likewise k and
    *   rowsPerBand are pinned at first ingest: a different k fails
    *   analysis on missing mh columns, but a different rowsPerBand
    *   would silently hash different bands — stored params win. */
  def ingest(spark: SparkSession, indexDir: String, batch: DataFrame,
      idCol: String, textCol: String, k: Int = 16, rowsPerBand: Int = 4,
      parts: Int = 32, threshold: Double = 0.5): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // "history exists" = at least one committed partition dir — a
    // pre-created empty directory (or one holding only stray files)
    // is NO history, not a schema-inference crash
    val hasIndex = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("__bkt="))
    // stored-wins params (the IncrementalDedup manifest pattern): the
    // marker written at first ingest is authoritative; the caller's
    // parameters only seed a brand-new index. The marker is written
    // BEFORE the first data append — so "partitions exist but marker
    // absent" can only mean a torn index, and is rejected rather than
    // silently re-keyed with the caller's (possibly different) params.
    val partsPath = new org.apache.hadoop.fs.Path(p, "_parts")
    val (effParts, effK, effRpb) =
      if (fs.exists(partsPath)) {
        val in = fs.open(partsPath)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        // marker format: "parts" (legacy, pre-round-11) or
        // "parts,k,rowsPerBand"
        txt.split(',') match {
          case Array(pp)          => (pp.trim.toInt, k, rowsPerBand)
          case Array(pp, kk, rb)  => (pp.trim.toInt, kk.trim.toInt, rb.trim.toInt)
          case _ => sys.error(s"corrupt _parts marker at $indexDir: '$txt'")
        }
      } else if (hasIndex) {
        // data without a marker: a crash tore the (marker, append)
        // ordering of a PRE-round-11 writer, or the marker was deleted.
        // Trusting the caller's params here could mix moduli/band
        // widths in one index — fail loudly; the index is rebuildable.
        sys.error(s"near-dup index at $indexDir has data partitions but no " +
          "_parts marker — index is torn; rebuild it from the corpus snapshot")
      } else {
        // brand-new index — but NOT if a torn vacuum renamed the real
        // one aside: founding here would silently restart history from
        // zero (and recover would later delete the only copy)
        IndexMaintenance.assertNotTornVacuum(fs, p)
        // publish params BEFORE any data lands, so a
        // crash mid-append can never leave unmarked partitions
        val o = fs.create(partsPath, true)
        try o.write(s"$parts,$k,$rowsPerBand".getBytes("UTF-8"))
        finally o.close()
        (parts, k, rowsPerBand)
      }
    val rows = bandRows(batch, idCol, textCol, effK, effRpb)
      .withColumn("__bkt",
        pmod(xxhash64(col("band_idx"), col("band_hash")), lit(effParts)).cast("int"))
      .localCheckpoint(true) // feeds the lookup join AND the append
    val touched = rows.select("__bkt").distinct()
      .collect().map(_.getInt(0)).toSeq
    val out =
      if (!hasIndex) { // no history yet: zero pairs; id columns typed
        // like the BATCH's id so the first result unions cleanly with
        // every later one (string/UUID ids would otherwise clash)
        import org.apache.spark.sql.types._
        val idType = batch.schema(idCol).dataType
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("new_id", idType), StructField("old_id", idType),
            StructField("est_jaccard", DoubleType))))
      } else {
        // replay stability: a previous attempt may have indexed THIS
        // batch already — drop candidates whose history side is a
        // batch member (batch-internal pairs are out of scope)
        val batchIds = batch.select(col(idCol).as("old_id")).distinct()
        lookup(spark, indexDir, rows, touched, effK, threshold)
          .join(broadcast(batchIds), Seq("old_id"), "left_anti")
          .select("new_id", "old_id", "est_jaccard")
      }
    val confirmed = out.localCheckpoint(true) // pin results BEFORE the index grows
    rows.write.partitionBy("__bkt").mode("append").parquet(indexDir)
    confirmed
  }

  /** The lookup join itself, un-checkpointed — the stored-index scan
    * must carry `__bkt` PartitionFilters (only the batch's hash slices
    * read) and the candidate join is one (band_idx, band_hash) equi-join;
    * LayoutSpec pins both on this frame's plan. */
  private[graft] def lookup(spark: SparkSession, indexDir: String,
      batchBandRows: DataFrame, touched: Seq[Int], k: Int,
      threshold: Double): DataFrame = {
    // threshold on the UNROUNDED agreement fraction (for a k that does
    // not divide 10^4, rounding first flips boundary pairs relative to
    // the raw estimate — the hazard the embed twin documents); round
    // only the OUTPUT. distinct() on the raw double is safe: a pair's
    // meets evaluate the identical expression on identical signatures
    val estJ = (0 until k)
      .map(i => when(col(s"n.mh$i") === col(s"o.mh$i"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / k.toDouble
    val stored = spark.read.parquet(indexDir)
      .filter(col("__bkt").isin(touched: _*))
    batchBandRows.as("n").join(stored.as("o"),
        col("n.band_idx") === col("o.band_idx") &&
          col("n.band_hash") === col("o.band_hash") &&
          col("n.doc_id") =!= col("o.doc_id"))
      .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("old_id"),
        estJ.as("est_jaccard"))
      .distinct() // re-banded pairs + replayed index rows collapse here
      .filter(col("est_jaccard") >= threshold)
      .select(col("new_id"), col("old_id"),
        round(col("est_jaccard"), 4).as("est_jaccard"))
  }
}
