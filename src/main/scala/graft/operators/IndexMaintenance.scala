package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Maintenance for the persisted incremental indexes
  * ([[IncrementalNearDup]]'s `__bkt=` band index,
  * [[IncrementalEmbedDedup]]'s `__cell=` IVF index): their ingest
  * protocol is deliberately at-least-once — a crash-replayed batch
  * re-appends its rows, and lookups collapse the duplicates in a
  * `distinct()` — which keeps ingest simple and replay-safe but lets
  * the ON-DISK index grow with every replay, forever. Correctness never
  * degrades; scan cost does. `vacuum` is the hygiene pass: rewrite the
  * index keeping ONE copy of each row.
  *
  * Protocol (single-writer maintenance, like SnapshotStore's OPTIMIZE —
  * do not run concurrently with an ingest on the same index):
  *   1. distinct rows are written to a scratch sibling directory,
  *      marker files FIRST (`_parts`/`_model` — the same
  *      markers-before-data ordering the founding ingest uses), then
  *      the data partitions;
  *   2. the old index renames aside, the scratch renames into place,
  *      the old tree deletes.
  * A crash between the two renames leaves the index path ABSENT with
  * the `__vacuum_old_` sibling intact — recovery is one rename back;
  * the scratch/old names make the torn state visible rather than
  * silently re-foundable (an ingest against the absent path would
  * otherwise found a fresh index with the caller's params).
  *
  * Row identity is WHOLE-ROW: two band/cell rows are duplicates only if
  * every column (id, signature, partition key) matches — exactly the
  * rows a replayed append re-writes. Lookup results are therefore
  * bit-identical before and after (the lookup's own distinct() was
  * already collapsing these).
  */
object IndexMaintenance {

  final case class VacuumStats(rowsBefore: Long, rowsAfter: Long)

  /** Vacuum the index at `indexDir`, whose data is parquet partitioned
    * by `partitionCol` (`__bkt` or `__cell`). Returns before/after row
    * counts; a no-replay index vacuums to itself (rowsAfter ==
    * rowsBefore). */
  def vacuum(spark: SparkSession, indexDir: String,
      partitionCol: String): VacuumStats = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no index at $indexDir")
    val hasData = fs.listStatus(p)
      .exists(_.getPath.getName.startsWith(partitionCol + "="))
    require(hasData,
      s"index at $indexDir has no $partitionCol= data partitions to vacuum")
    val uuid = java.util.UUID.randomUUID().toString
    val scratch = new Path(indexDir + s"__vacuum_new_$uuid")
    val old = new Path(indexDir + s"__vacuum_old_$uuid")
    // distinct BEFORE any filesystem mutation; count() both sides while
    // the source is still live (localCheckpoint pins the result so the
    // write below does not re-read the directory being swapped)
    val before = spark.read.parquet(indexDir)
    val rowsBefore = before.count()
    val deduped = before.distinct().localCheckpoint(true)
    val rowsAfter = deduped.count()
    // markers first (the founding protocol's ordering): a scratch tree
    // with data but no marker would be a torn index if it ever became
    // the live path
    fs.mkdirs(scratch)
    fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.startsWith("_"))
      .foreach { m =>
        val dst = new Path(scratch, m.getPath.getName)
        org.apache.hadoop.fs.FileUtil.copy(
          fs, m.getPath, fs, dst, false, spark.sparkContext.hadoopConfiguration)
      }
    deduped.write.partitionBy(partitionCol).mode("append")
      .parquet(scratch.toString)
    // the swap: two renames; the tiny absent window is the documented
    // single-writer maintenance contract
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"vacuum: could not rename $p aside")
    if (!fs.rename(scratch, p)) {
      // restore the original rather than leaving the path absent
      fs.rename(old, p)
      throw new java.io.IOException(
        s"vacuum: could not promote $scratch; original restored")
    }
    fs.delete(old, true)
    VacuumStats(rowsBefore, rowsAfter)
  }
}
