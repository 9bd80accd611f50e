package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

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

  /** Replay-duplication gauge — the "when should I vacuum" half of the
    * maintenance story, mirroring [[IndexDrift]]'s role for rebuilds.
    * One scan, no full-width shuffle: `approx_count_distinct` over the
    * whole-row hash aggregates partially map-side, so at 100 TB this is
    * a read-only pass, never a distinct()-sized exchange. A ratio near
    * 1.0 means vacuum would be wasted I/O; a replay-heavy index shows
    * rows/distinct ≈ 1 + replays. */
  final case class IndexStats(rows: Long, approxDistinctRows: Long) {
    def duplicationRatio: Double =
      if (approxDistinctRows == 0) 1.0
      else rows.toDouble / approxDistinctRows
  }

  def stats(spark: SparkSession, indexDir: String): IndexStats = {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(indexDir)
    val row = df.agg(
      count(lit(1)).as("rows"),
      approx_count_distinct(xxhash64(df.columns.map(col): _*))
        .as("distinct_rows")).head()
    IndexStats(row.getLong(0), row.getLong(1))
  }

  /** The gauge-driven maintenance policy in one call: vacuum only when
    * [[stats]] says the replay tax exceeds `minRatio` (default 1.5 —
    * every lookup is paying ≥50% extra scan before a rewrite is
    * spent). Returns None when the index is clean enough to leave
    * alone, so a nightly maintenance job is one idempotent call per
    * index, not a timer-driven rewrite of healthy data. */
  def vacuumIfNeeded(spark: SparkSession, indexDir: String,
      partitionCol: String, minRatio: Double = 1.5): Option[VacuumStats] = {
    val s = stats(spark, indexDir)
    if (s.duplicationRatio >= minRatio)
      Some(vacuum(spark, indexDir, partitionCol))
    else None
  }

  /** The `__vacuum_old_` siblings of `indexPath`, if any — a non-empty
    * result with the index path ABSENT is the torn mid-vacuum state.
    * The incremental ingests call this before FOUNDING a new index:
    * founding over a torn vacuum would silently restart history from
    * zero, and a later [[recover]] would then delete the old tree (the
    * only copy of that history) as post-promote garbage. */
  def tornVacuumSiblings(fs: org.apache.hadoop.fs.FileSystem,
      indexPath: Path): Seq[Path] = {
    val parent = indexPath.getParent
    if (parent == null || !fs.exists(parent)) Seq.empty
    else fs.listStatus(parent).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(indexPath.getName + "__vacuum_old_"))
  }

  /** Guard for the founding paths: refuse to found a fresh index where
    * a torn vacuum left the real one renamed aside. */
  def assertNotTornVacuum(fs: org.apache.hadoop.fs.FileSystem,
      indexPath: Path): Unit = {
    val olds = tornVacuumSiblings(fs, indexPath)
    if (olds.nonEmpty && !fs.exists(indexPath))
      sys.error(s"refusing to found a new index at $indexPath: a torn " +
        s"vacuum left the existing index at ${olds.map(_.getName).mkString(", ")} " +
        "— run IndexMaintenance.recover first")
  }

  final case class RecoverStats(restored: Boolean, staleScratchRemoved: Int,
      staleOldRemoved: Int)

  /** Recover from a crash mid-[[vacuum]]. The torn states and their
    * repairs, in protocol order:
    *   - crash during the scratch write → live index untouched, a
    *     `__vacuum_new_` sibling is stale garbage: delete it;
    *   - crash between the two renames → index path ABSENT, the
    *     complete original sits at `__vacuum_old_`: rename it back
    *     (the documented "recovery is one rename back"; the scratch is
    *     deleted rather than promoted — re-running vacuum is cheap and
    *     a promote would have to prove the scratch write finished);
    *   - crash after promote, before cleanup → index live, the old
    *     tree is garbage: delete it.
    * No-op on a healthy index. Same single-writer contract as vacuum. */
  def recover(spark: SparkSession, indexDir: String): RecoverStats = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = p.getParent
    val base = p.getName
    val siblings =
      if (parent != null && fs.exists(parent)) fs.listStatus(parent).toSeq
      else Seq.empty
    def named(prefix: String) =
      siblings.filter(_.getPath.getName.startsWith(base + prefix))
    val scratches = named("__vacuum_new_")
    val olds = named("__vacuum_old_")
    scratches.foreach(s => fs.delete(s.getPath, true))
    if (fs.exists(p)) {
      // index live: any old tree is post-promote garbage
      olds.foreach(o => fs.delete(o.getPath, true))
      RecoverStats(restored = false, scratches.size, olds.size)
    } else {
      require(olds.nonEmpty,
        s"no index at $indexDir and no __vacuum_old_ sibling to restore — " +
          "nothing recoverable; rebuild the index from the corpus snapshot")
      require(olds.size == 1,
        s"multiple __vacuum_old_ siblings for $indexDir — concurrent " +
          s"vacuums violated the single-writer contract; resolve manually: " +
          olds.map(_.getPath.getName).mkString(", "))
      if (!fs.rename(olds.head.getPath, p))
        throw new java.io.IOException(
          s"recover: could not rename ${olds.head.getPath} back to $p")
      RecoverStats(restored = true, scratches.size, 0)
    }
  }

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
    // siblings derive from (parent, name) — raw string concatenation
    // would nest them INSIDE the index on a trailing-slash indexDir
    val scratch = new Path(p.getParent, p.getName + s"__vacuum_new_$uuid")
    val old = new Path(p.getParent, p.getName + s"__vacuum_old_$uuid")
    val before = spark.read.parquet(indexDir)
    val rowsBefore = before.count()
    // ONE data pass: the distinct shuffles straight into the scratch
    // write below — no checkpoint pinning a 100 TB index in the block
    // manager. Writing from the live directory is safe: the write
    // finishes before either rename runs.
    val deduped = before.distinct()
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
    // cluster rows by their partition before the write: without this,
    // every shuffle task of the distinct() writes a sliver into every
    // __bkt=/__cell= dir (tasks x partitions files — on TOP of the
    // fragmentation N appends already left), and post-vacuum scans pay
    // a parquet footer per sliver. One exchange keyed on the partition
    // column makes each dir one file: vacuum compacts as it dedups.
    deduped.repartition(col(partitionCol))
      .write.partitionBy(partitionCol).mode("append")
      .parquet(scratch.toString)
    val rowsAfter = spark.read.parquet(scratch.toString).count()
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
