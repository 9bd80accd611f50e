package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{IncrementalEmbedDedup, IncrementalNearDup, IndexMaintenance}

/** Vacuum for the persisted incremental indexes: replays plant
  * duplicate rows by design (at-least-once appends); vacuum must remove
  * exactly those, preserve the markers and lookup results, and converge
  * (a second vacuum is a no-op). Covers BOTH index layouts — the band
  * index (`__bkt`) and the IVF cell index (`__cell`). */
class IndexMaintenanceSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String): java.io.File = {
    val dir = new java.io.File(s"/root/repo/target/test_vacuum/$tag")
    LocalFs.rmrf(dir)
    dir
  }

  test("band index: vacuum removes replay duplicates, keeps pairs and markers") {
    val dir = freshDir("band")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val history = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    IncrementalNearDup.ingest(spark, dir.getPath, history, "doc_id", "text")
    val p1 = pairs(IncrementalNearDup.ingest(spark, dir.getPath, batch,
      "doc_id", "text"))
    pairs(IncrementalNearDup.ingest(spark, dir.getPath, batch,
      "doc_id", "text")) // replay
    val v = IndexMaintenance.vacuum(spark, dir.getPath, "__bkt")
    assert(v.rowsAfter < v.rowsBefore, s"no duplicates removed: $v")
    assert(v.rowsAfter > 0)
    // convergence: nothing left to remove
    val v2 = IndexMaintenance.vacuum(spark, dir.getPath, "__bkt")
    assert(v2.rowsAfter == v2.rowsBefore, s"second vacuum not a no-op: $v2")
    // markers survived: another ingest loads stored params and the
    // lookup returns the identical pair set
    val p3 = pairs(IncrementalNearDup.ingest(spark, dir.getPath, batch,
      "doc_id", "text"))
    assert(p3 == p1, s"pairs drifted across vacuum: ${p3.size} vs ${p1.size}")
  }

  test("cell index: vacuum removes replay duplicates, model header intact") {
    graft.functions.VectorExpressions.register(spark)
    val dir = freshDir("cell")
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val history = e.filter(col("vec_id") % 10 =!= 0)
    val batch = e.filter(col("vec_id") % 10 === 0)
    IncrementalEmbedDedup.ingest(spark, dir.getPath, history,
      "vec_id", "embedding", threshold = 0.5)
    def run() = IncrementalEmbedDedup.ingest(spark, dir.getPath, batch,
      "vec_id", "embedding", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = run()
    run() // replay
    val v = IndexMaintenance.vacuum(spark, dir.getPath, "__cell")
    assert(v.rowsAfter < v.rowsBefore, s"no duplicates removed: $v")
    // the _model header (centroids + m= + drift d0/sd0) survived: the
    // drift gauge still reads it and another lookup matches
    val gauge = graft.operators.IndexDrift
      .gauge(spark, dir.getPath, batch, "embedding").head()
    assert(!gauge.isNullAt(0))
    assert(run() == p1)
  }

  test("stats gauges replay duplication; vacuum returns it to ~1.0") {
    val dir = freshDir("stats")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .filter(col("doc_id") % 5 === 0)
    IncrementalNearDup.ingest(spark, dir.getPath, docs, "doc_id", "text")
    IncrementalNearDup.ingest(spark, dir.getPath, docs, "doc_id", "text") // replay
    val before = IndexMaintenance.stats(spark, dir.getPath)
    assert(before.duplicationRatio > 1.5,
      s"full replay should roughly double rows: $before")
    // the policy call: fires on the replayed index...
    val fired = IndexMaintenance.vacuumIfNeeded(spark, dir.getPath, "__bkt")
    assert(fired.exists(v => v.rowsAfter < v.rowsBefore), s"policy idle: $fired")
    val after = IndexMaintenance.stats(spark, dir.getPath)
    // approx_count_distinct carries a few % error; 1.1 is far below the
    // pre-vacuum ~2.0
    assert(after.duplicationRatio < 1.1, s"vacuum left duplication: $after")
    // ...and leaves a clean index alone
    assert(IndexMaintenance.vacuumIfNeeded(spark, dir.getPath, "__bkt").isEmpty)
  }

  test("recover restores a torn swap and sweeps stale scratch trees") {
    val dir = freshDir("recover")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val history = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    def pairs() =
      IncrementalNearDup.ingest(spark, dir.getPath, batch, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    IncrementalNearDup.ingest(spark, dir.getPath, history, "doc_id", "text")
    val p1 = pairs()
    // simulate a crash between vacuum's two renames: index absent, the
    // original aside as __vacuum_old_, a half-written scratch left over
    val old = new java.io.File(dir.getPath + "__vacuum_old_crash")
    val scratch = new java.io.File(dir.getPath + "__vacuum_new_crash")
    assert(dir.renameTo(old))
    scratch.mkdirs()
    new java.io.File(scratch, "part-00000.parquet").createNewFile()
    // the founding guard: an ingest against the absent path must refuse
    // rather than silently found a fresh index over the torn vacuum
    // (recover would then delete the renamed-aside original — the only
    // copy of the history — as post-promote garbage)
    val refused = intercept[RuntimeException] {
      IncrementalNearDup.ingest(spark, dir.getPath, batch, "doc_id", "text")
    }
    assert(refused.getMessage.contains("torn"), refused.getMessage)
    val r = IndexMaintenance.recover(spark, dir.getPath)
    assert(r.restored && r.staleScratchRemoved == 1)
    assert(!old.exists() && !scratch.exists() && dir.exists())
    assert(pairs() == p1, "restored index lost lookup fidelity")
    // post-promote crash: index live, old tree is garbage — swept
    val old2 = new java.io.File(dir.getPath + "__vacuum_old_crash2")
    old2.mkdirs()
    val r2 = IndexMaintenance.recover(spark, dir.getPath)
    assert(!r2.restored && r2.staleOldRemoved == 1 && !old2.exists())
    // nothing recoverable: absent index, no old sibling
    val gone = freshDir("recover_gone")
    intercept[IllegalArgumentException] {
      IndexMaintenance.recover(spark, gone.getPath)
    }
  }

  test("vacuum refuses a missing or data-less index") {
    val dir = freshDir("empty")
    intercept[IllegalArgumentException] {
      IndexMaintenance.vacuum(spark, dir.getPath, "__bkt")
    }
    dir.mkdirs()
    intercept[IllegalArgumentException] {
      IndexMaintenance.vacuum(spark, dir.getPath, "__bkt")
    }
  }
}
