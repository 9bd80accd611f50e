package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable contracts of the maintained sketch-catalog store:
  * insert-delta merge exactness (KMV union), the delete / tracked-
  * mutation rebuild discipline, untracked waves writing nothing,
  * per-batchId idempotence, compact invariance, and the cardinality
  * estimator's exact-below-k regime. The end-to-end CDC arrival path
  * incl. FK-verdict serving is driver-pinned by
  * `q_gate_store_catalog_relations`. */
class SketchCatalogStoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import streaming.{SketchCatalogStore, SnapshotStore}
  import graft.catalog.Relations

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_skcat").toString

  // a table whose one id-like column is the snapshot key and whose
  // second id-like column is a mutable payload
  private def tbl(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("row_id", "ref_id")
  }

  private def change(rows: (Long, String, java.lang.Long, java.lang.Long)*) = {
    import spark.implicits._
    rows.toDF("row_id", "change_type", "old_ref_id", "new_ref_id")
  }

  private def served(dir: String): Seq[String] =
    SketchCatalogStore.sketches(spark, dir).collect()
      .map(_.toString).toSeq.sorted

  private def fresh(name: String, t: org.apache.spark.sql.DataFrame): Seq[String] =
    Relations.columnSketches(Seq(name -> t)).collect()
      .map(_.toString).toSeq.sorted

  test("insert deltas merge to the exact from-scratch sketch; replay idempotent") {
    val dir = freshDir()
    val b0 = tbl((1L, 10L), (2L, 20L), (3L, 10L))
    val b1 = tbl((4L, 30L), (5L, 20L))
    def ing(b: org.apache.spark.sql.DataFrame, v: Long,
        cur: org.apache.spark.sql.DataFrame): Unit =
      SketchCatalogStore.ingestBatch(spark, dir, "t",
        b.select(col("row_id"), lit("insert").as("change_type"),
          lit(null).cast("bigint").as("old_ref_id"),
          col("ref_id").as("new_ref_id")),
        v, Seq("row_id"), cur)
    val cur01 = tbl((1L, 10L), (2L, 20L), (3L, 10L), (4L, 30L), (5L, 20L))
    ing(b0, 0L, b0)
    ing(b1, 1L, cur01)
    assert(served(dir) == fresh("t", cur01))
    // all-delta history (no 'full' floor) is a legal serving state
    assert(SnapshotStore.read(spark, dir)
      .filter(col("kind") === "full").count() == 0)
    // at-least-once replay of batch 1: identical deterministic rows
    ing(b1, 1L, cur01)
    assert(served(dir) == fresh("t", cur01))
  }

  test("deletes and tracked mutations rebuild; untracked waves write nothing") {
    val dir = freshDir()
    val cur0 = tbl((1L, 10L), (2L, 20L))
    SketchCatalogStore.ingestBatch(spark, dir, "t",
      change((1L, "insert", null, 10L), (2L, "insert", null, 20L)),
      0L, Seq("row_id"), cur0)
    // tracked mutation (ref_id 20 -> 99): KMV cannot subtract -> 'full'
    val cur1 = tbl((1L, 10L), (2L, 99L))
    SketchCatalogStore.ingestBatch(spark, dir, "t",
      change((2L, "update", 20L, 99L)), 1L, Seq("row_id"), cur1)
    assert(SnapshotStore.read(spark, dir)
      .filter(col("kind") === "full" && col("ver") === 1L).count() > 0)
    assert(served(dir) == fresh("t", cur1))
    // no-op update (old <=> new): nothing written
    val v1 = SnapshotStore.currentManifest(spark, dir).map(_.version)
    SketchCatalogStore.ingestBatch(spark, dir, "t",
      change((1L, "update", 10L, 10L)), 2L, Seq("row_id"), cur1)
    assert(SnapshotStore.currentManifest(spark, dir).map(_.version) == v1)
    // delete: rebuild from the reduced table
    val cur2 = tbl((1L, 10L))
    SketchCatalogStore.ingestBatch(spark, dir, "t",
      change((2L, "delete", 99L, null)), 3L, Seq("row_id"), cur2)
    assert(served(dir) == fresh("t", cur2))
  }

  test("a rebuild from content AHEAD of its version is healed by set semantics") {
    // crash window: a rebuild at version v reads the table's LATEST
    // content (not content-as-of-v), so after a watermark-write crash
    // the replayed rebuild can capture values that later delta versions
    // ALSO carry. Harmless by construction: sketches are value SETS
    // (hash-deduped), so double-inclusion merges to the same bottom-k —
    // this row pins that the serving merge equals the fresh rescan even
    // when a 'full' floor overlaps the deltas above it.
    val dir = freshDir()
    val cur2 = tbl((1L, 10L), (2L, 20L), (3L, 30L))
    SketchCatalogStore.ingestBatch(spark, dir, "t",
      change((1L, "insert", null, 10L)), 0L, Seq("row_id"), tbl((1L, 10L)))
    // rebuild at ver 1 sees content that already includes ver 2's row
    SketchCatalogStore.build(spark, dir, "t", cur2, ver = 1L)
    SketchCatalogStore.ingestBatch(spark, dir, "t",
      change((3L, "insert", null, 30L)), 2L, Seq("row_id"), cur2)
    assert(served(dir) == fresh("t", cur2))
  }

  test("compact rewrites the floor without moving any served sketch") {
    val dir = freshDir()
    (0 to 4).foreach { v =>
      val b = tbl((v * 10L + 1, v + 100L), (v * 10L + 2, v + 200L))
      SketchCatalogStore.ingestBatch(spark, dir, "t",
        b.select(col("row_id"), lit("insert").as("change_type"),
          lit(null).cast("bigint").as("old_ref_id"),
          col("ref_id").as("new_ref_id")),
        v.toLong, Seq("row_id"), b)
    }
    val before = served(dir)
    SketchCatalogStore.compact(spark, dir)
    assert(served(dir) == before)
    // the floor now exists at the top version, so serving reads one row
    // per column instead of the 5-deep delta log
    assert(SnapshotStore.read(spark, dir)
      .filter(col("kind") === "full" && col("ver") === 4L).count() == 2)
  }

  test("cardinality gauge: exact below k, estimator engaged above") {
    val dir = freshDir()
    val small = tbl((1L to 50L).map(i => i -> (i % 7 + 1000L)): _*)
    SketchCatalogStore.build(spark, dir, "small", small, k = 256)
    val cards = SketchCatalogStore.cardinalities(spark, dir).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(cards("row_id") == (50L, true))
    assert(cards("ref_id") == (7L, true))
    // above k: k=16 over 500 distinct values — estimator regime, sane band
    val dir2 = freshDir()
    val big = tbl((1L to 500L).map(i => i -> (i + 5000L)): _*)
    SketchCatalogStore.build(spark, dir2, "big", big, k = 16)
    val est = SketchCatalogStore.cardinalities(spark, dir2, k = 16)
      .filter(col("col") === "row_id").head()
    assert(!est.getBoolean(3))
    val e = est.getLong(2)
    assert(e > 100L && e < 2500L, s"k=16 estimate $e wildly off 500")
  }
}
