package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalDedup
import graft.streaming.SnapshotStore

/** Incremental corpus ingestion invariants: first-seen-wins across
  * batches, replay idempotence, honest stats, bucket-pruned rewrites. */
class IncrementalDedupSpec extends AnyFunSuite {
  import SparkTestSession._


  private def freshDir(name: String): String = {
    val d = new java.io.File(s"/root/repo/target/$name")
    LocalFs.rmrf(d); d.toString
  }

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("first ingest dedups within the batch and reports honest stats") {
    val dir = freshDir("incr_first")
    val stats = IncrementalDedup.ingest(spark, dir,
      docsDf(1L -> "aa", 2L -> "bb", 3L -> "aa", 4L -> "cc"),
      "doc_id", "text", numBuckets = 4)
    assert(stats == IncrementalDedup.IngestStats(4, 1, 0, 3))
    val corpus = IncrementalDedup.corpus(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(corpus == Set(1L -> "aa", 2L -> "bb", 4L -> "cc"))
  }

  test("later batches never displace first-seen texts; replay is a no-op") {
    val dir = freshDir("incr_replay")
    IncrementalDedup.ingest(spark, dir,
      docsDf(10L -> "x", 11L -> "y"), "doc_id", "text", numBuckets = 4)
    val b2 = docsDf(1L -> "x", 12L -> "z") // "x" already known, lower id
    val s2 = IncrementalDedup.ingest(spark, dir, b2, "doc_id", "text", 4)
    assert(s2 == IncrementalDedup.IngestStats(2, 0, 1, 1))
    def corpus() = IncrementalDedup.corpus(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val after2 = corpus()
    assert(after2 == Set(10L -> "x", 11L -> "y", 12L -> "z"),
      "first-seen id for 'x' must survive a lower-id re-arrival")
    val v2 = SnapshotStore.currentManifest(spark, dir).get.version
    val s3 = IncrementalDedup.ingest(spark, dir, b2, "doc_id", "text", 4)
    assert(s3.accepted == 0 && s3.alreadyKnown == 2)
    assert(corpus() == after2)
    assert(SnapshotStore.currentManifest(spark, dir).get.version == v2,
      "a fully-duplicate batch must not commit a new snapshot version")
  }

  test("an ingest leaves buckets it does not touch byte-identical") {
    val dir = freshDir("incr_pruned")
    // many distinct texts spread over all 4 buckets
    val b1 = docsDf((1L to 40L).map(i => i -> s"text number $i"): _*)
    IncrementalDedup.ingest(spark, dir, b1, "doc_id", "text", numBuckets = 4)
    val before = SnapshotStore.currentManifest(spark, dir).get.buckets
    // one new text → exactly one bucket rewritten
    IncrementalDedup.ingest(spark, dir, docsDf(100L -> "the new one"),
      "doc_id", "text", numBuckets = 4)
    val after = SnapshotStore.currentManifest(spark, dir).get.buckets
    val changed = after.filter { case (b, d) => before.get(b).contains(d) == false }
    assert(changed.size == 1, s"expected 1 rewritten bucket, got $changed")
    assert((before -- changed.keys) == (after -- changed.keys),
      "untouched buckets must keep their committed dirs")
  }

  test("q_dedup_incremental equals the first-seen-wins oracle shape") {
    val out = SparkEntry.queries("q_dedup_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.groupBy(_._2).map { case (_, rs) =>
      rs.minBy { case (id, _) => (id % 2, id) }
    }.toSeq.sortBy(_._1)
    assert(out.toSeq == expected)
  }
}
