package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable contracts of the maintained funnel-cell store:
  * signed (user, step-type, ts) count deltas for insert / type
  * correction / ts shift / retraction, untracked-type filtering on each
  * CDC side's own image, per-batchId idempotence, duplicate-collapse
  * invariance (the algebra that makes the store exact), and fold. The
  * end-to-end CDC arrival path incl. the registered-key parity is
  * driver-pinned by `q_gate_store_funnel`. */
class FunnelStoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import streaming.{FunnelStore, SnapshotStore}

  private val steps = Seq("view", "click", "purchase")

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_funnel").toString

  private def ts(s: String): java.time.LocalDateTime =
    java.time.LocalDateTime.parse(s)

  private def change(rows: (Long, String, java.lang.Long, java.lang.Long,
      String, String, java.time.LocalDateTime,
      java.time.LocalDateTime)*) = {
    import spark.implicits._
    rows.toDF("event_id", "change_type", "old_user_id", "new_user_id",
      "old_event_type", "new_event_type", "old_ts", "new_ts")
  }

  private def cells(dir: String): Set[(Long, String, String)] =
    FunnelStore.stepEvents(spark, dir).collect().map { r =>
      (r.getLong(0), r.getString(1),
        r.getAs[java.time.LocalDateTime]("ts").toString)
    }.toSet

  test("insert/retype/shift/retract deltas move cells; untracked filtered") {
    val dir = freshDir()
    // user 1 walks the funnel; user 2 views only; an 'error' event (not
    // a step type) must write nothing
    FunnelStore.ingestBatch(spark, dir, change(
      (1L, "insert", null, 1L, null, "view", null, ts("2024-03-01T10:00:00")),
      (2L, "insert", null, 1L, null, "click", null, ts("2024-03-01T10:05:00")),
      (3L, "insert", null, 1L, null, "purchase", null, ts("2024-03-01T11:00:00")),
      (4L, "insert", null, 2L, null, "view", null, ts("2024-03-01T09:00:00")),
      (5L, "insert", null, 2L, null, "error", null, ts("2024-03-01T09:01:00"))),
      0L, steps)
    assert(cells(dir) == Set(
      (1L, "view", "2024-03-01T10:00"), (1L, "click", "2024-03-01T10:05"),
      (1L, "purchase", "2024-03-01T11:00"), (2L, "view", "2024-03-01T09:00")))
    // funnel over the cells: user 1 reaches all 3 steps, user 2 step 1
    val f = FunnelStore.funnel(spark, dir, steps, "24 hours").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(f == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
    // a type correction (purchase -> click) moves the cell between steps
    val fix = change((3L, "update", 1L, 1L, "purchase", "click",
      ts("2024-03-01T11:00:00"), ts("2024-03-01T11:00:00")))
    FunnelStore.ingestBatch(spark, dir, fix, 1L, steps)
    assert(cells(dir) == Set(
      (1L, "view", "2024-03-01T10:00"), (1L, "click", "2024-03-01T10:05"),
      (1L, "click", "2024-03-01T11:00"), (2L, "view", "2024-03-01T09:00")))
    // at-least-once replay of ver 1 — no-op
    FunnelStore.ingestBatch(spark, dir, fix, 1L, steps)
    assert(cells(dir).size == 4)
    // a correction between two UNTRACKED types writes nothing (no-op
    // version discipline)
    val v0 = SnapshotStore.currentManifest(spark, dir).map(_.version)
    FunnelStore.ingestBatch(spark, dir, change(
      (5L, "update", 2L, 2L, "error", "signup",
        ts("2024-03-01T09:01:00"), ts("2024-03-01T09:01:00"))), 2L, steps)
    assert(SnapshotStore.currentManifest(spark, dir).map(_.version) == v0)
    // retraction (GDPR): user 2's view vanishes
    FunnelStore.ingestBatch(spark, dir, change(
      (4L, "delete", 2L, null, "view", null,
        ts("2024-03-01T09:00:00"), null)), 3L, steps)
    assert(cells(dir).forall(_._1 == 1L))
    // fold: served cells unchanged, version rows reclaimed
    val before = cells(dir)
    val raw = SnapshotStore.read(spark, dir).count()
    FunnelStore.fold(spark, dir)
    assert(SnapshotStore.read(spark, dir).count() < raw)
    assert(cells(dir) == before)
  }

  test("duplicate (user, type, ts) events collapse to a count and funnel is invariant") {
    // the store's exactness argument: the funnel depends only on the
    // multiset SUPPORT — two identical view events are one cell with
    // cnt=2, and retracting ONE of them must keep the cell live
    val dir = freshDir()
    FunnelStore.ingestBatch(spark, dir, change(
      (1L, "insert", null, 1L, null, "view", null, ts("2024-03-01T10:00:00")),
      (2L, "insert", null, 1L, null, "view", null, ts("2024-03-01T10:00:00"))),
      0L, steps)
    assert(cells(dir) == Set((1L, "view", "2024-03-01T10:00")))
    FunnelStore.ingestBatch(spark, dir, change(
      (2L, "delete", 1L, null, "view", null,
        ts("2024-03-01T10:00:00"), null)), 1L, steps)
    assert(cells(dir) == Set((1L, "view", "2024-03-01T10:00")),
      "one of two duplicate events retracted: the cell must stay live")
    FunnelStore.ingestBatch(spark, dir, change(
      (1L, "delete", 1L, null, "view", null,
        ts("2024-03-01T10:00:00"), null)), 2L, steps)
    assert(cells(dir).isEmpty, "both retracted: the cell must drop")
  }

  test("build matches the drained shape and serves all three funnel keys") {
    import spark.implicits._
    val dir = freshDir()
    val events = Seq(
      (1L, 1L, "view", ts("2024-03-01T10:00:00")),
      (2L, 1L, "click", ts("2024-03-01T10:30:00")),
      (3L, 1L, "purchase", ts("2024-03-01T12:00:00")),
      (4L, 2L, "view", ts("2024-03-02T08:00:00")),
      (5L, 2L, "click", ts("2024-03-03T09:00:00")), // > 24h after view
      (6L, 3L, "error", ts("2024-03-01T00:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    FunnelStore.build(spark, dir, events, steps)
    // served == live over the same events for all three derivations
    def strs(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    assert(strs(FunnelStore.funnel(spark, dir, steps, "24 hours")) ==
      strs(operators.Funnel.run(events, steps, "24 hours")))
    assert(strs(FunnelStore.funnelLatency(spark, dir, steps, "24 hours")) ==
      strs(operators.Funnel.latency(events, steps, "24 hours")))
    assert(strs(FunnelStore.funnelUnordered(spark, dir, steps, "24 hours")) ==
      strs(operators.Funnel.runUnordered(events, steps, "24 hours")))
    // and the deadline semantics survive the store: user 2's click is
    // outside the 24h window, so step 2 counts only user 1
    val f = FunnelStore.funnel(spark, dir, steps, "24 hours").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(f == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }
}
