package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable contracts of the maintained order-activity store:
  * signed (customer, day) count+cents deltas for insert / reprice /
  * cancellation, delete-safe recency via day cells, per-batchId
  * idempotence, and fold. The end-to-end CDC arrival path incl. the
  * registered-key parity is driver-pinned by `q_gate_store_rfm`. */
class RfmStoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import streaming.{RfmStore, SnapshotStore}

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_rfm").toString

  private def day(s: String): java.sql.Date = java.sql.Date.valueOf(s)

  private def change(rows: (Long, String, java.lang.Long, java.lang.Long,
      java.sql.Date, java.sql.Date, java.lang.Double, java.lang.Double)*) = {
    import spark.implicits._
    rows.toDF("o_orderkey", "change_type", "old_o_custkey", "new_o_custkey",
      "old_o_orderdate", "new_o_orderdate",
      "old_o_totalprice", "new_o_totalprice")
  }

  private def stats(dir: String): Map[Long, (Long, Long, String)] =
    RfmStore.customerStats(spark, dir).collect().map { r =>
      r.getLong(0) -> (r.getAs[Long]("freq"), r.getAs[Long]("cents"),
        r.getAs[java.sql.Date]("last_o").toString)
    }.toMap

  test("insert/reprice/cancel deltas move freq/cents; recency is delete-safe") {
    val dir = freshDir()
    // customer 7: orders on day1 (10.00) and day2 (20.00); customer 8:
    // one order on day1 (5.00)
    RfmStore.ingestBatch(spark, dir, change(
      (1L, "insert", null, 7L, null, day("2024-03-01"), null, 10.0),
      (2L, "insert", null, 7L, null, day("2024-03-02"), null, 20.0),
      (3L, "insert", null, 8L, null, day("2024-03-01"), null, 5.0)), 0L)
    assert(stats(dir) == Map(
      7L -> (2L, 3000L, "2024-03-02"),
      8L -> (1L, 500L, "2024-03-01")))
    // reprice order 1: 10.00 -> 4.00 — freq unchanged, cents -600
    val rep = change(
      (1L, "update", 7L, 7L, day("2024-03-01"), day("2024-03-01"), 10.0, 4.0))
    RfmStore.ingestBatch(spark, dir, rep, 1L)
    assert(stats(dir)(7L) == (2L, 2400L, "2024-03-02"))
    // at-least-once replay of ver 1 — no-op
    RfmStore.ingestBatch(spark, dir, rep, 1L)
    assert(stats(dir)(7L) == (2L, 2400L, "2024-03-02"))
    // cancel order 2 (the LATEST order): recency must FALL BACK to
    // day1 — the day-celled artifact's whole reason to exist (a bare
    // per-customer max could never retreat)
    RfmStore.ingestBatch(spark, dir, change(
      (2L, "delete", 7L, null, day("2024-03-02"), null, 20.0, null)), 2L)
    assert(stats(dir)(7L) == (1L, 400L, "2024-03-01"))
    // fold: served stats unchanged, version rows reclaimed
    val before = stats(dir)
    val raw = SnapshotStore.read(spark, dir).count()
    RfmStore.fold(spark, dir)
    assert(SnapshotStore.read(spark, dir).count() < raw)
    assert(stats(dir) == before)
  }

  test("a customer-moving update nets across customers") {
    val dir = freshDir()
    RfmStore.ingestBatch(spark, dir, change(
      (1L, "insert", null, 7L, null, day("2024-03-01"), null, 10.0)), 0L)
    // the order is re-attributed to customer 9 (merged account)
    RfmStore.ingestBatch(spark, dir, change(
      (1L, "update", 7L, 9L, day("2024-03-01"), day("2024-03-01"),
        10.0, 10.0)), 1L)
    assert(stats(dir) == Map(9L -> (1L, 1000L, "2024-03-01")))
  }
}
