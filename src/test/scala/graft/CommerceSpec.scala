package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Customer-value analytics invariants: cohort LTV accounting on a
  * planted order book where the curve is computable by hand, RFM
  * scoring on a frame whose quartile thresholds are trivial, plus
  * reconciliation checks over the real corpus keys. */
class CommerceSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def plantOrders(rows: Seq[(Long, Double, Timestamp)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_orders").toString
    rows.zipWithIndex.map { case ((c, p, t), i) => (i.toLong, c, p, t) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("cohort LTV: planted curve — offsets, actives, cumulative per-user") {
    // cohort 2024-01, size 2: c1 spends 10 in Jan and 20 in Mar,
    // c2 spends 5 in Jan. Curve: offset 0 → revenue 15, 7.5/user;
    // offset 2 → revenue 20, cumulative 35 → 17.5/user.
    val dir = plantOrders(Seq(
      (1L, 10.0, ts("2024-01-05 00:00:00")),
      (1L, 20.0, ts("2024-03-10 00:00:00")),
      (2L, 5.0, ts("2024-01-20 00:00:00"))))
    val out = queries.Commerce.qCohortLtv.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("2024-01", 0L, 2L, 2L, 15.0, 7.5),
      ("2024-01", 2L, 2L, 1L, 20.0, 17.5)))
  }

  test("cohort LTV over the corpus: founding month is full, curve is monotone") {
    val rows = SparkEntry.queries("q_cohort_ltv")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filter(_.getLong(1) == 0L).foreach { r =>
      // every founding customer ordered in the cohort month by definition
      assert(r.getLong(3) == r.getLong(2),
        s"cohort ${r.getString(0)}: offset-0 actives != cohort size")
    }
    rows.groupBy(_.getString(0)).foreach { case (cohort, rs) =>
      val curve = rs.sortBy(_.getLong(1)).map(_.getDouble(5))
      assert(curve.zip(curve.tail).forall { case (a, b) => b >= a },
        s"cohort $cohort: cumulative LTV decreased")
    }
    // cohort sizes partition the customer base
    val sizes = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val customers = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(sizes == customers)
  }

  test("RFM: planted two-customer book lands on opposite score corners") {
    // c2 is more recent, more frequent, and higher-spend than c1 on
    // every quartile threshold → (4,4,4); c1 → (1,1,1).
    val dir = plantOrders(Seq(
      (1L, 10.0, ts("2024-01-01 00:00:00")),
      (2L, 12.0, ts("2024-02-01 00:00:00")),
      (2L, 8.0, ts("2024-03-01 00:00:00"))))
    val out = queries.Commerce.qRfm.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 1L, 10.0),
      (4L, 4L, 4L, 1L, 20.0)))
  }

  test("basket pairs: planted co-occurrence counts, ordered pairs only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_basket").toString
    // o1 {1,2,3}, o2 {1,2}, o3 {1} (and a duplicate line for part 1 in
    // o1 that must not double-count) → (1,2)x2, (1,3)x1, (2,3)x1
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 1L), (2L, 1L), (2L, 2L), (3L, 1L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = queries.Commerce.qBasketPairs.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("basket lift: planted rule is exact-integer 4dp, 1-count tail excluded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lift").toString
    // o1 {1,2}, o2 {1,2}, o3 {1,2,3}, o4 {3,4}: N=4, cnt(1)=cnt(2)=3,
    // cnt(3)=2; only (1,2) co-occurs >=2 (3 orders). lift = 3*4/(3*3)
    // -> (240000+9) DIV 18 = 13333 -> 1.3333; conf(1->2) = 3/3 = 1.0
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L),
      (3L, 3L), (4L, 3L), (4L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = queries.Commerce.qBasketLift.run(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1L, 2L, 3L))
    assert(r.getDouble(3) == 1.3333)
    assert(r.getDouble(4) == 1.0)
  }

  test("basket lift over the corpus: lift descending, confidence bounded") {
    val rows = SparkEntry.queries("q_basket_lift")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= 2L)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
    val lifts = rows.map(_.getDouble(3))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("basket pairs over the corpus: top-20, strict pair order, descending") {
    val rows = SparkEntry.queries("q_basket_pairs")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1)))
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("trending: planted week-over-week growth, floor excludes small prev") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_trend").toString
    // part 1: week of 2024-01-01 → $150, week of 2024-01-08 → $300
    //   growth = 300/150 = 2.0 → 20000 (4dp)
    // part 2: prev week $50 < the $100 floor → excluded
    // single-week parts have no prev → excluded
    Seq(
      (1L, 1L, 150.0, ts("2024-01-02 00:00:00")),
      (2L, 1L, 300.0, ts("2024-01-09 00:00:00")),
      (3L, 2L, 50.0, ts("2024-01-02 00:00:00")),
      (4L, 2L, 500.0, ts("2024-01-09 00:00:00")),
      (5L, 3L, 900.0, ts("2024-01-02 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = queries.Commerce.qTrending.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[String]("week"),
        r.getAs[Double]("revenue"), r.getAs[Long]("growth_4dp")))
    assert(out.toSeq == Seq((1L, "2024-01-08", 300.0, 20000L)))
  }

  test("channel revenue: planted first-touch, non-buyer channel, tie by event_id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_chan").toString
    // user 1: first event view -> buys $10 + $20; user 2: first click,
    // never buys; user 3: two events at the SAME ts — event_id 30
    // ("signup") beats 31 ("error"), and user 3 buys $5
    Seq(
      (10L, ts("2024-01-01 08:00:00"), 1L, "view", 0.0, "{}"),
      (11L, ts("2024-01-01 09:00:00"), 1L, "click", 0.0, "{}"),
      (20L, ts("2024-01-02 08:00:00"), 2L, "click", 0.0, "{}"),
      (30L, ts("2024-01-03 08:00:00"), 3L, "signup", 0.0, "{}"),
      (31L, ts("2024-01-03 08:00:00"), 3L, "error", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq((100L, 1L, 10.0, ts("2024-01-05 00:00:00")),
      (101L, 1L, 20.0, ts("2024-01-06 00:00:00")),
      (102L, 3L, 5.0, ts("2024-01-07 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_channel_revenue")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(out == Seq(
      ("click", 1L, 0L, 0L, 0.0),
      ("signup", 1L, 1L, 1L, 5.0),
      ("view", 1L, 1L, 2L, 30.0)))
  }

  test("repeat purchase: planted cadence summary") {
    // c1 orders on days 0/10/20 → gaps {10, 10}; c2 orders once → none
    val dir = plantOrders(Seq(
      (1L, 5.0, ts("2024-01-01 00:00:00")),
      (1L, 5.0, ts("2024-01-11 00:00:00")),
      (1L, 5.0, ts("2024-01-21 00:00:00")),
      (2L, 5.0, ts("2024-01-02 00:00:00"))))
    val r = queries.Commerce.qRepeatPurchase.run(spark, dir).head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4)) == ((1L, 2L, 10.0, 10.0, 10.0)))
  }

  test("repeat purchase over the corpus: gap accounting reconciles") {
    val r = SparkEntry.queries("q_repeat_purchase")(spark, sf).head()
    val orders = Tables.orders(spark, sf)
    val total = orders.count()
    val customers = orders.select("o_custkey").distinct().count()
    // every order after a customer's first contributes exactly one gap
    assert(r.getLong(1) == total - customers)
    assert(r.getLong(0) <= customers)
    assert(r.getDouble(2) <= r.getDouble(3), "p50 must not exceed p90")
  }

  test("RFM over the corpus: scores bounded, cells partition the customers") {
    val rows = SparkEntry.queries("q_rfm")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(r.getLong(0), r.getLong(1), r.getLong(2)).foreach(s =>
        assert(s >= 1 && s <= 4, s"score $s out of range"))
      assert(r.getDouble(4) > 0)
    }
    val customers = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(3)).sum == customers)
  }
}
