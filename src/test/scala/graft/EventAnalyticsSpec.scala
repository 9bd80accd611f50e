package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral-analytics invariants (funnel ordering + deadline, cohort
  * retention accounting, time-series fill carry semantics) on planted
  * frames where the expected answer is computable by hand, plus
  * structural checks over the real corpus keys. */
class EventAnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: ordering and per-step deadline are both enforced") {
    import spark.implicits._
    // u1 converts fully in order; u2 clicks BEFORE viewing (ordering
    // violation); u3 clicks 25h after viewing (deadline violation);
    // u4 views only. Window = 24h.
    val ev = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 01:00:00")),
      (1L, "purchase", ts("2024-01-01 02:00:00")),
      (2L, "click", ts("2024-01-01 00:00:00")),
      (2L, "view", ts("2024-01-01 01:00:00")),
      (3L, "view", ts("2024-01-01 00:00:00")),
      (3L, "click", ts("2024-01-02 01:00:00")),
      (4L, "view", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = operators.Funnel
      .run(ev, Seq("view", "click", "purchase"), "24 hours")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, "view", 4L, 1.0),     // u1 u2 u3 u4
      (2L, "click", 1L, 0.25),   // only u1: u2 out of order, u3 too late
      (3L, "purchase", 1L, 0.25)))
  }

  test("funnel: step time is the FIRST qualifying event, restarting the clock") {
    import spark.implicits._
    // u1's first click is 23h after the view — inside the window — so
    // the purchase deadline runs from THAT click, not the later one;
    // the purchase at click+23h lands inside it.
    val ev = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 23:00:00")),
      (1L, "click", ts("2024-01-02 04:00:00")),
      (1L, "purchase", ts("2024-01-02 22:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = operators.Funnel
      .run(ev, Seq("view", "click", "purchase"), "24 hours")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("funnel over the corpus: monotone non-increasing reach, conversion consistent") {
    val rows = SparkEntry.queries("q_funnel")(spark, sf).collect()
    assert(rows.length == 3)
    val users = rows.map(_.getLong(2))
    assert(users.sliding(2).forall(w => w(0) >= w(1)),
      s"funnel reach must be non-increasing: ${users.toSeq}")
    rows.foreach { r =>
      val expected = math.round(r.getLong(2).toDouble / users(0) * 10000) / 10000.0
      assert(r.getDouble(3) == expected, s"conversion mismatch at step ${r.getLong(0)}")
    }
  }

  test("retention cohort: offset-0 retention is 1.0 and users never exceed cohort size") {
    val rows = SparkEntry.queries("q_retention_cohort")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val size = rows.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    // every cohort present at offset 0 (its own founding day) by definition
    assert(rows.map(_._1).toSet == size.keySet)
    rows.foreach { case (day, off, users, ret) =>
      assert(users <= size(day), s"cohort $day offset $off: $users > size")
      if (off == 0L) assert(ret == 1.0)
      assert(ret > 0 && ret <= 1.0)
    }
    // total distinct users across offset-0 cohorts == distinct users in the log
    val totalUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(size.values.sum == totalUsers,
      "offset-0 cohort sizes must partition the user base")
  }

  test("timeseries fill: planted gap carries the last observation, leading gap stays null") {
    import spark.implicits._
    // series A: hours 0,1,3 observed (gap at 2); series B first observed
    // at hour 2 (leading gap at 0,1). Spine = hours 0..3.
    val ev = Seq(
      ("A", ts("2024-01-01 00:10:00"), 1.0),
      ("A", ts("2024-01-01 01:10:00"), 2.0),
      ("A", ts("2024-01-01 03:10:00"), 4.0),
      ("B", ts("2024-01-01 02:10:00"), 9.0),
      ("B", ts("2024-01-01 03:10:00"), 8.0)
    ).toDF("event_type", "ts", "value")
    val out = operators.TimeSeriesFill.hourly(ev, "event_type", "ts", "value")
      .orderBy("event_type", "hour").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.substring(11, 13),
        Option(r.get(2)), Option(r.get(3))))
    assert(out.toSeq == Seq(
      ("A", "00", Some(1.0), Some(1.0)),
      ("A", "01", Some(2.0), Some(2.0)),
      ("A", "02", None, Some(2.0)),      // gap carried
      ("A", "03", Some(4.0), Some(4.0)),
      ("B", "00", None, None),           // before first observation
      ("B", "01", None, None),
      ("B", "02", Some(9.0), Some(9.0)),
      ("B", "03", Some(8.0), Some(8.0))))
  }

  test("timeseries fill over the corpus: dense grid, observed sums preserved") {
    val rows = SparkEntry.queries("q_timeseries_fill")(spark, sf).collect()
    val types = rows.map(_.getString(0)).distinct
    assert(rows.length % types.length == 0,
      "grid must be exactly series x spine")
    val perType = rows.groupBy(_.getString(0)).values.map(_.length).toSet
    assert(perType.size == 1, s"unequal spine lengths: $perType")
    // fill never invents values: filled is null only in a leading gap,
    // and equals the most recent non-null observed otherwise
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      var lastVal: Option[Double] = None
      rs.sortBy(_.getTimestamp(1).getTime).foreach { r =>
        if (!r.isNullAt(2)) lastVal = Some(r.getDouble(2))
        assert(Option(r.get(3)).map(_.asInstanceOf[Double]) == lastVal)
      }
    }
  }
}
