package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
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

  test("funnel: empty step-1 population yields NULL conversion, not NaN") {
    import spark.implicits._
    val ev = Seq((1L, "click", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = operators.Funnel
      .run(ev, Seq("view", "click"), "24 hours").collect()
    assert(out.forall(_.getLong(2) == 0L))
    assert(out.forall(_.isNullAt(3)),
      "conversion over an empty entry population must be NULL")
  }

  test("funnel: malformed maxGap fails fast with a clear message") {
    import spark.implicits._
    val ev = Seq((1L, "view", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    val e = intercept[IllegalArgumentException] {
      operators.Funnel.run(ev, Seq("view"), "24 bananas")
    }
    assert(e.getMessage.contains("maxGap"))
  }

  test("funnel latency: hand-computed p50/p90 on a planted frame") {
    import spark.implicits._
    // three converters with view→click deltas 1h, 2h, 3h:
    // p50 = 7200 s; p90 at position 0.9·(3−1)=1.8 → 7200+0.8·3600 = 10080
    val ev = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 01:00:00")),
      (2L, "view", ts("2024-01-01 00:00:00")),
      (2L, "click", ts("2024-01-01 02:00:00")),
      (3L, "view", ts("2024-01-01 00:00:00")),
      (3L, "click", ts("2024-01-01 03:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = operators.Funnel
      .latency(ev, Seq("view", "click"), "24 hours").collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getString(1), r.getLong(2)) == (2L, "click", 3L))
    assert(r.getDouble(3) == 7200.0, s"p50 was ${r.getDouble(3)}")
    assert(r.getDouble(4) == 10080.0, s"p90 was ${r.getDouble(4)}")
  }

  test("funnel latency rides the same frontier as reach: users match per step") {
    val reach = SparkEntry.queries("q_funnel")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val lat = SparkEntry.queries("q_funnel_latency")(spark, sf).collect()
    assert(lat.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    lat.foreach { r =>
      assert(r.getLong(2) == reach(r.getLong(0)),
        s"latency users at step ${r.getLong(0)} must equal funnel reach")
      if (r.getLong(2) > 0) {
        assert(!r.isNullAt(3) && !r.isNullAt(4))
        assert(r.getDouble(3) <= r.getDouble(4), "p50 must not exceed p90")
        // the deadline bounds every delta, so percentiles too (24h)
        assert(r.getDouble(4) <= 24 * 3600.0)
      }
    }
  }

  test("unordered funnel: order-free within the entry window") {
    import spark.implicits._
    // u1: all three steps within 24h of first (purchase before click —
    // counts in unordered, not in ordered); u2: click then view (2 steps);
    // u3: view, click 25h after entry (only 1 step inside the window)
    val ev = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "purchase", ts("2024-01-01 01:00:00")),
      (1L, "click", ts("2024-01-01 02:00:00")),
      (2L, "click", ts("2024-01-01 00:00:00")),
      (2L, "view", ts("2024-01-01 01:00:00")),
      (3L, "view", ts("2024-01-01 00:00:00")),
      (3L, "click", ts("2024-01-02 01:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = operators.Funnel
      .runUnordered(ev, Seq("view", "click", "purchase"), "24 hours")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, 3L, 1.0),     // u1 u2 u3 all did ≥1 step
      (2L, 2L, 0.6667),  // u1 (3 steps) and u2 (2 steps)
      (3L, 1L, 0.3333))) // only u1
  }

  test("unordered funnel over the corpus: monotone, consistent, wider entry") {
    val ordered = SparkEntry.queries("q_funnel")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rows = SparkEntry.queries("q_funnel_unordered")(spark, sf).collect()
    val unordered = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unordered.keySet == ordered.keySet)
    // entry (step 1): "did any funnel step" is a strict superset of
    // "did a view" — NOTE deeper steps do NOT dominate the ordered
    // funnel (the entry window anchors at the FIRST funnel event, so a
    // user whose early click precedes their view can convert ordered
    // but overrun the unordered window)
    assert(unordered(1L) >= ordered(1L))
    val users = rows.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(users.sliding(2).forall(w => w(0) >= w(1)),
      s"unordered reach must be non-increasing: ${users.toSeq}")
    rows.foreach { r =>
      val expected =
        math.round(r.getLong(1).toDouble / users(0) * 10000) / 10000.0
      assert(r.getDouble(2) == expected,
        s"conversion mismatch at step ${r.getLong(0)}")
    }
  }

  test("one-scan funnel is result-identical to the K-scan plan") {
    // planted edge cases AND the corpus: both formulations implement
    // the same greedy first-qualifying-event semantics
    import spark.implicits._
    val planted = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 23:00:00")),
      (1L, "click", ts("2024-01-02 04:00:00")),
      (1L, "purchase", ts("2024-01-02 22:00:00")),
      (2L, "click", ts("2024-01-01 00:00:00")),
      (2L, "view", ts("2024-01-01 01:00:00")),
      (3L, "view", ts("2024-01-01 00:00:00")),
      (3L, "click", ts("2024-01-02 01:00:00")),
      (4L, "view", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    val steps = Seq("view", "click", "purchase")
    assert(render(operators.Funnel.runOneScan(planted, steps, "24 hours")) ==
      render(operators.Funnel.run(planted, steps, "24 hours")))
    val corpus = Tables.events(spark, sf)
    assert(render(operators.Funnel.runOneScan(corpus, steps, "24 hours")) ==
      render(operators.Funnel.run(corpus, steps, "24 hours")))
  }

  test("funnel auto-dispatch: coverage and skew thresholds pick the right plan") {
    import spark.implicits._
    // 3 step types + 1 noise type, one user with 3 step events: the
    // planted log is 75% step-covered with a cold hottest user
    val planted = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 01:00:00")),
      (1L, "purchase", ts("2024-01-01 02:00:00")),
      (2L, "error", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val steps = Seq("view", "click", "purchase")
    // step-heavy + bounded user -> one-scan
    val (one, p1) = operators.Funnel.runAutoWithPath(planted, steps, "24 hours")
    assert(p1 == "onescan")
    // hot-user bound forced below the user's 3 step events -> K-scan
    val (hot, p2) = operators.Funnel.runAutoWithPath(planted, steps, "24 hours",
      maxUserEvents = 2L)
    assert(p2 == "kscan")
    // coverage threshold forced past 1.0 -> K-scan without paying the
    // per-user probe
    val (_, p3) = operators.Funnel.runAutoWithPath(planted, steps, "24 hours",
      minCoverage = 1.1)
    assert(p3 == "kscan")
    def render(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    assert(render(one) == render(hot))
    // empty log dispatches K-scan (coverage undefined) and stays empty-safe
    val empty = planted.limit(0)
    val (er, p4) = operators.Funnel.runAutoWithPath(empty, steps, "24 hours")
    assert(p4 == "kscan")
    assert(er.collect().forall(_.getLong(2) == 0L))
  }

  test("linear attribution: remainder to first touch, mass exactly conserved") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_linattr").toString
    // user 1: view, click, view before purchase — n=3: each touch gets
    // 3333, remainder 1 to the FIRST view -> view 6667, click 3333;
    // user 2: single error touch -> 10000; user 3: purchase with no
    // prior touches -> no journey, no credit
    Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0, "{}"),
      (2L, ts("2024-01-01 01:00:00"), 1L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 02:00:00"), 1L, "view", 0.0, "{}"),
      (4L, ts("2024-01-01 03:00:00"), 1L, "purchase", 0.0, "{}"),
      (5L, ts("2024-01-02 00:00:00"), 2L, "error", 0.0, "{}"),
      (6L, ts("2024-01-02 01:00:00"), 2L, "purchase", 0.0, "{}"),
      (7L, ts("2024-01-03 00:00:00"), 3L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_attribution_linear")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("click", 3333L), ("error", 10000L), ("view", 6667L)))
    assert(out.map(_._2).sum == 20000L) // 2 journeys x 10000, exactly
    // corpus-wide conservation: total credit == 10000 x journey count
    val corpus = SparkEntry.queries("q_attribution_linear")(spark, sf)
      .agg(sum("credit_1e4")).head().getLong(0)
    val ev = Tables.events(spark, sf)
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("ts").as("pts"))
    val journeys = ev.join(fp, "user_id")
      .filter(col("ts") < col("pts") && col("event_type") =!= "purchase")
      .select("user_id").distinct().count()
    assert(corpus == 10000L * journeys, s"$corpus != 10000 x $journeys")
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

  test("weekly retention: offset-0 is 1.0, curve is the size-weighted cross-cohort ratio") {
    val rows = SparkEntry.queries("q_retention_weekly")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val size = rows.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    assert(rows.map(_._1).toSet == size.keySet)
    rows.foreach { case (week, off, users, ret, _) =>
      assert(users <= size(week), s"cohort $week offset $off: $users > size")
      if (off == 0L) assert(ret == 1.0)
      assert(ret > 0 && ret <= 1.0)
    }
    // curve at each offset = Σusers / Σsizes over the cohorts with a row
    // there (and therefore identical across those rows)
    rows.groupBy(_._2).foreach { case (off, rs) =>
      val expected = math.round(rs.map(_._3).sum.toDouble
        / rs.map(r => size(r._1)).sum * 10000) / 10000.0
      rs.foreach { r =>
        assert(r._5 == expected, s"curve at offset $off: ${r._5} != $expected")
      }
    }
    // weekly cohorts partition the user base exactly like daily ones
    val totalUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(size.values.sum == totalUsers)
  }

  test("active users: hand-computed DAU/WAU on a planted frame") {
    import spark.implicits._
    // u1 active day1+day3, u2 active day1 only; observed range ends day3
    val ev = Seq(
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (1L, 2L, "view", ts("2024-01-01 11:00:00")),
      (2L, 1L, "view", ts("2024-01-01 12:00:00")), // same user+day dedups
      (3L, 1L, "view", ts("2024-01-03 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val q = queries.EventAnalytics.qActiveUsers
    // build against a temp dir holding just this events table
    val dir = java.nio.file.Files.createTempDirectory("graft_dau").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = q.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // day1: DAU {u1,u2}=2, WAU(window ending day1)={u1,u2}=2
    // day2: no DAU row (no activity) — only observed-active days report
    // day3: DAU {u1}=1, WAU(days −3..3 clipped)= {u1,u2} = 2
    assert(out.toSeq == Seq(
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-03", 1L, 2L, 0.5)))
  }

  test("active users over the corpus: WAU dominates DAU, stickiness in (0,1]") {
    val rows = SparkEntry.queries("q_active_users")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"day ${r.getString(0)}: WAU ${r.getLong(2)} < DAU ${r.getLong(1)}")
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
    }
    // every observed-active day reports exactly once
    val days = Tables.events(spark, sf)
      .select(to_date(date_trunc("day", col("ts")))).distinct().count()
    assert(rows.length == days)
  }

  test("active users on an empty log: empty summary, correct schema, no NPE") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dau_empty").toString
    Seq.empty[(Long, Long, String, Timestamp)]
      .toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val exact = queries.EventAnalytics.qActiveUsers.run(spark, dir)
    val sketch = queries.EventAnalytics.qActiveUsersSketch.run(spark, dir)
    assert(exact.columns.toSeq == Seq("day", "dau", "wau", "stickiness"))
    assert(sketch.columns.toSeq == Seq("day", "dau_est", "wau_est"))
    assert(exact.count() == 0 && sketch.count() == 0)
  }

  test("event transitions: planted chain counts and shares") {
    import spark.implicits._
    // u1: a→b→a ; u2: a→b. Transitions: a→b ×2, b→a ×1.
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 00:00:00")),
      (2L, 1L, "b", ts("2024-01-01 00:01:00")),
      (3L, 1L, "a", ts("2024-01-01 00:02:00")),
      (4L, 2L, "a", ts("2024-01-01 00:00:30")),
      (5L, 2L, "b", ts("2024-01-01 00:01:30"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft_trans").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = queries.EventAnalytics.qEventTransitions.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("event transitions over the corpus: totals and shares reconcile") {
    val rows = SparkEntry.queries("q_event_transitions")(spark, sf).collect()
    assert(rows.nonEmpty)
    // Σ transitions = Σ_users (events_u − 1)
    val perUser = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n")).agg(sum(col("n") - 1)).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum == perUser,
      "transition count must equal events minus one per user")
    // per-source shares sum to 1 (up to the 4-decimal rounding per row)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 0.001 * rs.length,
        s"shares for $src sum to $s")
    }
  }

  test("session stats: hand-computed counts and percentiles on a planted frame") {
    import spark.implicits._
    // u1: two sessions (gap 45m splits) of durations 600s and 0s;
    // u2: one session of 1800s. sessions=3, durations sorted {0,600,1800}
    // p50=600, p90 at 0.9*2=1.8 → 600+0.8*1200=1560; avg events = 5/3
    val ev = Seq(
      (1L, 1L, "view", ts("2024-01-01 00:00:00")),
      (2L, 1L, "view", ts("2024-01-01 00:10:00")),
      (3L, 1L, "view", ts("2024-01-01 01:00:00")), // 50m gap → new session
      (4L, 2L, "view", ts("2024-01-01 00:00:00")),
      (5L, 2L, "view", ts("2024-01-01 00:30:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = queries.EventAnalytics.qSessionStats.run(spark, dir).head()
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 600.0, s"p50 was ${r.getDouble(1)}")
    assert(r.getDouble(2) == 1560.0, s"p90 was ${r.getDouble(2)}")
    assert(r.getDouble(3) == math.round(5.0 / 3 * 10000) / 10000.0)
  }

  test("session boundary: exactly-30:00 gap stays one session; +1µs splits") {
    // THE sessionizer definition (EventAnalytics.sessionized, shared
    // with the oracle CTEs and q_event_paths): a session breaks only
    // when the gap STRICTLY exceeds 30 minutes — the measure-zero
    // boundary the round-13 advice flagged as divergent under the old
    // session_window formulation, pinned here on both sides of it
    import spark.implicits._
    def sessions(second: String): Long = {
      val dir = java.nio.file.Files.createTempDirectory("graft_sessb").toString
      Seq((1L, 1L, "view", ts("2024-01-01 00:00:00")),
          (2L, 1L, "view", ts(second)))
        .toDF("event_id", "user_id", "event_type", "ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      queries.EventAnalytics.qSessionStats.run(spark, dir).head().getLong(0)
    }
    assert(sessions("2024-01-01 00:30:00") == 1L)
    assert(sessions("2024-01-01 00:30:00.000001") == 2L)
  }

  test("anomaly z-score: planted spike flags, flat series and warm-up stay quiet") {
    import spark.implicits._
    // series a: 14 flat hours then a 10x spike → flags at hour 14;
    // series b: spike at hour 3 but only 4 observations → warm-up guard
    // (n < 12) suppresses it; the flat prefix of a never flags (dev = 0)
    val rows =
      (0 to 13).map(h => (h.toLong, 1L, "a", ts(f"2024-01-01 $h%02d:10:00"), 10.0)) ++
      Seq((14L, 1L, "a", ts("2024-01-01 14:10:00"), 100.0)) ++
      (0 to 2).map(h => (20L + h, 1L, "b", ts(f"2024-01-01 $h%02d:10:00"), 10.0)) ++
      Seq((23L, 1L, "b", ts("2024-01-01 03:10:00"), 100.0))
    val ev = rows.toDF("event_id", "user_id", "event_type", "ts", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_anom").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = queries.EventAnalytics.qAnomalyZscore.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.substring(11, 13),
        r.getDouble(2)))
    assert(out.toSeq == Seq(("a", "14", 100.0)))
  }

  test("anomaly z-score over the corpus: flags are rare and every flag deviates") {
    val flags = SparkEntry.queries("q_anomaly_zscore")(spark, sf).collect()
    val buckets = Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("hour", col("ts"))).distinct().count()
    assert(flags.nonEmpty, "3-sigma flags should exist on a Poisson-ish log")
    assert(flags.length < buckets / 20,
      s"${flags.length} of $buckets buckets flagged — 3-sigma should be rare")
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

  test("event paths: planted sessions produce ordered ≤3-step path strings") {
    import spark.implicits._
    // u1: a,b,c,d inside one session (the d is truncated past depth 3),
    // then a >30min gap opens a second session holding just b;
    // u2: a,b in one session.
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 00:00:00")),
      (2L, 1L, "b", ts("2024-01-01 00:05:00")),
      (3L, 1L, "c", ts("2024-01-01 00:10:00")),
      (4L, 1L, "d", ts("2024-01-01 00:15:00")),
      (5L, 1L, "b", ts("2024-01-01 01:00:00")),
      (6L, 2L, "a", ts("2024-01-01 00:00:00")),
      (7L, 2L, "b", ts("2024-01-01 00:20:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft_paths").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = queries.EventAnalytics.qEventPaths.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("a>b", 1L, 0.3333), ("a>b>c", 1L, 0.3333), ("b", 1L, 0.3333)))
  }

  test("event paths over the corpus: shares reconcile, depth bounded") {
    val rows = SparkEntry.queries("q_event_paths")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0).split(">").length <= 3)
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1.0)
    }
    // Σ path sessions = the engagement summary's session count — the
    // gaps-and-islands numbering and session_window agree (parity
    // already pinned by q_stream_session's oracle hash)
    val sessions = SparkEntry.queries("q_session_stats")(spark, sf)
      .head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == sessions)
  }

  test("attribution: planted journeys pick first and last pre-purchase touch") {
    import spark.implicits._
    // u1: signup, view, click, purchase, view — the trailing view is
    // after the purchase and must not count; first=signup, last=click.
    // u2: view, purchase → view is both first and last touch.
    // u3: purchase only → no journey, excluded from both roles.
    val ev = Seq(
      (1L, 1L, "signup", ts("2024-01-01 00:00:00")),
      (2L, 1L, "view", ts("2024-01-01 00:10:00")),
      (3L, 1L, "click", ts("2024-01-01 00:20:00")),
      (4L, 1L, "purchase", ts("2024-01-01 00:30:00")),
      (5L, 1L, "view", ts("2024-01-01 00:40:00")),
      (6L, 2L, "view", ts("2024-01-01 00:00:00")),
      (7L, 2L, "purchase", ts("2024-01-01 00:10:00")),
      (8L, 3L, "purchase", ts("2024-01-01 00:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft_attr").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = queries.EventAnalytics.qAttribution.run(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("first", "signup", 1L, 0.5), ("first", "view", 1L, 0.5),
      ("last", "click", 1L, 0.5), ("last", "view", 1L, 0.5)))
  }

  test("experiment lift over the corpus: arm accounting reconciles, deterministic") {
    val q = SparkEntry.queries("q_experiment_lift")
    val r = q(spark, sf).head()
    val ev = Tables.events(spark, sf).filter(col("event_type") === "purchase")
    val purchasers = ev.select("user_id").distinct().count()
    val purchases = ev.count()
    assert(r.getLong(0) + r.getLong(2) == purchasers,
      "arms must partition the purchasing users")
    assert(r.getLong(1) + r.getLong(3) == purchases,
      "arm purchase totals must sum to the corpus total")
    assert(r.getDouble(4) > 0 && r.getDouble(5) > 0)
    // assignment is a pure function of user_id: a second run is
    // bit-identical (the property RNG bucketing lacks)
    assert(q(spark, sf).head().toString == r.toString)
  }

  test("experiment lift on a purchase-free log: null row, no divide error") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ab_empty").toString
    Seq((1L, 1L, "view", ts("2024-01-01 00:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = queries.EventAnalytics.qExperimentLift.run(spark, dir).head()
    // no arm exists: every stat must be NULL (never an ANSI divide error)
    assert((0 until r.length).forall(r.isNullAt))
  }

  test("attribution over the corpus: both roles cover the same journeys") {
    val rows = SparkEntry.queries("q_attribution")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byTouch = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    // first and last pick exactly one event per attributed journey
    assert(byTouch("first") == byTouch("last"))
    // journeys = users owning a purchase preceded by a non-purchase event
    val ev = Tables.events(spark, sf)
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("ts").as("pts"))
    val journeys = ev.join(fp, "user_id")
      .filter(col("ts") < col("pts") && col("event_type") =!= "purchase")
      .select("user_id").distinct().count()
    assert(byTouch("first") == journeys)
  }
}
