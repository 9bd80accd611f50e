package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Behavioral event analytics over `events` — the product-analytics
  * staples (ordered funnels, cohort retention, time-series
  * regularization) that sit one layer above the raw windowed aggregates
  * in TimeWindows: same table, but the unit of analysis is the USER (or
  * the series), not the event.
  *
  * Scale stance: every key shuffles on its analysis key (user_id /
  * series) exactly once per logical pass, with event-type filters
  * pushed into the scan; the cohort and funnel summary frames are
  * calendar- or step-bounded (days² / K rows), never corpus-sized, so
  * the small derived joins stay broadcastable at any SF.
  */
object EventAnalytics {

  /** Windowed ordered funnel view → click → purchase: each step must
    * happen strictly after the previous step's time and within 24 h of
    * it (the deadline is what keeps a long log from saturating the
    * funnel — see operators/Funnel). */
  val qFunnel = Q(
    "q_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN v USING (user_id)
      |      WHERE e.event_type = 'click'
      |        AND e.ts > v.t AND e.ts <= v.t + INTERVAL 24 HOUR GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN c USING (user_id)
      |      WHERE e.event_type = 'purchase'
      |        AND e.ts > c.t AND e.ts <= c.t + INTERVAL 24 HOUR GROUP BY 1),
      |steps AS (
      |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
      |         count(*) AS users FROM v
      |  UNION ALL SELECT 2, 'click', count(*) FROM c
      |  UNION ALL SELECT 3, 'purchase', count(*) FROM p)
      |SELECT step, event_type, users,
      |       round(CAST(users AS DOUBLE)
      |         / first_value(users) OVER (ORDER BY step
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
      |         AS conversion
      |FROM steps ORDER BY step""".stripMargin) { (s, d) =>
    graft.operators.Funnel.run(Tables.events(s, d),
      Seq("view", "click", "purchase"), maxGap = "24 hours")
  }

  /** Daily cohort retention: users grouped by the day of their first
    * event; for each (cohort, day offset), how many came back, and what
    * share of the cohort that is. The cohort×offset summary is bounded
    * by calendar days squared — the cohort-size join is over that tiny
    * frame, never the log. */
  val qRetentionCohort = Q(
    "q_retention_cohort",
    """WITH first AS (
      |  SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
      |  FROM events GROUP BY 1),
      |act AS (
      |  SELECT DISTINCT f.cohort_day,
      |         date_diff('day', f.cohort_day,
      |                   CAST(date_trunc('day', e.ts) AS DATE)) AS day_offset,
      |         e.user_id
      |  FROM events e JOIN first f USING (user_id)),
      |counts AS (SELECT cohort_day, day_offset, count(*) AS users
      |           FROM act GROUP BY 1, 2),
      |sizes AS (SELECT cohort_day, users AS cohort_size FROM counts
      |          WHERE day_offset = 0)
      |SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
      |       CAST(c.day_offset AS BIGINT) AS day_offset, c.users,
      |       round(CAST(c.users AS DOUBLE) / s.cohort_size, 4) AS retention
      |FROM counts c JOIN sizes s USING (cohort_day)
      |ORDER BY cohort_day, day_offset""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val first = ev.groupBy("user_id")
      .agg(to_date(date_trunc("day", min("ts"))).as("cohort_day"))
    val act = ev.join(first, "user_id")
      .select(col("cohort_day"),
        datediff(to_date(date_trunc("day", col("ts"))), col("cohort_day"))
          .cast("bigint").as("day_offset"),
        col("user_id"))
      .distinct()
    val counts = act.groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("users"))
    val sizes = counts.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("users").as("cohort_size"))
    counts.join(broadcast(sizes), "cohort_day")
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("users"),
        round(col("users").cast("double") / col("cohort_size"), 4)
          .as("retention"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Hourly resample of per-type value sums onto a dense spine with
    * forward fill (operators/TimeSeriesFill): gaps become explicit NULL
    * observations and `filled` carries the last value across them. */
  val qTimeseriesFill = Q(
    "q_timeseries_fill",
    """WITH bounds AS (SELECT date_trunc('hour', min(ts)) AS lo,
      |                       date_trunc('hour', max(ts)) AS hi FROM events),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      |          FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM events),
      |obs AS (SELECT event_type, date_trunc('hour', ts) AS h,
      |               round(sum(value), 4) AS sum_val
      |        FROM events GROUP BY 1, 2),
      |grid AS (SELECT t.event_type, s.h, o.sum_val
      |         FROM spine s CROSS JOIN types t
      |         LEFT JOIN obs o ON o.event_type = t.event_type AND o.h = s.h)
      |SELECT event_type, CAST(h AS TIMESTAMP) AS hour, sum_val AS observed,
      |       last_value(sum_val IGNORE NULLS) OVER (PARTITION BY event_type
      |         ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS filled
      |FROM grid ORDER BY event_type, hour""".stripMargin) { (s, d) =>
    graft.operators.TimeSeriesFill
      .hourly(Tables.events(s, d), "event_type", "ts", "value")
      .orderBy("event_type", "hour")
  }

  val all: Seq[Q] = Seq(qFunnel, qRetentionCohort, qTimeseriesFill)
}
