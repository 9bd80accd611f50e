package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Streaming-shaped time windowing over `events` (SURVEY.md §2.3
  * "Streaming"): implemented batch-first with the exact `window()` /
  * `session_window()` expressions that lift unchanged onto
  * `spark.readStream` (see graft.streaming.Streams), so the DuckDB
  * oracle can check the semantics here.
  *
  * Scale stance: tumbling/sliding aggregation is a hash agg keyed on
  * (bucket, type) — partial aggregation map-side, tiny shuffle; session
  * windows shuffle once on user_id. `ts` arrives as NTZ micros
  * (Tables.events) and only truncated/derived values are emitted.
  */
object TimeWindows {

  val qStreamTumbling = Q(
    "q_stream_tumbling",
    // time_bucket's sub-day origin (2000-01-01) is epoch-aligned for
    // divisors of a day, matching Spark window()'s epoch alignment.
    """SELECT CAST(time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS wstart,
      |       event_type, count(*) AS n, round(sum(value), 4) AS sum_val
      |FROM events
      |GROUP BY wstart, event_type
      |ORDER BY wstart, event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_val"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sum_val"))
      .orderBy("wstart", "event_type")
  }

  val qStreamSliding = Q(
    "q_stream_sliding",
    // Sliding (width 10m, slide 5m): every event belongs to exactly 2
    // windows — start ∈ {bucket5(ts), bucket5(ts) − 5m}.
    """WITH expanded AS (
      |  SELECT CAST(time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
      |           - k.k * INTERVAL '5 minutes' AS wstart,
      |         value
      |  FROM events, range(0, 2) k(k))
      |SELECT wstart, count(*) AS n, round(sum(value), 4) AS sum_val
      |FROM expanded
      |GROUP BY wstart
      |ORDER BY wstart""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_val"))
      .select(col("w.start").as("wstart"), col("n"), col("sum_val"))
      .orderBy("wstart")
  }

  val qStreamSession = Q(
    "q_stream_session",
    // Oracle: classic gaps-and-islands — a new session starts when the
    // gap from the previous event of the same user exceeds 30 minutes.
    """WITH flagged AS (
      |  SELECT user_id, ts, value, event_id,
      |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                   > INTERVAL '30 minutes'
      |              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |numbered AS (
      |  SELECT user_id, ts, value,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM flagged)
      |SELECT user_id,
      |       CAST(date_trunc('second', min(ts)) AS TIMESTAMP) AS session_start,
      |       count(*) AS n, round(sum(value), 4) AS sum_val
      |FROM numbered
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_val"))
      .select(
        col("user_id"),
        // session_window coerces NTZ event time to LTZ — cast back so the
        // emitted value is naive like every other timestamp output
        date_trunc("second", col("w.start")).cast("timestamp_ntz").as("session_start"),
        col("n"), col("sum_val"))
      .orderBy("user_id", "session_start")
  }

  /** Stateful-dedup surface: batch twin of streaming
    * `dropDuplicates("event_id")` (graft.streaming.Streams lifts it). */
  val qDedup = Q(
    "q_dedup",
    """SELECT event_id, user_id, event_type FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .dropDuplicates("event_id")
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")
  }

  /** Keyed dedup keeping the earliest row per (user, type) — the
    * deterministic form of `dropDuplicates(keys)` (which keeps an
    * arbitrary row), expressed as a ranking filter. */
  val qDedupKeyed = Q(
    "q_dedup_keyed",
    """SELECT user_id, event_type, event_id AS first_event_id, n FROM (
      |  SELECT user_id, event_type, event_id, ts,
      |         row_number() OVER (PARTITION BY user_id, event_type
      |                            ORDER BY ts, event_id) AS rn,
      |         count(*) OVER (PARTITION BY user_id, event_type) AS n
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    val wAll = Window.partitionBy("user_id", "event_type")
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"), col("n"))
      .orderBy("user_id", "event_type")
  }

  val all: Seq[Q] =
    Seq(qStreamTumbling, qStreamSliding, qStreamSession, qDedup, qDedupKeyed)
}
