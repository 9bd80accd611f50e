package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window-function surface (SURVEY.md §2.3). Every window partitions by a
  * high-cardinality business key (customer / user), never an empty
  * partition spec — a global window is a single-task bottleneck at scale.
  * `events.ts` ns-precision is never emitted raw (SURVEY §7 risk 2).
  */
object Windows {

  val qWinRank = Q(
    "q_win_rank",
    """SELECT o_custkey, o_orderkey,
      |       CAST(row_number() OVER w AS BIGINT) AS rn,
      |       CAST(rank()       OVER w AS BIGINT) AS rnk,
      |       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |       CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
      |       round(percent_rank() OVER w, 4) AS prank
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("bigint").as("rn"),
        rank().over(w).cast("bigint").as("rnk"),
        dense_rank().over(w).cast("bigint").as("drnk"),
        ntile(4).over(w).cast("bigint").as("quartile"),
        round(percent_rank().over(w), 4).as("prank"))
      .orderBy("o_custkey", "rn")
  }

  val qWinLaglead = Q(
    "q_win_laglead",
    """SELECT event_id, user_id, value,
      |       lag(value)  OVER w AS prev_value,
      |       lead(value) OVER w AS next_value,
      |       first_value(event_id) OVER w AS first_eid
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(
        col("event_id"), col("user_id"), col("value"),
        lag("value", 1).over(w).as("prev_value"),
        lead("value", 1).over(w).as("next_value"),
        first("event_id").over(w).as("first_eid"))
      .orderBy("event_id")
  }

  val qWinFrame = Q(
    "q_win_frame",
    """SELECT event_id, user_id,
      |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum,
      |       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3,
      |       count(*) OVER (PARTITION BY user_id ORDER BY value
      |                      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_near
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wv = Window.partitionBy("user_id").orderBy("value").rangeBetween(-5, Window.currentRow)
    Tables.events(s, d)
      .select(
        col("event_id"), col("user_id"),
        round(sum("value").over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
          .as("running_sum"),
        round(avg("value").over(wo.rowsBetween(-2, Window.currentRow)), 4).as("mov_avg3"),
        count(lit(1)).over(wv).as("n_near"))
      .orderBy("event_id")
  }

  /** Per-group top-k via ranking filter — the scalable idiom (each group's
    * k rows resolved inside its partition, no global sort). */
  val qTopkPergroup = Q(
    "q_topk_pergroup",
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Per-group top-k via the native bounded-heap aggregate
    * (graft.functions.TopKPairsAgg): partial aggregation keeps at most k
    * pairs per group per map partition. Catalyst's WindowGroupLimit
    * bounds the window formulation above too (see the TopKPairsAgg
    * scaladoc for the honest comparison); the aggregate form sorts
    * nothing and composes with other aggregates in one groupBy pass.
    * Oracle: identical SQL to q_topk_pergroup — the deterministic
    * (value DESC, id ASC) tie-break makes the two plans bit-equal. */
  val qTopkAgg = Q(
    "q_topk_agg",
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    graft.functions.TopKAggregate.register(s)
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(call_function("top_k_pairs",
        col("o_totalprice"), col("o_orderkey"), lit(3)).as("tk"))
      .select(col("o_custkey"), posexplode(col("tk")))
      .select(
        col("o_custkey"),
        col("col.id").as("o_orderkey"),
        col("col.v").as("o_totalprice"),
        (col("pos") + 1).cast("bigint").as("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** Distribution window functions: cume_dist + nth_value. */
  val qWinDistribution = Q(
    "q_win_distribution",
    """SELECT o_custkey, o_orderkey,
      |       round(cume_dist() OVER w, 4) AS cdist,
      |       nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_best
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(cume_dist().over(w), 4).as("cdist"),
        nth_value(col("o_orderkey"), 2)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("second_best"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val all: Seq[Q] =
    Seq(qWinRank, qWinLaglead, qWinFrame, qTopkPergroup, qTopkAgg, qWinDistribution)
}
