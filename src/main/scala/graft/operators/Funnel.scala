package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed sequential funnel over an event log — the step AFTER
  * sessionization that every product-analytics engine ships: of the
  * users who did step 1, how many went on to do step 2 within the
  * conversion window, then step 3, … in timestamp order. The window
  * matters: an unconstrained "ever did B after A" funnel saturates on
  * any long-lived log (every active user eventually does everything);
  * the per-step deadline is what makes the measurement behavioral.
  *
  * Semantics (the standard ordered-funnel definition): a user's step-1
  * time is their FIRST step-1 event; their step-k time is their first
  * step-k event STRICTLY after the step-(k−1) time and within `maxGap`
  * of it. Users are counted once per step they reach; conversion is
  * relative to the step-1 population.
  *
  * Scale shape: one type-pruned scan + hash aggregation per step —
  * the event-type filter reaches the parquet scan (PushedFilters), so
  * each stage reads only its step's rows, not the log. The frontier
  * (user_id, t) shrinks monotonically step over step and joins the next
  * stage on user_id — the same shuffle key every stage, so AQE plans
  * them as co-partitioned exchanges, and a skewed power-user is a
  * single aggregation cell, never a cross product (each stage keeps one
  * row per user). The final per-step counts are K one-row aggregates
  * unioned — the K-row window that derives conversion is driver-trivial
  * by construction, not a scale hazard.
  */
object Funnel {

  /** Per-step reach over `events`.
    *
    * @param events  event log with `userCol`, `typeCol`, `tsCol`
    * @param steps   ordered event types forming the funnel (≥ 1)
    * @param maxGap  per-step conversion deadline, a SQL interval
    *                literal body, e.g. "24 hours"
    * @return one row per step: (step BIGINT, event_type, users BIGINT,
    *         conversion DOUBLE = users / step-1 users, 4 decimals)
    */
  def run(events: DataFrame, steps: Seq[String], maxGap: String,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val gap = expr(s"INTERVAL $maxGap")

    val entry = events.filter(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(tsCol).as("t"))
    // frontier k = users who reached step k, with their step-k time
    val frontiers = steps.tail.scanLeft(entry) { (prev, step) =>
      events.filter(col(typeCol) === step)
        .join(prev.select(col(userCol), col("t").as("pt")), userCol)
        .filter(col(tsCol) > col("pt") && col(tsCol) <= col("pt") + gap)
        .groupBy(userCol).agg(min(tsCol).as("t"))
    }

    val perStep = steps.zip(frontiers).zipWithIndex.map {
      case ((step, frontier), i) =>
        frontier.agg(count(lit(1)).as("users"))
          .select(lit(i + 1L).as("step"), lit(step).as(typeCol),
            col("users"))
    }.reduce(_.union(_))
    // K rows total — the unpartitioned window is over the step count,
    // not the data
    val w = Window.orderBy("step")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perStep
      .withColumn("conversion",
        round(col("users").cast("double") / first("users").over(w), 4))
      .orderBy("step")
  }
}
