package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event log onto a fixed-step
  * time spine (one row per series per bucket, gaps included) and
  * forward-fill the holes — the prerequisite for any downstream
  * windowed model (anomaly scoring, rate-of-change, seasonal joins)
  * that assumes a dense, evenly-spaced series. Gaps stay observable
  * (`observed` is NULL exactly where the log had no rows) so "carried"
  * and "measured" values are never conflated downstream.
  *
  * Scale shape: the observation aggregate is a map-side-combined hash
  * agg on (series, bucket) — the only full-data pass. The spine is
  * generated from the 1-row min/max frame via `sequence` + `explode`
  * (|buckets| rows — a decade of hours is 87k rows, driver-free and
  * tiny at any corpus size) and cross-joined with the broadcast series
  * list, so densification never shuffles the log. The forward fill is
  * a running `last(ignoreNulls)` window PARTITIONED BY series —
  * parallelism is the series count, the inherent grain of a sequential
  * carry; a single pathological series spanning decades is |buckets|
  * rows per task, bounded by calendar time, not data volume (for the
  * one-series case the two-pass segmented carry in [[CumSum]]'s style
  * is the escape hatch).
  */
object TimeSeriesFill {

  /** Hourly resample + forward fill of `sum(valueCol)` per series.
    *
    * @return (series, hour, observed, filled) — `observed` is the
    *         rounded hourly sum or NULL for a gap; `filled` carries the
    *         last observation forward (NULL only before a series'
    *         first observation).
    */
  def hourly(events: DataFrame, seriesCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val obs = events
      .groupBy(col(seriesCol), date_trunc("hour", col(tsCol)).as("h"))
      .agg(round(sum(valueCol), 4).as("sum_val"))
    val bounds = events.agg(
      date_trunc("hour", min(tsCol)).as("lo"),
      date_trunc("hour", max(tsCol)).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("h"))
    val series = events.select(seriesCol).distinct()
    val w = Window.partitionBy(seriesCol).orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.crossJoin(broadcast(series))
      .join(obs, Seq(seriesCol, "h"), "left")
      .select(col(seriesCol), col("h").as("hour"),
        col("sum_val").as("observed"),
        last("sum_val", ignoreNulls = true).over(w).as("filled"))
  }
}
