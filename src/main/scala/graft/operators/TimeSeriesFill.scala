package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

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
  * generated from the collected min/max bounds via `sequence` +
  * `explode` (|buckets| rows — a decade of hours is 87k rows, tiny at
  * any corpus size) and cross-joined with the broadcast series list, so
  * densification never shuffles the log.
  *
  * The forward fill dispatches on the grid's shape (round-12 verdict
  * item #2 — the `Relations.discoverAuto` pattern applied here):
  *   - the DEFAULT carry is a running `last(ignoreNulls)` window
  *     PARTITIONED BY series — parallelism is the series count, the
  *     inherent grain of a sequential carry, which is the right plan
  *     whenever series ≥ cores;
  *   - the DEGENERATE shape (fewer series than cores AND a long spine —
  *     one sensor, decades of hours) would funnel the whole grid
  *     through ≤series tasks, so it switches to the [[CumSum]]-style
  *     two-pass segmented carry: range-partition the grid on
  *     (series, bucket), pass 1 collects each partition's last
  *     observation per series (≤ partitions × series rows — driver-safe
  *     BY the dispatch condition), pass 2 replays each partition
  *     seeding its per-series state from the exclusive prefix. Same
  *     output bit-for-bit (`q_gate_fill_dispatch` pins it); measured
  *     5.9x vs 33.5x at 100x span in SCALING.md's running-total rows.
  */
object TimeSeriesFill {

  /** Spine length (buckets) above which the few-series shape switches
    * to the segmented carry: below this, the windowed carry's ≤series
    * tasks each hold a short spine and the two extra narrow passes are
    * pure overhead. 8192 hours ≈ 11 months. */
  val DefaultSegmentedMinSpine: Long = 8192L

  /** Hourly resample + forward fill of `sum(valueCol)` per series.
    *
    * @return (series, hour, observed, filled) — `observed` is the
    *         rounded hourly sum or NULL for a gap; `filled` carries the
    *         last observation forward (NULL only before a series'
    *         first observation).
    */
  def hourly(events: DataFrame, seriesCol: String, tsCol: String,
      valueCol: String,
      segmentedMinSpine: Long = DefaultSegmentedMinSpine): DataFrame =
    hourlyWithPath(events, seriesCol, tsCol, valueCol, segmentedMinSpine)._1

  /** [[hourly]] plus which carry path the dispatch chose —
    * "windowed" | "segmented" | "empty" — so the dispatch contract is
    * testable without reflecting on the plan. */
  def hourlyWithPath(events: DataFrame, seriesCol: String, tsCol: String,
      valueCol: String,
      segmentedMinSpine: Long = DefaultSegmentedMinSpine): (DataFrame, String) = {
    val spark = events.sparkSession
    val obs = events
      .groupBy(col(seriesCol), date_trunc("hour", col(tsCol)).as("h"))
      .agg(round(sum(valueCol), 4).as("sum_val"))
    val boundsRow = events.agg(
      date_trunc("hour", min(tsCol)).as("lo"),
      date_trunc("hour", max(tsCol)).as("hi")).head()
    if (boundsRow.isNullAt(0))
      // empty log → empty grid under the output schema
      return (obs.select(col(seriesCol), col("h").as("hour"),
        col("sum_val").as("observed"), col("sum_val").as("filled"))
        .limit(0), "empty")
    val (lo, hi) = (boundsRow.get(0), boundsRow.get(1))
    def epochMs(v: Any): Long = v match {
      case t: java.sql.Timestamp => t.getTime
      case d: java.time.LocalDateTime =>
        d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case i: java.time.Instant => i.toEpochMilli
      case other => sys.error(s"unexpected hour-bucket type: $other")
    }
    val spineLen = (epochMs(hi) - epochMs(lo)) / 3600000L + 1
    val spine = spark.range(1).select(
      explode(sequence(lit(lo), lit(hi), expr("INTERVAL 1 HOUR"))).as("h"))
    // the series list doubles as the dispatch signal: checkpoint so the
    // count and the grid build pay the distinct once
    val series = events.select(seriesCol).distinct().localCheckpoint(true)
    val nSeries = series.count()
    val grid = spine.crossJoin(broadcast(series))
      .join(obs, Seq(seriesCol, "h"), "left")
    val degenerate = nSeries < spark.sparkContext.defaultParallelism &&
      spineLen >= segmentedMinSpine
    if (degenerate) (segmentedFill(grid, seriesCol), "segmented")
    else (windowedFill(grid, seriesCol), "windowed")
  }

  /** The default carry: running last-non-null window per series. */
  private def windowedFill(grid: DataFrame, seriesCol: String): DataFrame = {
    val w = Window.partitionBy(seriesCol).orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.select(col(seriesCol), col("h").as("hour"),
      col("sum_val").as("observed"),
      last("sum_val", ignoreNulls = true).over(w).as("filled"))
  }

  /** Two-pass segmented carry (CumSum's shape, carrying "last non-null
    * per series" instead of a sum): parallelism is the partition count,
    * not the series count. Pass-1 output is ≤ partitions × series rows
    * — the dispatch condition (series < cores) is what makes the
    * driver collect and the per-task prefix maps trivially small. */
  private def segmentedFill(grid: DataFrame, seriesCol: String): DataFrame = {
    val parted = grid
      .repartitionByRange(col(seriesCol), col("h"))
      .sortWithinPartitions(col(seriesCol), col("h"))
      .localCheckpoint(true) // both passes replay the same partitions
    val sIdx = parted.schema.fieldIndex(seriesCol)
    val vIdx = parted.schema.fieldIndex("sum_val")
    val tailSchema = StructType(Seq(
      StructField("pid", IntegerType),
      StructField("series", parted.schema(sIdx).dataType),
      StructField("v", DoubleType)))
    // pass 1: last observation per series per partition (narrow)
    val tails = parted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val last = scala.collection.mutable.LinkedHashMap.empty[Any, Double]
      it.foreach { r =>
        if (!r.isNullAt(vIdx)) last(r.get(sIdx)) = r.getDouble(vIdx)
      }
      last.iterator.map { case (s, v) => Row(pid, s, v) }
    }(Encoders.row(tailSchema)).collect()
    // exclusive prefix per partition: the carry-in value each series
    // enters partition p with (sorted grid → earlier partitions hold
    // strictly earlier (series, hour) cells)
    val nParts = parted.rdd.getNumPartitions
    val byPid = tails.groupBy(_.getInt(0))
    val carry = Array.fill(nParts)(Map.empty[Any, Double])
    var running = Map.empty[Any, Double]
    (0 until nParts).foreach { p =>
      carry(p) = running
      byPid.getOrElse(p, Array.empty[Row]).foreach(r =>
        running += (r.get(1) -> r.getDouble(2)))
    }
    // pass 2: replay each partition seeding from its prefix (narrow)
    val outSchema = StructType(
      parted.schema.fields :+ StructField("filled", DoubleType))
    parted.mapPartitions { it =>
      val state = scala.collection.mutable.Map[Any, Double](
        carry(TaskContext.getPartitionId()).toSeq: _*)
      it.map { r =>
        val s = r.get(sIdx)
        if (!r.isNullAt(vIdx)) state(s) = r.getDouble(vIdx)
        Row.fromSeq(r.toSeq :+ state.get(s).map(Double.box).orNull)
      }
    }(Encoders.row(outSchema))
      .select(col(seriesCol), col("h").as("hour"),
        col("sum_val").as("observed"), col("filled"))
  }
}
