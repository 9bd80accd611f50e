package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed running total — the scalable form of
  * `sum(x) OVER (ORDER BY ...)`: a global-ORDER window collapses every
  * row onto ONE task (Spark plans an un-partitioned window as a single
  * partition — the classic scale cliff). This is the textbook two-pass
  * parallel scan instead:
  *
  *  1. range-partition + sort by the order key — the ONLY exchange;
  *  2. first narrow pass: each partition sums its values (one row out
  *     per partition, collected to the driver — P values);
  *  3. second narrow pass: each partition replays its rows adding its
  *     exclusive prefix offset (the P-sized offset map ships inside the
  *     task closure).
  *
  * The per-partition passes are `mapPartitions` — genuine per-partition
  * imperative logic, the documented exception to the no-RDD stance: no
  * Column formulation can express "running state within the physical
  * partition" without forcing Catalyst to insert a second exchange plus
  * sort (a window keyed on spark_partition_id does exactly that, which
  * doubles the dominant cost; measured before this rewrite).
  *
  * The order must be TOTAL (include a tiebreaker column): rows with
  * equal keys may land in different range partitions, and only a total
  * order makes their cumulative positions well-defined. `valueCol` must
  * be an integral type (fractional input would be silently truncated by
  * the bigint normalization — round/cast explicitly upstream); NULL
  * values are skipped, matching `sum(x) OVER (...)` semantics.
  */
object CumSum {

  /** Adds `outCol` (bigint) = running total of `valueCol` over
    * `orderCols`, replacing any pre-existing `outCol` (withColumn
    * semantics). Output rows = input rows.
    *
    * Checkpoint ownership: both passes replay an internal
    * range-partitioned checkpoint that the RETURNED FRAME depends on,
    * so it cannot be freed here and is reclaimed by the ContextCleaner
    * when the result is GC'd. Unlike [[CumMax.runningMaxExclusive]]
    * (whose one consumer has a bounded output and frees eagerly via the
    * spent-return pattern), every runningTotal consumer emits a
    * corpus-sized frame — eagerly materializing it just to free the
    * checkpoint would double the block footprint, the cure costing more
    * than the leak. */
  def runningTotal(df: DataFrame, valueCol: String, outCol: String,
      orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType}
    df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"CumSum.runningTotal sums '$valueCol' as bigint; $other input " +
          "would truncate silently — round/cast to an integral type first")
    }
    // normalize the summed column to bigint so both passes read getLong;
    // internal name picked to not collide with any input column
    val vName = Iterator.from(0).map(i => s"__cumsum_v$i")
      .find(n => !df.columns.contains(n)).get
    val withV = df.drop(outCol).withColumn(vName, col(valueCol).cast("bigint"))
    val parted = withV
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .localCheckpoint(true) // both passes replay the same partitions
    val vIdx = parted.schema.fieldIndex(vName)
    // pass 1: per-partition totals (narrow; one output row per partition)
    val sumSchema = StructType(Seq(
      StructField("pid", LongType), StructField("s", LongType)))
    val partSums = parted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId().toLong
      var acc = 0L
      it.foreach(r => if (!r.isNullAt(vIdx)) acc += r.getLong(vIdx))
      Iterator.single(Row(pid, acc))
    }(Encoders.row(sumSchema))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    // exclusive prefix over ALL partition ids (empty ones contribute 0)
    val nParts = parted.rdd.getNumPartitions
    val offsets = new Array[Long](math.max(nParts, 1))
    var acc = 0L
    (0 until nParts).foreach { p =>
      offsets(p) = acc; acc += partSums.getOrElse(p, 0L)
    }
    // pass 2: replay each partition adding its offset (narrow)
    val outSchema = StructType(
      parted.schema.fields :+ StructField(outCol, LongType, nullable = false))
    parted.mapPartitions { it =>
      var run = offsets(TaskContext.getPartitionId())
      it.map { r =>
        if (!r.isNullAt(vIdx)) run += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ run)
      }
    }(Encoders.row(outSchema))
      .drop(vName)
  }
}

/** Distributed EXCLUSIVE running maximum — the max-monoid sibling of
  * [[CumSum]] (same two-pass parallel scan, same single range
  * exchange, same no-global-window stance): `outCol` = max of
  * `valueCol` over all rows STRICTLY BEFORE this one in `orderCols`
  * order, `Long.MinValue` for the first row. Exclusive (pass 2 emits
  * the running state BEFORE folding the row) because the consumer —
  * the skyline operator — asks "does anything earlier beat me", a
  * question the inclusive form cannot answer once the row's own value
  * enters the max. The order must be TOTAL for well-defined positions,
  * same as CumSum. */
object CumMax {

  /** Adds `outCol` (bigint) = exclusive running max of `valueCol` over
    * `orderCols`. NULL values don't advance the max.
    *
    * Checkpoint hygiene: both passes replay the internal
    * range-partitioned checkpoint, so it cannot be freed here — it is
    * returned as `_2` for the CALLER to release (via
    * `GateMemo.unpersistCheckpoint`) once the result is materialized,
    * the same finish/spent pattern the graph keys use. A caller that
    * drops `_2` re-creates the round-14 leak qSkyline had. */
  def runningMaxExclusive(df: DataFrame, valueCol: String, outCol: String,
      orderCols: Seq[Column]): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType}
    df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"CumMax.runningMaxExclusive reads '$valueCol' as bigint; $other " +
          "input would truncate silently — round/cast to an integral type first")
    }
    val vName = Iterator.from(0).map(i => s"__cummax_v$i")
      .find(n => !df.columns.contains(n)).get
    val withV = df.drop(outCol).withColumn(vName, col(valueCol).cast("bigint"))
    val parted = withV
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .localCheckpoint(true)
    val vIdx = parted.schema.fieldIndex(vName)
    val maxSchema = StructType(Seq(
      StructField("pid", LongType), StructField("m", LongType)))
    val partMaxes = parted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId().toLong
      var acc = Long.MinValue
      it.foreach(r => if (!r.isNullAt(vIdx)) acc = math.max(acc, r.getLong(vIdx)))
      Iterator.single(Row(pid, acc))
    }(Encoders.row(maxSchema))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val nParts = parted.rdd.getNumPartitions
    val offsets = new Array[Long](math.max(nParts, 1))
    var acc = Long.MinValue
    (0 until nParts).foreach { p =>
      offsets(p) = acc
      acc = math.max(acc, partMaxes.getOrElse(p, Long.MinValue))
    }
    val outSchema = StructType(
      parted.schema.fields :+ StructField(outCol, LongType, nullable = false))
    val out = parted.mapPartitions { it =>
      var run = offsets(TaskContext.getPartitionId())
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ run) // exclusive: emit BEFORE fold
        if (!r.isNullAt(vIdx)) run = math.max(run, r.getLong(vIdx))
        out
      }
    }(Encoders.row(outSchema))
      .drop(vName)
    (out, parted)
  }
}
