package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running total — the scalable form of
  * `sum(x) OVER (ORDER BY ...)`: a global-ORDER window collapses every
  * row onto ONE task (Spark plans an un-partitioned window as a single
  * partition — the classic scale cliff). Here the data is range-
  * partitioned on the order key, each partition computes its local
  * prefix sums in parallel, and a partition-count-sized offset table
  * (collected to the driver via a partial-aggregated P-row shuffle,
  * broadcast back) shifts them to global totals. Cost: the range
  * shuffle, plus one more exchange grouping rows by their partition id
  * for the local-prefix window (the checkpoint erases the physical
  * ordering, so Catalyst re-sorts; a mapPartitions prefix scan over the
  * checkpointed partitions would eliminate that second exchange if this
  * ever dominates a profile). Either way no single task ever sees more
  * than one partition — the global-window cliff is gone.
  *
  * The order must be TOTAL (include a tiebreaker column): rows with
  * equal keys may land in different range partitions, and only a total
  * order makes their cumulative positions well-defined.
  */
object CumSum {

  /** Adds `outCol` = running total of `valueCol` over `orderCols`.
    * Requires a total order; output row set is the input's. */
  def runningTotal(df: DataFrame, valueCol: String, outCol: String,
      orderCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    // checkpoint pins partition identity: spark_partition_id is only
    // meaningful if the partitioning is not re-planned between the
    // offset computation and the final join
    val parted = df
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val sums = parted.groupBy("__pid").agg(sum(col(valueCol)).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive prefix: partition i's offset = total of partitions < i
    val offByPid = sums.map(_._1)
      .zip(sums.map(_._2).scanLeft(0L)(_ + _)).toMap
    import spark.implicits._
    val offDf = offByPid.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy("__pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted
      .withColumn("__local", sum(col(valueCol)).over(w))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn(outCol, col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }
}
