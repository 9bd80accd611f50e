package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whole-operator APIs for the two time-join shapes Spark SQL lacks as
  * built-ins (SURVEY.md §2.3): as-of join and interval range join.
  * Both follow the brief's preference order — they COMPOSE built-in
  * operators into plans that scale (option (a)), rather than introducing
  * a custom SparkPlan the optimizer can't see through.
  */
object AsOf {

  /** As-of join: for each left row, the latest right row with
    * `rightTs <= leftTs`, matched within `keys`. Implemented as
    * union + per-key ordered window (`last(_, ignoreNulls)` over
    * UNBOUNDED PRECEDING .. 1 PRECEDING for strict, .. CURRENT ROW for
    * inclusive) — one shuffle keyed by `keys`, no nested loop, state
    * linear in partition size. DuckDB ASOF JOIN is the oracle shape
    * (strict: `<`; tie-break latest-first by the right id column).
    *
    * @param valueCols right-side columns to carry onto left rows
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String],
      strict: Boolean = true): DataFrame = {
    val leftTagged = left
      .withColumn("__t", col(leftTs))
      .withColumn("__is_left", lit(1))
    val rightTagged = right
      .select((keys :+ rightTs).map(col) ++ valueCols.map(col): _*)
      .withColumn("__t", col(rightTs))
      .withColumn("__is_left", lit(0))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // right rows sort before left rows at equal __t iff inclusive
    val tie = if (strict) col("__is_left").desc else col("__is_left").asc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__t").asc, tie)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c,
        when(col("__is_left") === 1,
          last(when(col("__is_left") === 0, col(c)), ignoreNulls = true).over(w))
          .otherwise(col(c)))
    }
    carried.filter(col("__is_left") === 1)
      .drop("__t", "__is_left", rightTs)
  }
}

/** Interval / range join without an equality key: `l.ts ∈ [r.start, r.end)`.
  * The naive plan is a BroadcastNestedLoopJoin — O(|L|·|R|) comparisons,
  * a wall at scale. The bucketed plan discretizes time into cells of
  * `bucketWidth`: each right interval explodes into the cells it covers,
  * each left point maps to one cell, and the join becomes an equi-join on
  * the cell key (shuffle-partitionable), followed by the exact predicate.
  * Cost: O(|L| + |R|·avgIntervalCells + matches) — choose bucketWidth
  * near the median interval length.
  */
object RangeJoin {

  /** @param leftTs   left point-in-time column (timestamp)
    * @param rightStart/rightEnd right interval columns (timestamps,
    *   half-open [start, end))
    * @param bucketWidthSec time-cell width in seconds */
  def pointInInterval(left: DataFrame, right: DataFrame,
      leftTs: String, rightStart: String, rightEnd: String,
      bucketWidthSec: Long): DataFrame = {
    val cell = (t: Column) => floor(unix_timestamp(t) / bucketWidthSec)
    val l = left.withColumn("__cell", cell(col(leftTs)))
    val r = right.withColumn("__cells",
      sequence(cell(col(rightStart)), cell(col(rightEnd))))
    val rExploded = r.withColumn("__cell", explode(col("__cells"))).drop("__cells")
    l.join(rExploded, Seq("__cell"))
      .filter(col(leftTs) >= col(rightStart) && col(leftTs) < col(rightEnd))
      .drop("__cell")
  }
}
