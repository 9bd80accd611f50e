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
    * `rightTs < leftTs` (strict) / `<= leftTs` (inclusive), matched within
    * `keys`. Implemented as union + per-key ordered window
    * (`last(_, ignoreNulls)` over UNBOUNDED PRECEDING .. 1 PRECEDING) —
    * one shuffle keyed by `keys`, no nested loop, state linear in
    * partition size. DuckDB ASOF JOIN is the oracle shape.
    *
    * The right ts is renamed to an internal column before the union, so a
    * left column named `rightTs` (the common leftTs == rightTs case)
    * survives to the output. Ties among right rows with equal (keys, ts)
    * are broken deterministically when `rightId` is given: the row with
    * the LARGEST `rightId` wins (latest-first, matching an oracle
    * `ORDER BY ts, id` last-value frame). Without `rightId`, tie order is
    * whatever the sort produced — pass one whenever the right side can
    * hold duplicate (keys, ts).
    *
    * @param valueCols right-side columns to carry onto left rows (must not
    *   collide with left column names)
    * @param rightId right-side column that is unique per row, used as the
    *   deterministic tie-break
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String],
      strict: Boolean = true, rightId: Option[String] = None): DataFrame = {
    val leftTagged = left
      .withColumn("__t", col(leftTs))
      .withColumn("__is_left", lit(1))
    val tieSel = rightId.map(c => col(c).as("__tie")).toSeq
    val rightTagged = right
      .select(keys.map(col) ++ valueCols.map(col) ++ tieSel :+ col(rightTs).as("__t"): _*)
      .withColumn("__is_left", lit(0))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // right rows sort before left rows at equal __t iff inclusive
    val tie = if (strict) col("__is_left").desc else col("__is_left").asc
    // largest __tie sorts last within equal (__t, __is_left), so the
    // last(...) frame picks it; left rows carry null __tie and sort first
    val ord = Seq(col("__t").asc, tie) ++ rightId.map(_ => col("__tie").asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c,
        when(col("__is_left") === 1,
          last(when(col("__is_left") === 0, col(c)), ignoreNulls = true).over(w))
          .otherwise(col(c)))
    }
    carried.filter(col("__is_left") === 1)
      .drop("__t", "__is_left", "__tie")
  }
}

/** MERGE / upsert over immutable columnar storage (the reference's
  * Postgres surface has INSERT .. ON CONFLICT; Spark-on-parquet has no
  * in-place update, so the pipeline idiom is a snapshot rewrite):
  * result = updates ∪ (target ∖ keys(updates)). One left-anti join —
  * shuffles both sides once on the key, or broadcasts the (typically
  * small) update set; writing the result back out is the caller's
  * atomic-commit snapshot swap.
  */
object Upsert {

  /** @param keys natural key columns present in both frames; `updates`
    * rows win over `target` rows with the same key. Key equality is
    * NULL-SAFE (`<=>`): a plain equi anti-join never matches a NULL
    * key, so a null-keyed target row would survive every merge AND the
    * batch's null-keyed winner would be appended — one more conflicting
    * duplicate per merge, breaking replay convergence (the
    * SnapshotStore contract; CDC count views merge on group columns
    * that can legitimately be null). */
  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val t = target.alias("__t")
    val u = updates.select(keys.map(col): _*).alias("__u")
    val cond = keys.map(k => col(s"__t.$k") <=> col(s"__u.$k")).reduce(_ && _)
    t.join(u, cond, "left_anti")
      .unionByName(updates)
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
