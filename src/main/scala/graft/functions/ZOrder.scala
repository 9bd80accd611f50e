package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional file-layout
  * key. Sorting a table by `zvalue` before writing clusters rows that
  * are close in EVERY dimension into the same parquet row groups, so a
  * conjunctive range predicate over those dimensions prunes row groups
  * via min/max stats in all dimensions at once — a 1-d sort only prunes
  * its leading column. At 100 TB this is the difference between a scan
  * touching a few hundred row groups and touching every file for any
  * predicate that doesn't lead with the sort key.
  *
  * The z-value is pure integer bit math (shift/and/or), so it stays in
  * whole-stage codegen and is portable to any ANSI engine — the DuckDB
  * oracle computes the identical expression.
  */
object ZOrder {

  /** Morton code of `cols` (cast to bigint), `bits` low bits each:
    * column c's bit i lands at output position `i * n + c` (stride
    * interleave). Requires `bits * cols.size <= 63`. Inputs are CLAMPED
    * into [0, 2^bits): out-of-range values collapse onto the range edge
    * (coarse but order-preserving) instead of aliasing mod 2^bits,
    * which would interleave far-apart values into the same z-ranges
    * and silently destroy the layout's clustering. */
  def zvalue(cols: Seq[Column], bits: Int = 21): Column = {
    val n = cols.size
    require(n >= 1, "zvalue needs at least one column")
    require(bits * n <= 63, s"$n cols x $bits bits overflows a bigint")
    val hi = (1L << bits) - 1
    val terms = for {
      i <- 0 until bits
      (c, ci) <- cols.zipWithIndex
      clamped = greatest(least(c.cast("bigint"), lit(hi)), lit(0L))
    } yield shiftleft(
      shiftright(clamped, i).bitwiseAND(lit(1L)), i * n + ci)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The same Morton code (same clamping) as ANSI SQL text
    * (DuckDB-compatible), for oracle twins: `exprs` are column names or
    * SQL expressions. */
  def zvalueSql(exprs: Seq[String], bits: Int = 21): String = {
    val n = exprs.size
    val hi = (1L << bits) - 1
    val terms = for {
      i <- 0 until bits
      (e, ci) <- exprs.zipWithIndex
      clamped = s"greatest(least(CAST($e AS BIGINT), $hi), 0)"
    } yield s"((($clamped >> $i) & 1) << ${i * n + ci})"
    terms.mkString("(", " | ", ")")
  }

  /** Repartition-by-range + local sort on the z-value: the write-side
    * layout operator (`df.write.parquet` after this puts contiguous
    * z-ranges into each file and parquet collects per-row-group min/max
    * for the payload columns automatically).
    *
    * Columns are min/max-normalized into the `bits` range BEFORE
    * interleaving. Interleaving raw values gives the widest-range
    * column's high bits sole custody of the top z-bits — the curve
    * degenerates to that column's 1-d sort and row groups span the
    * other columns' full ranges (measured: zero pruning on a 14-bit
    * key interleaved with a 27-bit key). Normalization costs one
    * min/max aggregate over the input (at warehouse scale, read it
    * from table metadata instead); heavily skewed columns want
    * rank-based bucketing — compose `ntile` upstream if so. */
  def layoutBy(df: org.apache.spark.sql.DataFrame, bits: Int,
      cols: String*): org.apache.spark.sql.DataFrame = {
    val stats = df.agg(
      min(col(cols.head)).cast("double").as(s"mn0"),
      (max(col(cols.head)).cast("double").as(s"mx0") +:
        cols.tail.zipWithIndex.flatMap { case (c, i) => Seq(
          min(col(c)).cast("double").as(s"mn${i + 1}"),
          max(col(c)).cast("double").as(s"mx${i + 1}"))
        }): _*).head()
    val hi = (1L << bits) - 1
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      // min/max are null on an empty frame or an all-null /
      // non-numeric-castable column — getDouble would throw a bare NPE
      // deep in the write job; name the actual problem instead
      require(!stats.isNullAt(2 * i) && !stats.isNullAt(2 * i + 1),
        s"z-order layout: column '$c' has no numeric min/max (empty " +
          "input, all-null, or not castable to double) — nothing to lay out")
      val (mn, mx) = (stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
      val span = math.max(mx - mn, 1e-12)
      ((col(c).cast("double") - lit(mn)) * lit(hi.toDouble / span))
        .cast("bigint")
    }
    df.withColumn("__z", zvalue(scaled, bits))
      .repartitionByRange(col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
