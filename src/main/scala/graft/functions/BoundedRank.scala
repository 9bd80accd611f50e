package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking for ALREADY-BOUNDED inputs (top-k survivors of an
  * `orderBy(...).limit(k)` — the TakeOrderedAndProject pattern).
  *
  * Numbering k rows needs a single-partition window, and that single
  * partition is intended — but `Window.orderBy` with an empty partition
  * spec makes WindowExec log "Moving all data to a single partition"
  * even for k rows, which buries the one case where that warning IS a
  * real red flag (an unbounded corpus flowing into a global window).
  * So partition by an all-zero key that Catalyst cannot constant-fold
  * away (`pmod(xxhash64(tieBreak), 1)` — a literal zero would be folded
  * and the spec would collapse back to empty): every row lands in
  * partition 0, semantics are identical to the unpartitioned window,
  * and the logs stay quiet for quiet plans.
  */
object BoundedRank {

  /** `row_number()` over `order` for a k-row bounded input. `tieBreak`
    * is any deterministic column (normally the id tie-break already in
    * `order`) used only to build the non-foldable zero partition key. */
  def rowNumberBounded(tieBreak: Column, order: Column*): Column =
    row_number().over(
      Window.partitionBy(pmod(xxhash64(tieBreak), lit(1L))).orderBy(order: _*))
}
