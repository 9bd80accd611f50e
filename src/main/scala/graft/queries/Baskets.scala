package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared market-basket building blocks behind `q_basket_pairs`,
  * `q_basket_lift` and the co-purchase graph family: ONE orderkey-keyed
  * basket aggregation, then a MAP-SIDE ordered-pair expansion. The
  * expansion's fan-out is basket-size-bounded (k² for a k-item basket;
  * 13-17 distinct parts max in the driver's book) — never an
  * |lineitem|² self-join. The oracles keep the self-join derivation,
  * so every consumer's pair multiset is independently derived on both
  * engines. */
object Baskets {

  /** (l_orderkey → DISTINCT part array). Unordered: the pair expansion
    * canonicalizes by VALUE (a < b), so the former sort_array was pure
    * per-group overhead (round-18 optimization; the probe measured the
    * sort at ~7% of the derivation). */
  def baskets(li: DataFrame): DataFrame =
    li.groupBy("l_orderkey")
      .agg(collect_set(col("l_partkey")).as("basket"))

  /** Canonical pairs {(x, y) ∈ basket² : x < y}, generated map-side per
    * basket as TWO chained explodes + a value filter. Each explode is a
    * codegen-friendly Generate; the former single-explode formulation
    * built a nested array-of-structs per basket through interpreted
    * higher-order lambdas (transform/slice/flatten) and measured ~30%
    * slower at sf0.1 (round-18 probe: 1.56 s → 1.20 s for the distinct
    * edge derivation). Fan-out is k² rows pre-filter for a k-item
    * basket — same bound as before (the struct expansion allocated the
    * same k²/2 pairs plus the nesting). Baskets are DISTINCT arrays
    * (collect_set), so per basket each unordered pair appears exactly
    * once — identical multiset to the positional i < j expansion over a
    * sorted basket. Column names are the caller's (part_a/part_b for
    * the commerce keys, u/v for the graph edge list). */
  def pairs(basketFrame: DataFrame, aName: String, bName: String): DataFrame =
    basketFrame
      .select(explode(col("basket")).as(aName), col("basket"))
      .select(col(aName), explode(col("basket")).as(bName))
      .where(col(aName) < col(bName))
}
