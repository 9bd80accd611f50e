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

  /** (l_orderkey → sorted DISTINCT part array). The sort makes the
    * pair expansion emit canonical a < b pairs. */
  def baskets(li: DataFrame): DataFrame =
    li.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("basket"))

  /** Ordered pairs {(basket[i], basket[j]) : i < j}, generated
    * map-side per basket: each element paired with every LATER element
    * of the sorted distinct basket. Column names are the caller's
    * (part_a/part_b for the commerce keys, u/v for the graph edge
    * list). */
  def pairs(basketFrame: DataFrame, aName: String, bName: String): DataFrame =
    basketFrame
      .select(explode(expr(
        s"""flatten(transform(basket, (x, i) ->
           |  transform(slice(basket, i + 2, size(basket) - i - 1),
           |            y -> struct(x AS $aName, y AS $bName))))""".stripMargin))
        .as("p"))
      .select(col(s"p.$aName"), col(s"p.$bName"))
}
