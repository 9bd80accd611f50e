package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components via iterative min-label propagation — the step
  * that turns near-duplicate PAIRS into dedup CLUSTERS (every transitive
  * group gets one canonical id = its minimum doc_id, the keeper).
  *
  * Each iteration is one shuffle-join keyed by node: every node adopts
  * the minimum label among itself and its neighbors; convergence takes
  * O(graph diameter) iterations (near-dup clusters are shallow — a
  * handful). This is the standard large-graph formulation (HashToMin
  * family): state per node is one label, no adjacency materialization
  * beyond the edge list, so it scales to corpus-sized graphs where a
  * driver-side union-find cannot hold the nodes.
  */
object ConnectedComponents {

  /** @param edges undirected edge list (one row per pair)
    * @return (node, label) — label = min node id of the component
    * @throws IllegalStateException when maxIter rounds did not converge:
    *   partial labels would silently split long chains (>maxIter hops)
    *   into separate clusters, so downstream dedup would keep/drop the
    *   wrong documents with no signal — fail loudly instead */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .localCheckpoint(true)
    // init fused with the first propagation round: every node's label
    // starts at min(self, neighbors) from ONE aggregation — the separate
    // distinct-nodes shuffle plus a full first join round would compute
    // exactly this (every node appears as `a` since edges are symmetric)
    var labels = sym.groupBy("a").agg(min("b").as("__mb"))
      .select(col("a").as("node"), least(col("a"), col("__mb")).as("lbl"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym.join(labels, col("b") === col("node"))
        .groupBy(col("a")).agg(min("lbl").as("nbr_lbl"))
      // carry the change flag through the checkpoint so convergence
      // detection is a local count over materialized partitions, not a
      // second shuffle-join against the previous labels
      val newLbl = least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl")))
      val next = labels.join(nbrMin, col("node") === col("a"), "left")
        .select(col("node"), newLbl.as("lbl"), (newLbl =!= col("lbl")).as("chg"))
        .localCheckpoint(true)
      changed = next.filter(col("chg")).count()
      labels = next.drop("chg")
      i += 1
    }
    if (changed > 0) throw new IllegalStateException(
      s"ConnectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still changing): component diameter exceeds " +
        "maxIter — raise it (rounds are O(eccentricity from the min node)) " +
        "or switch to a large-star/small-star contraction for deep graphs")
    labels
  }
}
