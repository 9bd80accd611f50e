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
    // min-label propagation needs O(eccentricity from the min node)
    // rounds — right for the shallow clusters near-dup produces; for
    // deep graphs (long duplicate chains) use [[runStarContraction]],
    // which converges in O(log n) rounds.
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
        "or switch to runStarContraction for deep graphs")
    labels
  }

  /** Auto-dispatching connected components: try min-label propagation
    * first (one join per round — the cheapest plan when components are
    * shallow, which near-dup clusters almost always are), and when the
    * label budget runs out before convergence — the signature of a deep
    * component — fall back to [[runStarContraction]] instead of
    * throwing. The budget bounds the wasted probe: at most `labelBudget`
    * cheap rounds before the O(log n) path takes over, so shallow
    * graphs never pay contraction's two-joins-per-round and deep graphs
    * never pay diameter-many rounds. Same contract as both:
    * (node, label), label = component min. */
  def auto(edges: DataFrame, srcCol: String, dstCol: String,
      labelBudget: Int = 8, maxIter: Int = 25): DataFrame =
    try run(edges, srcCol, dstCol, labelBudget)
    catch {
      case e: IllegalStateException if e.getMessage.contains("did not converge") =>
        runStarContraction(edges, srcCol, dstCol, maxIter)
    }

  /** Connected components by alternating large-star/small-star
    * contraction (the Kiveris et al. "Connected Components in MapReduce
    * and Beyond" formulation): each round hooks every node's larger
    * neighbors (large-star) then its smaller neighborhood (small-star)
    * directly to the local minimum, roughly squaring how far the min
    * reaches — O(log n) rounds on ANY topology, vs min-label's
    * O(eccentricity). Same contract as [[run]]: (node, label),
    * label = component min.
    *
    * Per round: two grouped aggregations (map-side partial min) + two
    * broadcast-free equi-joins keyed by node — no adjacency
    * materialization beyond the edge list, bounded per-key state, so the
    * deep-chain case costs log-many cheap shuffles instead of
    * diameter-many. Prefer [[run]] when components are known-shallow
    * (near-dup clusters): it does one join per round, not two. */
  def runStarContraction(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val pairs = edges.select(col(srcCol).as("x"), col(dstCol).as("y"))
    // contraction operates on self-loop-free canonical edges; nodes whose
    // every edge is a self-loop would otherwise vanish from the output,
    // while [[run]] labels them with themselves — they are unioned back
    // after the fixpoint (same contract as run)
    var e = pairs
      .filter(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("u"), least(col("x"), col("y")).as("v"))
      .distinct()
      .localCheckpoint(true)
    // fixpoint detection: the edge multiset is stable when both its size
    // and its order-independent hash-sum stop moving (the agg rides the
    // same job that materializes the round's checkpoint output)
    var prev = (-1L, -1L)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      // hash-sum summands are wrapped to 32 bits: a long sum of full
      // 64-bit hashes overflows (an error under ANSI mode); 2^32-bounded
      // terms keep the sum exact for up to 2^31 edges
      val sig = next.agg(
        count(lit(1)),
        coalesce(sum(pmod(xxhash64(col("u"), col("v")), lit(4294967296L))), lit(0L))).head()
      val cur = (sig.getLong(0), sig.getLong(1))
      converged = cur == prev
      prev = cur
      e = next
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"runStarContraction did not converge in $maxIter rounds — " +
        "O(log n) bound exceeded; the edge input is likely unstable " +
        "(non-deterministic ids) or maxIter is set far below log2(|V|)")
    // the fixpoint is a forest of stars centered at each component's
    // min: non-centers appear as u exactly once, centers label themselves
    val starLabels = e.select(col("u").as("node"), col("v").as("lbl"))
      .union(e.select(col("v").as("node"), col("v").as("lbl")))
      .distinct()
    // singleton components (nodes seen only in self-loops) re-enter
    // labeled with themselves — one node-keyed equi-anti-join, the same
    // shuffle shape as every other stage
    val allNodes = pairs.select(col("x").as("node"))
      .unionByName(pairs.select(col("y").as("node"))).distinct()
    starLabels.unionByName(
      allNodes.join(starLabels.select("node"), Seq("node"), "left_anti")
        .select(col("node"), col("node").as("lbl")))
  }

  /** Large-star: every node connects its STRICTLY LARGER neighbors to
    * the min of its closed neighborhood. Output rows keep u > v.
    * The per-node min rides a window over the same partition-by-p
    * exchange the rows need anyway — one exchange instead of the
    * groupBy+join formulation's aggregate-then-join-back two. (Degree
    * skew routes a node's edges to one task in EITHER formulation; the
    * window adds no new hot spot.) */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u").as("p"), col("v").as("q"))
      .unionByName(e.select(col("v").as("p"), col("u").as("q")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("p")
    sym.withColumn("m", least(min(col("q")).over(w), col("p")))
      .filter(col("q") > col("p"))
      .select(col("q").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: every node rewires its smaller-or-equal neighborhood
    * (and itself) to that neighborhood's min. Input/output rows u > v.
    * Same one-exchange window trick as [[largeStar]]: the center u rows
    * (n = v) and u's own self-row (n = u) both read the windowed min. */
  private def smallStar(e: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("u")
    e.withColumn("m", min(col("v")).over(w))
      .select(explode(array(col("v"), col("u"))).as("n"), col("m"))
      .filter(col("n") =!= col("m"))
      .select(col("n").as("u"), col("m").as("v"))
      .distinct()
  }
}
