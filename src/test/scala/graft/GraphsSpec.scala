package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graph-analytics invariants on planted graphs where every metric is
  * computable by hand, plus a formulation-equivalence check of the
  * map-side basket pair expansion against the naive self-join edge
  * derivation on the real corpus (the two derivations are independent —
  * the oracle keeps the self-join, `Graphs.edges` keeps the expansion).
  */
class GraphsSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Writes baskets (orderkey -> parts) as a minimal lineitem.parquet in
    * a temp sf-dir so the family's (spark, sfDir) entry points read it. */
  private def plant(baskets: Seq[Seq[Long]]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_graph").toString
    baskets.zipWithIndex
      .flatMap { case (ps, o) => ps.map(p => (o.toLong, p)) }
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("triangle census on a planted triangle-plus-tail graph") {
    // baskets {1,2,3} and {3,4}: edges (1,2)(1,3)(2,3)(3,4);
    // deg = 2,2,3,1 -> wedges 1+1+3+0 = 5; one triangle;
    // clustering = 3*1/5 = 0.6
    val dir = plant(Seq(Seq(1L, 2L, 3L), Seq(3L, 4L)))
    val r = SparkEntry.queries("q_graph_triangles")(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("nodes") == 4L)
    assert(row.getAs[Long]("edges") == 4L)
    assert(row.getAs[Long]("wedges") == 5L)
    assert(row.getAs[Long]("triangles") == 1L)
    assert(row.getAs[Double]("clustering_coef") == 0.6)
  }

  test("degree ranking on the planted graph is (3,3) first then ties by id") {
    val dir = plant(Seq(Seq(1L, 2L, 3L), Seq(3L, 4L)))
    val rows = SparkEntry.queries("q_graph_degree")(spark, dir)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("degree")))
    assert(rows.toSeq == Seq((3L, 3L), (1L, 2L), (2L, 2L), (4L, 1L)))
  }

  test("jaccard similarity: planted baskets, support floor, half-up 4dp") {
    // orders {1,2} {1,2} {1,2,3} {3,4} {3,4}:
    //   n1=3 n2=3 n3=3 n4=2
    //   (1,2) w=3 -> J = 3/(3+3-3) = 1.0000 -> 10000
    //   (3,4) w=2 -> J = 2/(3+2-2) = 2/3    -> 6667 (half-up 4dp)
    //   (1,3),(2,3) w=1 -> below the support floor, excluded
    val dir = plant(Seq(Seq(1L, 2L), Seq(1L, 2L), Seq(1L, 2L, 3L),
      Seq(3L, 4L), Seq(3L, 4L)))
    val rows = SparkEntry.queries("q_graph_jaccard")(spark, dir)
      .collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("both_orders"), r.getAs[Long]("jaccard_4dp")))
    assert(rows.toSeq == Seq((1L, 2L, 3L, 10000L), (3L, 4L, 2L, 6667L)))
  }

  test("ppr is LOCAL: a component unreachable from the seed holds zero mass") {
    // star {0,1,2,3} (hub 0, max degree -> the seed) plus a disjoint
    // edge {10,11}: global pagerank ranks all 6 nodes; personalized
    // pagerank's teleport pins the walk to the seed's component
    val dir = plant(Seq(Seq(0L, 1L), Seq(0L, 2L), Seq(0L, 3L),
      Seq(10L, 11L)))
    val ppr = SparkEntry.queries("q_graph_ppr")(spark, dir)
      .collect().map(_.getAs[Long]("node")).toSet
    assert(ppr == Set(0L, 1L, 2L, 3L))
    val global = SparkEntry.queries("q_graph_pagerank")(spark, dir)
      .collect().map(_.getAs[Long]("node")).toSet
    assert(global == Set(0L, 1L, 2L, 3L, 10L, 11L))
  }

  test("ppr exact integer trajectory on a single edge") {
    // {1,2}: deg 1 each, seed = 1 (degree tie broken by node id);
    // scale 1e12, damp 1.5e11. By hand:
    //   it1: r1 = tele = 1.5e11;           r2 = 17*1e12/20    = 8.5e11
    //   it2: r1 = 17*8.5e11/20 + 1.5e11 = 872_500_000_000
    //        r2 = 17*1.5e11/20          = 127_500_000_000
    //   it3: r1 = 17*127.5e9/20 + 1.5e11 = 258_375_000_000
    //        r2 = 17*872.5e9/20          = 741_625_000_000
    val dir = plant(Seq(Seq(1L, 2L)))
    val rows = SparkEntry.queries("q_graph_ppr")(spark, dir)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("rank_scaled")))
    assert(rows.toSeq == Seq((2L, 741625000000L), (1L, 258375000000L)))
  }

  test("link prediction: planted wedge predicted, existing edge excluded") {
    // repeated pairs: (1,2)x2, (2,3)x2 -> support-filtered edges;
    // (1,3) co-occurs only ONCE -> not an edge, and the 1-2-3 wedge
    // makes it the predicted link with cn=1; (1,2) itself is an edge
    // so it must NOT appear even though it has a common neighbor path
    val dir = plant(Seq(Seq(1L, 2L), Seq(1L, 2L), Seq(2L, 3L), Seq(2L, 3L),
      Seq(1L, 3L)))
    val out = SparkEntry.queries("q_graph_link_predict")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 3L, 1L)))
  }

  test("batched ppr: the shared seed reproduces the single-seed walk exactly") {
    // q_graph_ppr seeds at the top hub; that hub is also the batch
    // key's first seed — batching must not change any per-seed value
    val single = SparkEntry.queries("q_graph_ppr")(spark, sf)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("rank_scaled")))
      .take(5).toSeq
    val batch = SparkEntry.queries("q_graph_ppr_batch")(spark, sf).collect()
    // the single-seed key's seed: the top hub by (degree desc, id) —
    // q_graph_degree's first row (batch output is ordered by seed ID,
    // so its head is the smallest seed, not the hub)
    val topSeed = SparkEntry.queries("q_graph_degree")(spark, sf)
      .collect().head.getAs[Long]("node")
    val batchTop = batch.filter(_.getAs[Long]("seed") == topSeed)
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("rank_scaled"))).toSeq
    assert(batchTop == single)
    // 5 distinct seeds, 5 rows each
    assert(batch.map(_.getAs[Long]("seed")).distinct.length == 5)
    assert(batch.length == 25)
  }

  test("batched ppr stays component-local per seed") {
    // 6 nodes; top-5 by (degree desc, id) = {0,1,2,3,10} — seed 10's
    // walk must stay inside {10,11} while the star seeds stay in the star
    val dir = plant(Seq(Seq(0L, 1L), Seq(0L, 2L), Seq(0L, 3L),
      Seq(10L, 11L)))
    val rows = SparkEntry.queries("q_graph_ppr_batch")(spark, dir).collect()
      .map(r => (r.getAs[Long]("seed"), r.getAs[Long]("node")))
    val bySeed = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(bySeed.keySet == Set(0L, 1L, 2L, 3L, 10L))
    assert(bySeed(10L).subsetOf(Set(10L, 11L)))
    Seq(0L, 1L, 2L, 3L).foreach(sd =>
      assert(bySeed(sd).subsetOf(Set(0L, 1L, 2L, 3L)), s"seed $sd leaked"))
  }

  test("pagerank on a regular graph is the exact fixed point 1e12") {
    // triangle {1,2,3}: every node's neighbor sum is 2*(r DIV 2) = r, so
    // 0.15e12 + 17r DIV 20 = 1e12 at r = 1e12 — the integer iteration
    // must hold the fixed point exactly (no rounding drift)
    val dir = plant(Seq(Seq(1L, 2L, 3L)))
    val rows = SparkEntry.queries("q_graph_pagerank")(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getAs[Long]("rank_scaled") == 1000000000000L))
  }

  test("pagerank mass concentrates on the hub of a star") {
    // star 1-{2,3,4}: leaves' whole mass flows to the hub each round
    val dir = plant(Seq(Seq(1L, 2L), Seq(1L, 3L), Seq(1L, 4L)))
    val rows = SparkEntry.queries("q_graph_pagerank")(spark, dir)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("rank_scaled")))
    val hub = rows.find(_._1 == 1L).get._2
    rows.filter(_._1 != 1L).foreach { case (_, leaf) =>
      assert(hub > leaf)
      assert(leaf == rows.find(_._1 == 2L).get._2) // leaves identical
    }
  }

  test("BFS hop histogram on a planted path graph") {
    // path 1-2-3-4-5 from seed min(u)=1: exactly one node per hop 0..3
    val dir = plant(Seq(Seq(1L, 2L), Seq(2L, 3L), Seq(3L, 4L), Seq(4L, 5L)))
    val rows = SparkEntry.queries("q_graph_reach")(spark, dir)
      .collect().map(r => (r.getAs[Long]("hop"), r.getAs[Long]("nodes")))
    assert(rows.toSeq == Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("BFS does not re-count already-visited nodes on a cycle") {
    // triangle: hop0 = {1}, hop1 = {2,3}, hop2 = {} (all visited)
    val dir = plant(Seq(Seq(1L, 2L, 3L)))
    val rows = SparkEntry.queries("q_graph_reach")(spark, dir)
      .collect().map(r => (r.getAs[Long]("hop"), r.getAs[Long]("nodes")))
    assert(rows.toSeq == Seq((0L, 1L), (1L, 2L)))
  }

  test("edgeless corpus: every graph key emits its empty/degenerate frame") {
    // single-item baskets produce no pairs — an edgeless graph
    val dir = plant(Seq(Seq(1L), Seq(2L)))
    assert(SparkEntry.queries("q_graph_degree")(spark, dir).count() == 0)
    assert(SparkEntry.queries("q_graph_jaccard")(spark, dir).count() == 0)
    assert(SparkEntry.queries("q_graph_link_predict")(spark, dir).count() == 0)
    assert(SparkEntry.queries("q_graph_pagerank")(spark, dir).count() == 0)
    assert(SparkEntry.queries("q_graph_ppr")(spark, dir).count() == 0)
    assert(SparkEntry.queries("q_graph_ppr_batch")(spark, dir).count() == 0)
    assert(SparkEntry.queries("q_graph_reach")(spark, dir).count() == 0)
    val census = SparkEntry.queries("q_graph_triangles")(spark, dir).collect()
    assert(census.length == 1)
    assert(census.head.getAs[Long]("triangles") == 0L)
    assert(census.head.isNullAt(census.head.fieldIndex("clustering_coef")))
  }

  test("wedgeless graph: census counts hold, coefficient is undefined") {
    // two disjoint edges: 4 nodes, 2 edges, 0 wedges, 0 triangles
    val dir = plant(Seq(Seq(1L, 2L), Seq(3L, 4L)))
    val r = SparkEntry.queries("q_graph_triangles")(spark, dir).collect().head
    assert(r.getAs[Long]("nodes") == 4L)
    assert(r.getAs[Long]("edges") == 2L)
    assert(r.getAs[Long]("wedges") == 0L)
    assert(r.getAs[Long]("triangles") == 0L)
    assert(r.isNullAt(r.fieldIndex("clustering_coef")))
  }

  test("seasonal components: planted histogram, out-of-window baskets excluded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_comp").toString
    val in = java.sql.Timestamp.valueOf("1995-02-01 00:00:00")
    val out = java.sql.Timestamp.valueOf("1996-02-01 00:00:00")
    // in-window: {1,2}, {3,4}, {5,6,7}, and {2,3} merges the first two
    // into one 4-node component -> sizes {4, 3}; the out-of-window
    // basket {8,9} must not appear
    val rows = Seq(
      (1L, 1L, in), (1L, 2L, in), (2L, 3L, in), (2L, 4L, in),
      (3L, 5L, in), (3L, 6L, in), (3L, 7L, in), (4L, 2L, in), (4L, 3L, in),
      (5L, 8L, out), (5L, 9L, out))
    rows.toDF("l_orderkey", "l_partkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val hist = SparkEntry.queries("q_graph_components")(spark, dir)
      .collect().map(r => (r.getAs[Long]("component_size"),
        r.getAs[Long]("n_components")))
    assert(hist.toSeq == Seq((3L, 1L), (4L, 1L)))
  }

  test("k-core: planted K5-plus-tail peels to exactly the clique") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kcore").toString
    val in = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
    // one basket {1..5} = K5 (degrees 4), tail basket {5,6}: node 6
    // (degree 1) peels in round 1, node 5 stays at degree 4
    val rows =
      (1L to 5L).map(p => (1L, p, in)) :+ (2L, 5L, in) :+ (2L, 6L, in)
    rows.toDF("l_orderkey", "l_partkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val core = SparkEntry.queries("q_graph_kcore")(spark, dir)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("core_degree")))
    assert(core.toSeq == (1L to 5L).map(n => (n, 4L)))
  }

  test("k-core: sub-core planted graph peels to empty") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kcore0").toString
    val in = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
    // a triangle is a 2-core; with k=4 everything peels (cascade)
    Seq((1L, 1L, in), (1L, 2L, in), (1L, 3L, in))
      .toDF("l_orderkey", "l_partkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    assert(SparkEntry.queries("q_graph_kcore")(spark, dir).count() == 0)
  }

  test("map-side pair expansion equals the self-join edge derivation (sf0.001)") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct()
    val naive = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val expanded = queries.Graphs.edgesForTest(spark, sf)
    assert(expanded.count() == naive.count())
    assert(expanded.except(naive).isEmpty && naive.except(expanded).isEmpty)
  }

  test("degree top-k fuses to TakeOrderedAndProject (no global sort)") {
    // the registered key returns a finished (materialized) frame whose
    // plan is an RDD scan — pin the build's own lazy plan instead
    val plan = queries.Graphs.lazyBuild("q_graph_degree", spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Sort ["), s"unexpected global sort:\n$plan")
  }

  test("jaccard top-k fuses to TakeOrderedAndProject; count joins don't SMJ") {
    val df = queries.Graphs.lazyBuild("q_graph_jaccard", spark, sf)
    df.collect() // AQE finalizes the join strategies
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    // the vocabulary-sized count frames must come in as broadcast
    // probes of the support-filtered pair frame, not sort-merge
    // exchanges (count the FINAL plan only — AQE's toString also
    // prints the initial plan, where checkpoint-hidden stats show SMJ)
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin"), finalPlan)
    assert(!finalPlan.contains("SortMergeJoin"), finalPlan)
  }

  test("uniform weights reproduce the unweighted pagerank exactly") {
    // every basket pair below co-occurs exactly once, so w = 1
    // everywhere and sw = degree: the weighted iteration's
    // (r DIV sw) * w must reduce to rank DIV degree term-for-term
    val dir = plant(Seq(Seq(1L, 2L, 3L), Seq(3L, 4L), Seq(4L, 5L)))
    val un = SparkEntry.queries("q_graph_pagerank")(spark, dir)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("rank_scaled")))
    val wt = SparkEntry.queries("q_graph_pagerank_weighted")(spark, dir)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("rank_scaled")))
    assert(un.nonEmpty && un.toSeq == wt.toSeq)
  }

  test("weighted pagerank follows the strong tie; unweighted is symmetric") {
    // path 1-2-3: pair (1,2) co-occurs in 9 orders, (2,3) in one.
    // Unweighted, nodes 1 and 3 are structurally symmetric (equal
    // ranks); weighted, node 2's mass flows 9:1 toward node 1 — the
    // ranking merchandisers want. The 2-cycle 4-5 (weight 5) must hold
    // the exact fixed point: (r DIV 5)*5 = r at r = scale (mod-5-free),
    // so weights cancel inside a regular structure.
    val baskets = Seq.fill(9)(Seq(1L, 2L)) ++ Seq(Seq(2L, 3L)) ++
      Seq.fill(5)(Seq(4L, 5L))
    val dir = plant(baskets)
    def ranks(key: String) = SparkEntry.queries(key)(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("rank_scaled"))).toMap
    val un = ranks("q_graph_pagerank")
    val wt = ranks("q_graph_pagerank_weighted")
    assert(un(1L) == un(3L))
    assert(wt(1L) > wt(3L))
    assert(wt(4L) == 1000000000000L && wt(5L) == 1000000000000L)
  }

  test("rank scale auto-sizes by digit count, capped at 1e12") {
    import queries.Graphs.rankScale
    assert(rankScale(0L) == 1000000000000L)
    assert(rankScale(1L) == 1000000000000L)
    assert(rankScale(540000L) == 1000000000000L) // cap ~1.004e12 -> 1e12
    assert(rankScale(600000L) == 100000000000L)  // past the former refusal
    assert(rankScale(6000000L) == 10000000000L)
    // digit-count flooring: cap exactly at a power of 10 stays there
    assert(rankScale(Long.MaxValue / (17L * 1000000000000L)) >= 10000000L)
    // headroom invariant: 17 * n * scale never overflows
    for (n <- Seq(1L, 540000L, 600000L, 54000000L, 1000000000L)) {
      val sc = rankScale(n)
      assert(BigInt(17) * BigInt(n) * BigInt(sc) < BigInt(Long.MaxValue))
    }
  }
}
