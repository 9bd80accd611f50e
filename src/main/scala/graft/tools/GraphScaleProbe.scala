package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-analytics scaling probe (round 13): the co-purchase family
  * measured on its two bounding axes.
  *
  *  - GROWTH axis: 4 disjoint copies of the graph (part AND order id
  *    spaces shifted per copy) — 4x nodes, 4x edges, 4x triangles.
  *    Every key's plan is edge-list-shaped (keyed aggs + node-sized
  *    broadcasts), so cost should track the edge count with fleet
  *    parallelism, never a super-linear blowup. BFS reach explores
  *    only the seed's component, so its frontier work is flat while
  *    its adjacency scan grows 4x.
  *  - HUB-SKEW axis: one planted part in 10% of baskets with the
  *    SMALLEST id (0), giving it degree ~ the whole vocabulary. This
  *    is the shape that kills id-ordered triangle counting (the hub
  *    orients outward: its out-adjacency is vocabulary-sized and every
  *    hub edge intersects against it — on the wedge-join form this is
  *    a C(deg,2) ≈ 2e8-row wedge set). DEGREE orientation points every
  *    hub edge INWARD instead, so hub wedges are distributed across
  *    its (low-degree) neighbors and the bound survives. The probe
  *    runs the shipped degree-oriented census and an id-oriented twin
  *    on the same fixture and checks they agree exactly.
  *
  * Prints rows for SCALING.md (pasted by hand, same as the other
  * probes). Run: `sbt "runMain graft.tools.GraphScaleProbe"`. */
object GraphScaleProbe {

  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def timeMin(body: => Unit): Double = (1 to 3).map(_ => time(body)).min

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/root/repo/target/graphscale"
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // l_shipdate rides along so the seasonal keys (components, k-core)
    // see their window in the amplified fixture
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_shipdate")

    // growth axis: 4 disjoint (order, part) id spaces — 4 independent
    // copies of the same graph
    (0 until 4).map(i => li
        .withColumn("l_orderkey", col("l_orderkey") + i * 100000000L)
        .withColumn("l_partkey", col("l_partkey") + i * 10000000L))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/x4/lineitem.parquet")

    // hub-skew axis: part 0 (the minimum id) joins every 10th basket
    // (2-col projection — the census doesn't read the ship date)
    val li2 = li.select("l_orderkey", "l_partkey")
    li2.unionByName(
        li2.select(col("l_orderkey")).distinct()
          .where(col("l_orderkey") % 10 === 0)
          .withColumn("l_partkey", lit(0L)))
      .write.mode("overwrite").parquet(s"$out/hub/lineitem.parquet")

    val keys = Seq("q_graph_degree", "q_graph_jaccard", "q_graph_pagerank",
      "q_graph_ppr", "q_graph_ppr_batch", "q_graph_link_predict",
      "q_graph_triangles", "q_graph_reach",
      "q_graph_components", "q_graph_kcore")
    println(f"${"key"}%-22s ${"base_s"}%8s ${"x4_s"}%8s ratio")
    keys.foreach { k =>
      val q = SparkEntry.queries(k)
      val base = timeMin(q(spark, sf).collect())
      val x4 = timeMin(q(spark, s"$out/x4").collect())
      println(f"$k%-22s $base%8.2f $x4%8.2f ${x4 / base}%.1fx")
    }

    // hub skew: shipped degree-oriented census vs an id-oriented twin
    // (identical array_intersect shape, orientation u<v by id alone)
    def idOrientedTriangles(d: String): Long = {
      val e = graft.queries.Graphs.edgesForTest(spark, d)
      val outAdj = e.groupBy(col("u").as("a"))
        .agg(collect_list(col("v")).as("nbrs"))
      e.join(outAdj.select(col("a").as("u"), col("nbrs").as("na")), Seq("u"))
        .join(outAdj.select(col("a").as("v"), col("nbrs").as("nb")), Seq("v"))
        .select(size(array_intersect(col("na"), col("nb"))).as("t"))
        .agg(coalesce(sum(col("t")), lit(0L)))
        .head().getLong(0)
    }
    // pagerank auto-scale axis (round-13 verdict item #3): 16 disjoint
    // copies (~320k nodes at sf0.1 — scale stays 1e12) and a SYNTHETIC
    // >540k-node graph (the former fail-loud refusal bound): a 600k-node
    // cycle plus 9 hub parts with a triangular basket distribution
    // (distinct hub degrees -> distinct ranks). Both fixture dirs are
    // left on disk so `graft.Verify` + `tools/check.py` can hash-match
    // the oracle top-20 on them (the run recorded in SCALING.md).
    (0 until 16).map(i => li2
        .withColumn("l_orderkey", col("l_orderkey") + i * 100000000L)
        .withColumn("l_partkey", col("l_partkey") + i * 10000000L))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/x16/lineitem.parquet")
    val bigN = 600000L
    val ids = spark.range(bigN)
    ids.select(col("id").as("l_orderkey"), col("id").as("l_partkey"))
      .unionByName(ids.select(col("id").as("l_orderkey"),
        ((col("id") + 1) % bigN).as("l_partkey")))
      .unionByName(ids.select(col("id").as("l_orderkey"),
        (lit(bigN) + floor((sqrt(lit(8.0) * (col("id") % 45) + 1) - 1) / 2)
          .cast("long")).as("l_partkey")))
      .write.mode("overwrite").parquet(s"$out/big/lineitem.parquet")
    Seq("x16" -> s"$out/x16", "big" -> s"$out/big").foreach { case (tag, dirN) =>
      val t = timeMin(SparkEntry.queries("q_graph_pagerank")(spark, dirN).collect())
      val nodes = graft.queries.Graphs.edgesForTest(spark, dirN)
        .select(explode(array(col("u"), col("v"))).as("n"))
        .distinct().count()
      println(f"pagerank auto-scale [$tag]: $nodes nodes, " +
        f"scale=${graft.queries.Graphs.rankScale(nodes)}, $t%.2f s")
    }

    val censusQ = SparkEntry.queries("q_graph_triangles")
    var degTri = 0L
    val tDeg = timeMin {
      degTri = censusQ(spark, s"$out/hub").collect().head.getAs[Long]("triangles")
    }
    var idTri = 0L
    val tId = timeMin { idTri = idOrientedTriangles(s"$out/hub") }
    require(degTri == idTri,
      s"orientation changed the exact census: deg=$degTri id=$idTri")
    println(f"hub-skew triangles: degree-oriented $tDeg%.2f s vs " +
      f"id-oriented $tId%.2f s (${tId / tDeg}%.1fx), census agrees ($degTri)")

    spark.stop()
  }
}
