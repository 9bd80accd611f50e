package graft.tools

import graft.{GraftSession, Tables}
import graft.queries.GateMemo
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-18 optimization probes (guide §1: measure first). Times
  * candidate plan variants for the expensive families against the
  * shipped formulation, printing min-of-3 seconds and the result
  * cardinality (a variant that changes the answer is disqualified on
  * the spot). `runMain graft.tools.OptProbe <edges|melt|iter> [sfDir]`. */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def tmin(label: String)(body: => Unit): Unit =
      println(f"$label: ${(1 to 3).map(_ => t(body)).min}%.2f s")

    def li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")

    args.headOption.getOrElse("edges") match {
      case "edges" =>
        // stage split of the shipped derivation
        tmin("A0 scan+baskets (collect_set agg only)") {
          graft.queries.Baskets.baskets(li).count()
        }
        tmin("A1 baskets+pairs (no distinct)") {
          graft.queries.Baskets.pairs(graft.queries.Baskets.baskets(li), "u", "v").count()
        }
        tmin("A  shipped: pairs.distinct.localCheckpoint") {
          val e = graft.queries.Baskets
            .pairs(graft.queries.Baskets.baskets(li), "u", "v")
            .distinct().localCheckpoint(true)
          println(s"   rows=${e.count()}")
          GateMemo.unpersistCheckpoint(e)
        }
        // B: collect_list basket + double explode + value filter (no
        // sort_array, no nested HOF struct allocation; final distinct
        // absorbs within-order duplicates exactly like the shipped form)
        tmin("B  collect_list + double explode") {
          val e = li.groupBy("l_orderkey")
            .agg(collect_list(col("l_partkey")).as("basket"))
            .select(explode(col("basket")).as("u"), col("basket"))
            .select(col("u"), explode(col("basket")).as("v"))
            .where(col("u") < col("v"))
            .distinct().localCheckpoint(true)
          println(s"   rows=${e.count()}")
          GateMemo.unpersistCheckpoint(e)
        }
        // C: collect_set basket + double explode
        tmin("C  collect_set + double explode") {
          val e = li.groupBy("l_orderkey")
            .agg(collect_set(col("l_partkey")).as("basket"))
            .select(explode(col("basket")).as("u"), col("basket"))
            .select(col("u"), explode(col("basket")).as("v"))
            .where(col("u") < col("v"))
            .distinct().localCheckpoint(true)
          println(s"   rows=${e.count()}")
          GateMemo.unpersistCheckpoint(e)
        }
        // D: the oracle's self-join shape
        tmin("D  distinct li self-join") {
          val dli = li.distinct()
          val e = dli.as("a").join(dli.as("b"),
              col("a.l_orderkey") === col("b.l_orderkey") &&
                col("a.l_partkey") < col("b.l_partkey"))
            .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
            .distinct().localCheckpoint(true)
          println(s"   rows=${e.count()}")
          GateMemo.unpersistCheckpoint(e)
        }
        // E: shipped pair expansion, but skip the per-order distinct
        // (collect_list) — within-order dup pairs die in the final
        // distinct; saves the set dedup per group. Needs sort_array
        // for the i<j expansion to stay canonical.
        tmin("E  sorted collect_list + HOF pairs") {
          val baskets = li.groupBy("l_orderkey")
            .agg(sort_array(collect_list(col("l_partkey"))).as("basket"))
          val e = graft.queries.Baskets.pairs(baskets, "u", "v")
            .where(col("u") =!= col("v"))
            .distinct().localCheckpoint(true)
          println(s"   rows=${e.count()}")
          GateMemo.unpersistCheckpoint(e)
        }
        // weighted twin of the winner shape: per-order distinct is
        // REQUIRED (weight = n orders containing both), so collect_set
        tmin("W0 shipped weighted: pairs groupBy count") {
          val e = graft.queries.Baskets
            .pairs(graft.queries.Baskets.baskets(li), "u", "v")
            .groupBy("u", "v").agg(count(lit(1)).as("w"))
            .localCheckpoint(true)
          println(s"   rows=${e.count()}")
          GateMemo.unpersistCheckpoint(e)
        }
        tmin("W1 weighted via double explode") {
          val e = li.groupBy("l_orderkey")
            .agg(collect_set(col("l_partkey")).as("basket"))
            .select(explode(col("basket")).as("u"), col("basket"))
            .select(col("u"), explode(col("basket")).as("v"))
            .where(col("u") < col("v"))
            .groupBy("u", "v").agg(count(lit(1)).as("w"))
            .localCheckpoint(true)
          println(s"   rows=${e.count()}")
          GateMemo.unpersistCheckpoint(e)
        }
      case "melt" =>
        val tables = graft.queries.Catalog.relTables.map { case (tname, _) =>
          tname -> Tables.load(spark, sf, tname) }
        tmin("A  shipped discover (string melt)") {
          println(s"   rows=${graft.catalog.Relations.discover(tables).count()}")
        }
        // long-typed melt: all candidate columns here are integral, so
        // CAST(v AS STRING) is injective — identical counts guaranteed
        tmin("B  long melt variant") {
          val melted = tables.flatMap { case (tn, df) =>
            val cols = graft.catalog.Relations.idLikeColumns(df)
            if (cols.isEmpty) None else Some(
              df.select(explode(array(cols.map(c =>
                struct(lit(c).as("col"), col(c).cast("long").as("v"))): _*)).as("cv"))
                .select(lit(tn).as("tbl"), col("cv.col").as("col"), col("cv.v").as("v"))
                .where(col("v").isNotNull))
          }.reduce(_ union _)
          println(s"   rows=${graft.catalog.Relations.scoreMelted(melted, 0.5).count()}")
        }
      case "iter" =>
        // pagerank iteration: shipped (per-iteration deg join) vs
        // degree-annotated adjacency (one join per iteration)
        val e = graft.queries.Baskets
          .pairs(graft.queries.Baskets.baskets(li), "u", "v")
          .distinct().localCheckpoint(true)
        def symmetrize(d: DataFrame) =
          d.select(col("u").as("src"), col("v").as("dst"))
            .unionByName(d.select(col("v").as("src"), col("u").as("dst")))
        val adj = symmetrize(e)
        val deg = adj.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("degree")).localCheckpoint(true)
        val scale = graft.queries.Graphs.rankScale(deg.count())
        val damp = 3L * scale / 20L
        tmin("A  shipped 3-iteration pagerank tail") {
          var r = deg.select(col("node"), lit(scale).as("r"))
          for (_ <- 1 to 3) {
            val contrib = r.join(deg, "node")
              .select(col("node").as("src"), expr("r DIV degree").as("c"))
            r = adj.join(contrib, "src")
              .groupBy(col("dst").as("node"))
              .agg((lit(damp) + expr("(17 * sum(c)) DIV 20")).as("r"))
          }
          val out = r.orderBy(col("r").desc, col("node")).limit(20).collect()
          println(s"   top=${out.head}")
        }
        tmin("B  degree-annotated adjacency") {
          val adjd = adj.join(deg.withColumnRenamed("node", "src"), "src")
            .localCheckpoint(true)
          var r = deg.select(col("node").as("src"), lit(scale).as("r"))
          for (_ <- 1 to 3) {
            r = adjd.join(r, "src")
              .groupBy(col("dst").as("src"))
              .agg((lit(damp) + expr("(17 * sum(r DIV degree)) DIV 20")).as("r"))
          }
          val out = r.select(col("src").as("node"), col("r"))
            .orderBy(col("r").desc, col("node")).limit(20).collect()
          println(s"   top=${out.head}")
          GateMemo.unpersistCheckpoint(adjd)
        }
        // triangles tail: shipped recomputes outAdj per probe join —
        // checkpoint it once instead
        val du = deg.select(col("node").as("u"), col("degree").as("du"))
        val dv = deg.select(col("node").as("v"), col("degree").as("dv"))
        val oriented = e.join(du, "u").join(dv, "v")
          .select(
            when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
              struct(col("u").as("a"), col("v").as("b")))
              .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("o"))
          .select(col("o.a"), col("o.b"))
          .localCheckpoint(true)
        tmin("T-A shipped triangles tail (outAdj twice)") {
          val outAdj = oriented.groupBy(col("a"))
            .agg(collect_list(col("b")).as("nbrs"))
          val tri = oriented
            .join(outAdj.select(col("a"), col("nbrs").as("na")), Seq("a"))
            .join(outAdj.select(col("a").as("b"), col("nbrs").as("nb")), Seq("b"))
            .select(size(array_intersect(col("na"), col("nb"))).as("t"))
            .agg(coalesce(sum(col("t")), lit(0L)).as("triangles"))
          println(s"   tri=${tri.collect().head}")
        }
        tmin("T-B triangles tail (outAdj checkpointed once)") {
          val outAdj = oriented.groupBy(col("a"))
            .agg(collect_list(col("b")).as("nbrs")).localCheckpoint(true)
          val tri = oriented
            .join(outAdj.select(col("a"), col("nbrs").as("na")), Seq("a"))
            .join(outAdj.select(col("a").as("b"), col("nbrs").as("nb")), Seq("b"))
            .select(size(array_intersect(col("na"), col("nb"))).as("t"))
            .agg(coalesce(sum(col("t")), lit(0L)).as("triangles"))
          println(s"   tri=${tri.collect().head}")
          GateMemo.unpersistCheckpoint(outAdj)
        }
        GateMemo.unpersistCheckpoint(e)
        GateMemo.unpersistCheckpoint(deg)
      case "planfinal" =>
        // final ADAPTIVE plan of a graph key's LAZY build (the registered
        // key returns a finished RDD scan; PlanProbe `final` can't see it)
        Seq("q_graph_pagerank", "q_graph_pagerank_weighted", "q_graph_ppr",
          "q_graph_ppr_batch").foreach { key =>
          val df = graft.queries.Graphs.lazyBuild(key, spark, sf)
          df.collect()
          val plan = df.queryExecution.executedPlan.toString
          val fin = plan.split("== Initial Plan ==").head
          def n(p: String, s: String) = p.r.findAllIn(s).length
          println(s"=== $key FINAL: BHJ=${n("BroadcastHashJoin", fin)} " +
            s"SMJ=${n("SortMergeJoin", fin)} SHJ=${n("ShuffledHashJoin", fin)} " +
            s"| FULL: SMJ=${n("SortMergeJoin", plan)}")
        }
      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }
}
