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
        tmin("A  shipped discover") {
          println(s"   rows=${graft.catalog.Relations.discover(tables).count()}")
        }
      case "melt2" =>
        val tables = graft.queries.Catalog.relTables.map { case (tname, _) =>
          tname -> Tables.load(spark, sf, tname) }
        tmin("B  long melt (shipped after r18 batch 1)") {
          println(s"   rows=${graft.catalog.Relations.discover(tables).count()}")
        }
        // C: additionally encode (tbl, col) as one small int through the
        // data-sized exchange; decode on the catalog-sized count frame
        tmin("C  int-coded long melt") {
          val cols: Seq[(String, String)] = tables.flatMap { case (tn, df) =>
            graft.catalog.Relations.idLikeColumns(df).map(c => (tn, c)) }
          val code: Map[(String, String), Int] =
            cols.zipWithIndex.map { case (tc, i) =>
              tc -> ((tables.indexWhere(_._1 == tc._1) << 12) | i) }.toMap
          val melted = tables.flatMap { case (tn, df) =>
            val cs = graft.catalog.Relations.idLikeColumns(df)
            if (cs.isEmpty) None else Some(
              df.select(explode(array(cs.map(c =>
                struct(lit(code((tn, c))).as("tc"), col(c).cast("long").as("v"))): _*)).as("cv"))
                .select(col("cv.tc").as("tc"), col("cv.v").as("v"))
                .where(col("v").isNotNull))
          }.reduce(_ union _)
          val columnSets = melted.groupBy("v")
            .agg(collect_set(col("tc")).as("cs"))
          val memberships = concat(
            transform(col("cs"), a => struct(a.as("ta"), lit(-1).as("tb"))),
            flatten(transform(col("cs"), a =>
              transform(filter(col("cs"), b => b.bitwiseAND(lit(0x7FF000)) > a.bitwiseAND(lit(0x7FF000))),
                b => struct(a.as("ta"), b.as("tb"))))))
          val counts = columnSets
            .select(explode(memberships).as("m"))
            .groupBy(col("m.ta").as("ta"), col("m.tb").as("tb"))
            .agg(count(lit(1)).as("n"))
            .localCheckpoint(true)
          import spark.implicits._
          val decode = broadcast(code.toSeq.map { case ((t, c), i) => (i, t, c) }
            .toDF("i", "tbl", "col"))
          val card = counts.where(col("tb") === -1)
            .join(decode, col("ta") === col("i"))
            .select(col("tbl"), col("col"), col("n").as("nd"))
          val oneWay = counts.where(col("tb") =!= -1)
          val inter = oneWay.select(col("ta"), col("tb"), col("n"))
            .unionByName(oneWay.select(col("tb").as("ta"), col("ta").as("tb"), col("n")))
            .join(decode.select(col("i"), col("tbl").as("table_a"), col("col").as("col_a")), col("ta") === col("i"))
            .join(decode.select(col("i").as("i2"), col("tbl").as("table_b"), col("col").as("col_b")), col("tb") === col("i2"))
            .select(col("table_a"), col("col_a"), col("table_b"), col("col_b"), col("n").as("n_common"))
          val containment = col("n_common").cast("double") / col("nd")
          val out = inter
            .join(broadcast(card), col("table_a") === col("tbl") && col("col_a") === col("col"))
            .where(containment >= 0.5)
            .select(col("table_a"), col("col_a"), col("table_b"), col("col_b"),
              col("n_common").cast("bigint").as("n_common"),
              round(containment, 4).as("containment"))
            .orderBy("table_a", "col_a", "table_b", "col_b")
          println(s"   rows=${out.count()}")
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
      case "micro" =>
        // where the clustering/iteration keys' seconds go, and whether
        // AQE re-planning of micro-rounds is a measurable tax (the
        // q_cte_recursive precedent measured ~20%)
        def docs = Tables.documents(spark, sf)
        tmin("shingle distinct (strings, shipped)") {
          graft.functions.TextOps.shingleRows(docs, "doc_id", "text", 3)
            .select(col("doc_id"), xxhash64(col("shingle")).as("s")).count()
        }
        tmin("shingle distinct (hash-first)") {
          val ws = col("__ws")
          docs.select(col("doc_id"), graft.functions.TextOps.tokens(col("text")).as("__ws"))
            .filter(size(ws) >= 3)
            .select(col("doc_id"), ws, posexplode(sequence(lit(1), size(ws) - 2)))
            .select(col("doc_id"), xxhash64(concat_ws(" ",
              (0 until 3).map(k => element_at(ws, col("col") + k)): _*)).as("s"))
            .distinct().count()
        }
        tmin("nearDupPairs full") {
          println("   pairs=" +
            graft.queries.Extensions.nearDupPairs(spark, sf, 0.2).count())
        }
        Seq("q_dedup_cluster_star", "q_graph_reach", "q_graph_components")
          .foreach { k =>
            tmin(s"$k AQE on ") {
              graft.SparkEntry.queries(k)(spark, sf).count() }
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            tmin(s"$k AQE off") {
              graft.SparkEntry.queries(k)(spark, sf).count() }
            spark.conf.set("spark.sql.adaptive.enabled", "true")
          }
      case "reach" =>
        val e = graft.queries.Baskets
          .pairs(graft.queries.Baskets.baskets(li), "u", "v")
          .distinct().localCheckpoint(true)
        def symmetrize(d: DataFrame) =
          d.select(col("u").as("src"), col("v").as("dst"))
            .unionByName(d.select(col("v").as("src"), col("u").as("dst")))
        import spark.implicits._
        tmin("A shipped reach tail (adj checkpointed)") {
          val adj = symmetrize(e).localCheckpoint(true)
          val seed = adj.agg(min("src")).head().getLong(0)
          var visited = Seq((seed, 0L)).toDF("node", "hop")
          var frontier = Seq(seed).toDF("node")
          var hops = Seq.empty[DataFrame]
          for (h <- 1 to 3) {
            val next = adj.join(frontier, adj("src") === frontier("node"))
              .select(col("dst").as("node")).distinct()
              .join(visited.select("node"), Seq("node"), "left_anti")
              .localCheckpoint(true)
            hops :+= next
            visited = visited.unionByName(next.withColumn("hop", lit(h.toLong)))
            frontier = next
          }
          println("   " + visited.groupBy("hop").agg(count(lit(1)).as("nodes"))
            .orderBy("hop").collect().mkString(","))
          (adj +: hops).foreach(GateMemo.unpersistCheckpoint)
        }
        tmin("B lazy adj + seed from e") {
          val adj = symmetrize(e)
          val seed = e.agg(min("u")).head().getLong(0)
          var visited = Seq((seed, 0L)).toDF("node", "hop")
          var frontier = Seq(seed).toDF("node")
          var hops = Seq.empty[DataFrame]
          for (h <- 1 to 3) {
            val next = adj.join(frontier, adj("src") === frontier("node"))
              .select(col("dst").as("node")).distinct()
              .join(visited.select("node"), Seq("node"), "left_anti")
              .localCheckpoint(true)
            hops :+= next
            visited = visited.unionByName(next.withColumn("hop", lit(h.toLong)))
            frontier = next
          }
          println("   " + visited.groupBy("hop").agg(count(lit(1)).as("nodes"))
            .orderBy("hop").collect().mkString(","))
          hops.foreach(GateMemo.unpersistCheckpoint)
        }
        tmin("C anti-join BEFORE distinct") {
          val adj = symmetrize(e).localCheckpoint(true)
          val seed = adj.agg(min("src")).head().getLong(0)
          var visited = Seq((seed, 0L)).toDF("node", "hop")
          var frontier = Seq(seed).toDF("node")
          var hops = Seq.empty[DataFrame]
          for (h <- 1 to 3) {
            val next = adj.join(frontier, adj("src") === frontier("node"))
              .select(col("dst").as("node"))
              .join(visited.select("node"), Seq("node"), "left_anti")
              .distinct()
              .localCheckpoint(true)
            hops :+= next
            visited = visited.unionByName(next.withColumn("hop", lit(h.toLong)))
            frontier = next
          }
          println("   " + visited.groupBy("hop").agg(count(lit(1)).as("nodes"))
            .orderBy("hop").collect().mkString(","))
          (adj +: hops).foreach(GateMemo.unpersistCheckpoint)
        }
        GateMemo.unpersistCheckpoint(e)
      case "coalesce" =>
        // cross-cutting trial: AQE coalescing with parallelismFirst=false
        // (the Spark-docs-recommended production setting — respect the
        // advisory partition size instead of padding parallelism). At
        // sf0.1 most post-shuffle partitions are tiny, so `true` keeps
        // ~cores partitions of a few KB each; `false` collapses them.
        val keys = Seq(
          "q_fn_math", "q_fn_string", "q_win_rank", "q_win_frame",
          "q_agg_group", "q_agg_distinct", "q_join_inner", "q_join_outer",
          "q_sort", "q_project", "q_union", "q_tfidf", "q_text_search",
          "q_active_users", "q_event_paths", "q_session_stats",
          "q_timeseries_fill", "q_topk_agg", "q_lateral", "q_subquery",
          "q_neardup", "q_dedup_cluster", "q_profile_fd", "q_trending")
        Seq("true", "false", "true", "false").foreach { pf =>
          spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
          val total = keys.map { k =>
            val fn = graft.SparkEntry.queries(k)
            (1 to 3).map(_ => t(fn(spark, sf).count())).min
          }.sum
          println(f"parallelismFirst=$pf%-5s total(${keys.size} keys): $total%.2f s")
        }
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
