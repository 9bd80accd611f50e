package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** One-off plan/timing inspector (diagnostic tool).
  * `runMain graft.tools.PlanProbe shingles|recursive`. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.headOption.getOrElse("shingles") match {
      case "recursive" =>
        val sf = "/root/testdata/sf0.1"
        def run(): Long =
          graft.SparkEntry.queries("q_cte_recursive")(spark, sf).count()
        def t(body: => Long): Double = {
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        run() // warm
        val aqeOn = (1 to 3).map(_ => t(run())).min
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val aqeOff = (1 to 3).map(_ => t(run())).min
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        println(f"=== q_cte_recursive min-of-3: AQE on $aqeOn%.2fs / off $aqeOff%.2fs")
      case "graphstages" =>
        // where the graph keys' seconds go: edge derivation vs the
        // per-key algorithmic tail
        val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
        def t(body: => Unit): Double = {
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        def tmin(body: => Unit): Double = (1 to 3).map(_ => t(body)).min
        println(f"edges (derive+checkpoint): ${
          tmin(graft.queries.Graphs.edgesForTest(spark, sf).count())}%.2f s")
        Seq("q_graph_degree", "q_graph_pagerank", "q_graph_reach",
          "q_graph_triangles").foreach { k =>
          println(f"$k full: ${
            tmin(graft.SparkEntry.queries(k)(spark, sf).collect())}%.2f s")
        }
      case "final" =>
        // post-execution ADAPTIVE plan for a registered key: the static
        // explain shows SMJ for joins whose build side hides behind a
        // checkpoint (unknown stats); AQE re-plans from actual shuffle
        // sizes, and this is where that decision is observable
        val key = args.lift(1).getOrElse("q_graph_triangles")
        val sf = args.lift(2).getOrElse("/root/testdata/sf0.1")
        val df = graft.SparkEntry.queries(key)(spark, sf)
        df.collect()
        // AQE's toString prints the final plan AND a "== Initial Plan =="
        // section (the PlanSpec-documented hazard) — count only the
        // final subtree or initial-plan SMJs contaminate the report
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        def n(p: String) = p.r.findAllIn(plan).length
        println(s"=== $key final plan: BroadcastHashJoin=${n("BroadcastHashJoin")} " +
          s"SortMergeJoin=${n("SortMergeJoin")} ShuffledHashJoin=${n("ShuffledHashJoin")} " +
          s"BroadcastNestedLoop=${n("BroadcastNestedLoopJoin")}")
      case _ =>
        val docs = Tables.documents(spark, "/root/testdata/sf0.01")
        val sh = graft.functions.TextOps.shingleRows(docs, "doc_id", "text", 3)
        val plan = sh.queryExecution.executedPlan.toString
        val nSplit = "split\\(".r.findAllIn(plan).size
        println(s"=== split() occurrences in physical plan: $nSplit")
        println(plan.take(4000))
    }
    spark.stop()
  }
}
