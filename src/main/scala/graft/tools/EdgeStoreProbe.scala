package graft.tools

import graft.{GraftSession, Tables}
import graft.streaming.{GraphEdgeStore, SnapshotStore}
import org.apache.spark.sql.functions._

/** Edge-store maintenance probe (round 14): the cost argument behind
  * GraphEdgeStore — maintaining the co-purchase edge list from CDC
  * batches vs re-deriving it from lineitem per query.
  *
  * Measures at sf0.1 (and a 4x growth fixture):
  *  - full rebuild cost (the per-query price every q_graph_* key pays
  *    today, and the periodic log-fold price of the store);
  *  - incremental cost of a 5%-of-orders batch (the day-2 price);
  *  - read cost of [[GraphEdgeStore.edges]] (version-log sum) vs the
  *    live lineitem derivation.
  *
  * The claim to validate: batch cost tracks the BATCH size, not the
  * corpus — so at 100 TB (where the order log dwarfs the edge list by
  * orders of magnitude and a day's arrivals are a sliver of history)
  * the maintained store wins by the corpus/batch ratio, while at probe
  * scale the win is modest because lineitem is only ~12x the edge
  * count. Prints rows for SCALING.md (pasted by hand).
  * Run: `sbt "runMain graft.tools.EdgeStoreProbe"`. */
object EdgeStoreProbe {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def timeMin(body: => Unit): Double = (1 to 3).map(_ => time(body)).min

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/root/repo/target/edgestoreprobe"
    graft.LocalFs.rmrf(new java.io.File(out))
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def probe(tag: String, copies: Int): Unit = {
      val base = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      val li = (0 until copies).map(i => base
          .withColumn("l_orderkey", col("l_orderkey") + i * 100000000L)
          .withColumn("l_partkey", col("l_partkey") + i * 10000000L))
        .reduce(_ unionByName _)
      li.write.mode("overwrite").parquet(s"$out/$tag/lineitem.parquet")
      val liP = spark.read.parquet(s"$out/$tag/lineitem.parquet")
      val rows = liP.count()
      // history = 95% of orders; batch = the remaining 5% (a day's
      // arrivals against ~3 weeks of history at this scale)
      val history = liP.filter(col("l_orderkey") % 20 =!= 0)
      val batch = liP.filter(col("l_orderkey") % 20 === 0)
        .withColumn("change_type", lit("insert"))
      val edgeDir = s"$out/$tag/edges"
      val tBuild = time(GraphEdgeStore.build(spark, edgeDir, history))
      val tBatch = time(GraphEdgeStore.ingestBatch(spark, edgeDir, batch, 0L))
      val tRead = timeMin(GraphEdgeStore.edges(spark, edgeDir).count())
      val tLive = timeMin(GraphEdgeStore.pairWeights(liP).count())
      val edges = GraphEdgeStore.edges(spark, edgeDir).count()
      val versions = SnapshotStore.currentManifest(spark, edgeDir)
        .map(_.version).getOrElse(-1L)
      // log-fold (round 15): edge-SIZED — reads the store's version log
      // and rewrites current sums, never the corpus. Compare to
      // `rebuild`, which shuffles the lineitem-sized axis: the fold is
      // the cheap periodic maintenance, the rebuild the expensive one.
      val rawBefore = SnapshotStore.read(spark, edgeDir).count()
      val tFold = time(GraphEdgeStore.foldEdges(spark, edgeDir))
      val rawAfter = SnapshotStore.read(spark, edgeDir).count()
      val tReadFolded = timeMin(GraphEdgeStore.edges(spark, edgeDir).count())
      println(f"$tag: lineitem=$rows%d edges=$edges%d " +
        f"rebuild=$tBuild%.2fs batch5pct=$tBatch%.2fs " +
        f"read=$tRead%.2fs live_derive=$tLive%.2fs versions=$versions%d " +
        f"fold=$tFold%.2fs rawrows=$rawBefore%d->$rawAfter%d " +
        f"read_folded=$tReadFolded%.2fs")
    }

    probe("x1", 1)
    probe("x4", 4)
    spark.stop()
  }
}
