package graft.examples

import graft.{GraftSession, Tables}
import graft.streaming.{GraphEdgeStore, SnapshotStore, Streams}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The graph day-2 loop — [[IncrementalIngestDemo]]'s arc applied to
  * the co-purchase analytics surface. The premise: at 100 TB, graph
  * questions ("who are the hubs", "what's similar to X", "what bundle
  * should exist") must be answered from MAINTAINED artifacts, because
  * re-deriving the edge list means re-shuffling the whole order log
  * per question. The demo runs the loop an operator would:
  *
  *   day-0 backfill → CDC feed → edge + degree + count stores
  *     (GraphEdgeStore.maintainFromCdc; one streaming drain maintains
  *     all three artifacts exactly-once)
  *   → SERVE from the artifacts, cross-checked against the live
  *     lineitem derivation every day:
  *       hub watch      = topHubs over the NODE-sized degree store
  *       similarity     = Graphs.jaccardFrom(edge store, count store)
  *       link prediction = Graphs.linkPredictFrom(store edges w ≥ 2)
  *   → day-1 arrivals drain incrementally (batch-sized work);
  *     a crash replay of the drained feed must be a version no-op on
  *     ALL THREE stores
  *   → day-2 is a cancellation wave + fresh arrivals in one drain:
  *     the stores must net out to exactly the reduced corpus.
  *
  * Every served frame is compared EXACTLY (not approximately) against
  * the live derivation over the same corpus — the artifacts are a
  * cache with a proof, not a lossy summary.
  *
  * Run: `sbt "runMain graft.examples.GraphServingDemo [sfDir] [outRoot]"`.
  */
object GraphServingDemo {

  final case class DayReport(
      day: String,
      storeEdges: Long,             // current weighted edge count
      hubsEqualBatch: Boolean,      // topHubs == live degree top-20
      jaccardServedEqualsLive: Boolean,
      linkPredictServedEqualsLive: Boolean)

  final case class FinalReport(
      replayNoopAllStores: Boolean, // drained-feed re-drain: no version moves
      cancellationNetsOut: Boolean, // day-2 delete+insert == reduced corpus
      foldReclaimedRows: Boolean)   // day-3 log-fold shrank every store's raw log

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty

  def run(spark: SparkSession, sfDir: String, outRoot: String)
      : (Seq[DayReport], FinalReport) = {
    graft.LocalFs.rmrf(new java.io.File(outRoot))
    val liDir = s"$outRoot/lineitem_store"
    val cdcDir = s"$outRoot/cdc"
    val edgeDir = s"$outRoot/edges"
    val degDir = s"$outRoot/degrees"
    val cntDir = s"$outRoot/counts"
    val ckpt = s"$outRoot/ckpt"
    val keys = Seq("l_orderkey", "l_partkey")

    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      .distinct().localCheckpoint(true)
    val day0 = li.filter(col("l_orderkey") % 20 < 18)
    val day1 = li.filter(col("l_orderkey") % 20 === 18)
    val day2 = li.filter(col("l_orderkey") % 20 === 19)

    def drain(): Unit = GraphEdgeStore.maintainFromCdc(spark, cdcDir,
      edgeDir, ckpt, degreeDir = Some(degDir), countsDir = Some(cntDir))

    // the live twins, derived from the order log for the cross-checks
    def liveWeighted(corpus: DataFrame): DataFrame =
      GraphEdgeStore.pairWeights(corpus)
    def liveCounts(corpus: DataFrame): DataFrame =
      corpus.groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
    def liveDegreesTop(corpus: DataFrame): DataFrame = {
      val e = liveWeighted(corpus).select("u", "v")
      e.select(col("u").as("node")).unionByName(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
        .orderBy(col("degree").desc, col("node")).limit(20)
    }

    def serve(day: String, corpus: DataFrame): DayReport = {
      val storeE = GraphEdgeStore.edges(spark, edgeDir).localCheckpoint(true)
      val storeN = GraphEdgeStore.partCounts(spark, cntDir)
      val hubsEq = GraphEdgeStore.topHubs(spark, degDir)
        .collect().toSeq == liveDegreesTop(corpus).collect().toSeq
      val jacEq = graft.queries.Graphs.jaccardFrom(storeE, storeN)
        .collect().toSeq ==
        graft.queries.Graphs.jaccardFrom(
          liveWeighted(corpus), liveCounts(corpus)).collect().toSeq
      val lpEq = graft.queries.Graphs.linkPredictFrom(
          storeE.filter(col("w") >= 2).select("u", "v"))
        .collect().toSeq ==
        graft.queries.Graphs.linkPredictFrom(
          liveWeighted(corpus).filter(col("w") >= 2).select("u", "v"))
          .collect().toSeq
      val r = DayReport(day, storeE.count(), hubsEq, jacEq, lpEq)
      graft.queries.GateMemo.unpersistCheckpoint(storeE)
      r
    }

    // day 0: backfill through the same CDC path arrivals use
    Streams.cdcBatch(spark, liDir, cdcDir, day0, keys)
    drain()
    val r0 = serve("day0", day0)

    // day 1: incremental arrivals — batch-sized drain
    Streams.cdcBatch(spark, liDir, cdcDir, day1, keys)
    drain()
    val r1 = serve("day1", day0.unionByName(day1))

    // crash replay: the drained feed must start no batch — no version
    // moves on any store
    def versions(): Seq[Option[Long]] = Seq(edgeDir, degDir, cntDir)
      .map(dr => SnapshotStore.currentManifest(spark, dr).map(_.version))
    val vBefore = versions()
    drain()
    val replayNoop = versions() == vBefore

    // day 2: one cancelled order plus fresh arrivals, one drain
    val doomedK = day1.agg(min("l_orderkey")).head().getLong(0)
    Streams.cdcDeleteBatch(spark, liDir, cdcDir,
      li.filter(col("l_orderkey") === doomedK), keys)
    Streams.cdcBatch(spark, liDir, cdcDir, day2, keys)
    drain()
    val corpus2 = li.filter(col("l_orderkey") =!= doomedK)
    val r2 = serve("day2", corpus2)
    val netsOut = sameRows(GraphEdgeStore.edges(spark, edgeDir),
      liveWeighted(corpus2))

    // day 3: compaction window — fold each store's version log into a
    // fresh BaseVer base (the log-structured design's periodic
    // maintenance). The raw logs shrink; every served surface must be
    // bit-identical, because the fold changes REPRESENTATION, not state.
    def rawRows(): Seq[Long] = Seq(edgeDir, degDir, cntDir)
      .map(dr => SnapshotStore.read(spark, dr).count())
    val rowsBefore = rawRows()
    GraphEdgeStore.foldEdges(spark, edgeDir)
    GraphEdgeStore.foldDegrees(spark, degDir)
    GraphEdgeStore.foldCounts(spark, cntDir)
    val rowsAfter = rawRows()
    val foldReclaimed = rowsAfter.zip(rowsBefore).forall { case (a, b) =>
      a <= b } && rowsAfter.sum < rowsBefore.sum
    val r3 = serve("day3_folded", corpus2)

    // day 4: the compacted store is a normal store — fresh arrivals
    // (new orders over a new part range, so the edge set genuinely
    // grows) drain against it and serving stays exact
    val day4 = day2.withColumn("l_orderkey", col("l_orderkey") + 100000000L)
      .withColumn("l_partkey", col("l_partkey") + 10000000L)
    Streams.cdcBatch(spark, liDir, cdcDir, day4, keys)
    drain()
    val r4 = serve("day4", corpus2.unionByName(day4))

    (Seq(r0, r1, r2, r3, r4), FinalReport(replayNoop, netsOut, foldReclaimed))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outRoot = args.lift(1).getOrElse("/root/repo/target/graph_serving_demo")
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (days, fin) = run(spark, sfDir, outRoot)
    days.foreach(println)
    println(fin)
    spark.stop()
  }
}
