package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Round-18 measurements (rows pasted into SCALING.md, same protocol as
  * the other probes):
  *
  *  1. Funnel-store batch cost vs history: the SAME insert batch
  *     ingested into the (user, type, ts) cell artifact of a 1× vs 4×
  *     event history. Claim: flat — a batch costs one batch-sized
  *     aggregation to cell deltas + bucket-pruned merges.
  *  2. Funnel serving payoff + artifact reduction: the three funnel
  *     keys from the LOG (the registered path — runAuto over every
  *     event) vs from the ARTIFACT on a dense 8× log with duplicated
  *     step events; report the cell-count reduction (type filter ×
  *     duplicate collapse) alongside the read times.
  *  3. The SEQUENCE NOTCH (the documented refusal for paths /
  *     transitions / sessions): measure WHY no cell algebra exists —
  *     for a 1% event retraction wave, count the transition pairs
  *     INVALIDATED (either endpoint deleted) and CREATED (new
  *     prev→next links across the holes). Each deleted event
  *     invalidates up to 2 pairs and creates up to 1, so the touched
  *     set is ~3× the wave — but WHICH pairs requires each deleted
  *     event's ordered neighbors, i.e. state = the full per-user
  *     (ts, event_id, type) sequence: the log itself (reduction factor
  *     1.0 — vs the funnel store's measured cell reduction). Also
  *     report the live transitions recompute for scale: the honest
  *     day-2 cost IS the rescan.
  *
  * Run: `sbt "runMain graft.tools.Round18Probe [sfDir]"`. */
object Round18Probe {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/root/repo/target/round18probe"
    graft.LocalFs.rmrf(new java.io.File(out))
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.FunnelStore
    val steps = Seq("view", "click", "purchase")
    val gap = "24 hours"

    // ---- 1: batch cost vs history ----------------------------------------
    val events = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts")
      .localCheckpoint(true)
    val nEv = events.count()
    def copyE(i: Int) = events
      .withColumn("event_id", col("event_id") + i * 1000000000L)
      .withColumn("user_id", col("user_id") + i * 100000000L)
    val hist1 = copyE(0).localCheckpoint(true)
    val hist4 = (0 until 4).map(copyE).reduce(_ unionByName _)
      .localCheckpoint(true)
    val evBatch = events.filter(col("event_id") % 10 === 3)
      .select((col("event_id") + 9000000000L).as("event_id"),
        lit("insert").as("change_type"),
        lit(null).cast("bigint").as("old_user_id"),
        (col("user_id") + 900000000L).as("new_user_id"),
        lit(null).cast("string").as("old_event_type"),
        col("event_type").as("new_event_type"),
        lit(null).cast("timestamp_ntz").as("old_ts"),
        col("ts").as("new_ts"))
      .localCheckpoint(true)
    val nBatch = evBatch.count()
    FunnelStore.build(spark, s"$out/fun1", hist1, steps)
    FunnelStore.build(spark, s"$out/fun4", hist4, steps)
    val tF1 = time(FunnelStore.ingestBatch(spark, s"$out/fun1", evBatch, 0L, steps))
    val tF4 = time(FunnelStore.ingestBatch(spark, s"$out/fun4", evBatch, 0L, steps))
    println(f"[probe] funnel-store ingest: batch=$nBatch rows into 1x($nEv ev) " +
      f"${tF1}%.2f s vs 4x ${tF4}%.2f s (ratio ${tF4 / tF1}%.2f)")

    // ---- 2: serving payoff + reduction on a dense duplicated log ---------
    // same cells, 8x the step events (retries/refreshes duplicating
    // (user, type, ts)) — the regime where the cell collapse pays
    val dense = (0 until 8).map(i => events
      .withColumn("event_id", col("event_id") + i * 1000000000L))
      .reduce(_ unionByName _).localCheckpoint(true)
    val nDense = dense.count()
    FunnelStore.build(spark, s"$out/funDense", dense, steps)
    val nCells = FunnelStore.stepEvents(spark, s"$out/funDense").count()
    val tLive = time {
      graft.operators.Funnel.run(dense, steps, gap).collect()
      graft.operators.Funnel.latency(dense, steps, gap).collect()
      graft.operators.Funnel.runUnordered(dense, steps, gap).collect()
    }
    val tServed = time {
      FunnelStore.funnel(spark, s"$out/funDense", steps, gap).collect()
      FunnelStore.funnelLatency(spark, s"$out/funDense", steps, gap).collect()
      FunnelStore.funnelUnordered(spark, s"$out/funDense", steps, gap).collect()
    }
    println(f"[probe] funnel serve (dense: $nDense events -> $nCells cells, " +
      f"${nDense.toDouble / nCells}%.1fx reduction): log ${tLive}%.2f s vs " +
      f"artifact ${tServed}%.2f s (all three keys)")

    // ---- 3: the sequence notch -------------------------------------------
    // per-user consecutive pairs before/after a 1% retraction wave
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    def pairs(ev: org.apache.spark.sql.DataFrame) = ev
      .withColumn("nxt_id", lead("event_id", 1).over(w))
      .filter(col("nxt_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("nxt_id"))
    val doomed = events.filter(col("event_id") % 100 === 7)
    val nWave = doomed.count()
    val before = pairs(events).localCheckpoint(true)
    val after = pairs(events.join(doomed.select("event_id"), Seq("event_id"),
      "left_anti")).localCheckpoint(true)
    val invalidated = before.except(after).count()
    val created = after.except(before).count()
    val tTransLive = time(
      graft.queries.EventAnalytics.qEventTransitions.run(spark, sf).collect())
    println(f"[probe] sequence notch: a $nWave-event wave (1%% of $nEv) " +
      f"invalidates $invalidated pairs and creates $created — touched " +
      f"${(invalidated + created).toDouble / nWave}%.2fx the wave, located " +
      f"only via each deleted event's ordered neighbors (state = the full " +
      f"sequence; reduction 1.0x). Live transitions recompute: " +
      f"${tTransLive}%.2f s")

    // ---- 4: basket serving from the maintained co-purchase artifacts -----
    // the registered q_basket_pairs / q_basket_lift derivations from the
    // log vs GraphEdgeStore.basketPairs/basketLift from the edge +
    // counts + order-count stores; report the artifact-vs-log row shapes
    // honestly (pre-saturation the pair artifact EXCEEDS the log —
    // bounded by catalog², not corpus size, so the crossover is a scale
    // property, same as the counts store)
    import graft.streaming.GraphEdgeStore
    val liB = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .localCheckpoint(true)
    val nLi = liB.count()
    GraphEdgeStore.build(spark, s"$out/bEdges", liB)
    GraphEdgeStore.buildCounts(spark, s"$out/bCounts", liB)
    GraphEdgeStore.buildOrderCount(spark, s"$out/bOrd", liB)
    val nPairs = GraphEdgeStore.edges(spark, s"$out/bEdges").count()
    val tBLive = time {
      graft.queries.Commerce.qBasketPairs.run(spark, sf).collect()
      graft.queries.Commerce.qBasketLift.run(spark, sf).collect()
    }
    val tBServed = time {
      GraphEdgeStore.basketPairs(spark, s"$out/bEdges").collect()
      GraphEdgeStore.basketLift(spark, s"$out/bEdges", s"$out/bCounts",
        s"$out/bOrd").collect()
    }
    println(f"[probe] basket serve: log ($nLi lineitem rows) ${tBLive}%.2f s " +
      f"vs artifacts ($nPairs pair rows + part counts + 1-row n) " +
      f"${tBServed}%.2f s for both keys")

    spark.stop()
  }
}
