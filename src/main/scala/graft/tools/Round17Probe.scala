package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Round-17 measurements (rows pasted into SCALING.md, same protocol as
  * the other probes):
  *
  *  1. Activity-store batch cost vs history: the SAME insert batch
  *     ingested into the (day, user) artifact of a 1× vs 4× event
  *     history. Claim: a batch costs one batch-sized aggregation to
  *     pair-deltas + bucket-pruned merges — the artifact's size never
  *     appears. Report the ratio (flat expected).
  *  2. Activity serving payoff: DAU/WAU from the LOG (the registered
  *     key's path — distinct over every event) vs from the ARTIFACT
  *     (net-sum over users×days rows) on the 4× history. This is the
  *     read a monitoring loop repeats; the gap is the store's reason
  *     to exist and widens linearly with events-per-(user, day).
  *  3. Sketch-catalog batch cost: the SAME insert batch as a 'delta'
  *     against 1× vs 4× table history (claim: flat — the delta path
  *     reads only the batch), vs the DELETE-triggered 'full' rebuild
  *     at both histories (claim: honestly table-sized — the documented
  *     KMV-cannot-subtract cost).
  *  4. Catalog serving payoff: the relationship verdict set computed
  *     three ways over the same four-table catalog — exact discovery
  *     (data-sized value exchange), live sketch discovery (data scan,
  *     k-bounded exchange), and store-served (artifact-only). The
  *     served read is what a continuous catalog repeats per arrival.
  *
  * Run: `sbt "runMain graft.tools.Round17Probe [sfDir]"`. */
object Round17Probe {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/root/repo/target/round17probe"
    graft.LocalFs.rmrf(new java.io.File(out))
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.catalog.Relations
    import graft.streaming.{ActivityStore, SketchCatalogStore}

    // ---- 1+2: activity store --------------------------------------------
    val events = Tables.events(spark, sf).select("event_id", "ts", "user_id")
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
        lit(null).cast("timestamp_ntz").as("old_ts"),
        col("ts").as("new_ts"),
        lit(null).cast("bigint").as("old_user_id"),
        (col("user_id") + 900000000L).as("new_user_id"))
      .localCheckpoint(true)
    val nBatch = evBatch.count()
    ActivityStore.build(spark, s"$out/act1", hist1)
    ActivityStore.build(spark, s"$out/act4", hist4)
    val tA1 = time(ActivityStore.ingestBatch(spark, s"$out/act1", evBatch, 0L))
    val tA4 = time(ActivityStore.ingestBatch(spark, s"$out/act4", evBatch, 0L))
    println(f"[probe] activity ingest: batch=$nBatch rows into 1x($nEv ev) " +
      f"${tA1}%.2f s vs 4x ${tA4}%.2f s (ratio ${tA4 / tA1}%.2f)")
    // serving payoff needs a DENSE log (the regime the store exists
    // for): same (user, day) pairs, 8× the events — the driver's
    // synthetic log has ~1 event per pair, where log and artifact are
    // the same size and no read can win
    val dense = (0 until 8).map(i => events
      .withColumn("event_id", col("event_id") + i * 1000000000L))
      .reduce(_ unionByName _).localCheckpoint(true)
    ActivityStore.build(spark, s"$out/actDense", dense)
    val tLive = time(graft.queries.EventAnalytics.activeUsersFrom(
      dense.select(to_date(date_trunc("day", col("ts"))).as("d"),
        col("user_id")).distinct()).collect())
    val tServed = time(
      ActivityStore.activeUsers(spark, s"$out/actDense").collect())
    println(f"[probe] activity serve (dense: ${8 * nEv} events, " +
      f"same pairs): log ${tLive}%.2f s vs artifact ${tServed}%.2f s")

    // ---- 3: sketch catalog batch paths ----------------------------------
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .localCheckpoint(true)
    val nOrd = orders.count()
    def copyO(i: Int) = orders
      .withColumn("o_orderkey", col("o_orderkey") + i * 1000000000L)
      .withColumn("o_custkey", col("o_custkey") + i * 100000000L)
    val ord1 = copyO(0).localCheckpoint(true)
    val ord4 = (0 until 4).map(copyO).reduce(_ unionByName _)
      .localCheckpoint(true)
    val ordBatch = orders.filter(col("o_orderkey") % 10 === 3)
      .select((col("o_orderkey") + 9000000000L).as("o_orderkey"),
        lit("insert").as("change_type"),
        lit(null).cast("bigint").as("old_o_custkey"),
        (col("o_custkey") + 900000000L).as("new_o_custkey"))
      .localCheckpoint(true)
    SketchCatalogStore.build(spark, s"$out/sk1", "orders", ord1)
    SketchCatalogStore.build(spark, s"$out/sk4", "orders", ord4)
    val tD1 = time(SketchCatalogStore.ingestBatch(spark, s"$out/sk1",
      "orders", ordBatch, 0L, Seq("o_orderkey"), ord1))
    val tD4 = time(SketchCatalogStore.ingestBatch(spark, s"$out/sk4",
      "orders", ordBatch, 0L, Seq("o_orderkey"), ord4))
    val del = orders.limit(1)
      .select(col("o_orderkey"), lit("delete").as("change_type"),
        col("o_custkey").as("old_o_custkey"),
        lit(null).cast("bigint").as("new_o_custkey"))
    val tR1 = time(SketchCatalogStore.ingestBatch(spark, s"$out/sk1",
      "orders", del, 1L, Seq("o_orderkey"), ord1))
    val tR4 = time(SketchCatalogStore.ingestBatch(spark, s"$out/sk4",
      "orders", del, 1L, Seq("o_orderkey"), ord4))
    println(f"[probe] sketch-catalog ingest (1x=$nOrd orders): delta " +
      f"${tD1}%.2f s vs 4x ${tD4}%.2f s (ratio ${tD4 / tD1}%.2f); " +
      f"delete-rebuild ${tR1}%.2f s vs 4x ${tR4}%.2f s (ratio ${tR4 / tR1}%.2f)")

    // ---- 4: catalog serving payoff --------------------------------------
    val catalog = Seq(
      "orders_s" -> Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
      "customer_s" -> Tables.customer(spark, sf)
        .select("c_custkey", "c_nationkey"),
      "nation" -> Tables.nation(spark, sf).select("n_nationkey", "n_regionkey"),
      "region" -> Tables.region(spark, sf).select("r_regionkey"))
    catalog.foreach { case (t, df) =>
      SketchCatalogStore.build(spark, s"$out/cat", t, df) }
    val tExact = time(Relations.discover(catalog).collect())
    val tSkLive = time(Relations.sketchDiscover(catalog).collect())
    val tSkServed = time(SketchCatalogStore.discover(spark, s"$out/cat").collect())
    println(f"[probe] catalog verdicts: exact ${tExact}%.2f s, live-sketch " +
      f"${tSkLive}%.2f s, store-served ${tSkServed}%.2f s")

    spark.stop()
  }
}
