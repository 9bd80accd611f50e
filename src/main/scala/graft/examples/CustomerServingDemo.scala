package graft.examples

import graft.{GraftSession, Tables}
import graft.catalog.Relations
import graft.streaming.{ActivityStore, FunnelStore, RfmStore, SketchCatalogStore, SnapshotStore, Streams}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The customer-analytics day-2 loop — [[GraphServingDemo]]'s arc
  * applied to the round-17/18 maintained stores, COMPOSED. Each store
  * is gate-proven alone (`q_gate_store_active_users` / `_retention` /
  * `_funnel` / `_rfm` / `_ltv`); this demo runs them as one pipeline,
  * which is how an operator actually deploys them:
  *
  *   - ONE events CDC feed fans out to TWO consumers — the
  *     [[ActivityStore]] (day, user) frame and the [[FunnelStore]]
  *     (user, step, ts) cell frame — each with its own drain
  *     checkpoint, so the same arrival wave advances both artifacts
  *     exactly-once and neither consumer can starve the other.
  *   - The orders CDC feed drains into the [[RfmStore]] (customer,
  *     day) frame, serving RFM segmentation AND cohort LTV from one
  *     artifact.
  *   - BOTH feeds additionally drain into ONE [[SketchCatalogStore]]
  *     (the catalog axis): per-column KMV sketches of events and
  *     orders are maintained next to a statically-sketched customer
  *     dimension, so FK discovery (orders.o_custkey → customer
  *     .c_custkey) and the cardinality gauge serve without scanning
  *     either table — and the GDPR delete wave exercises the store's
  *     honest discipline (KMV cannot subtract → per-table rebuild)
  *     inside the same composed drain that nets the other artifacts.
  *   - Every serving surface is cross-checked EXACTLY against the live
  *     derivation over the maintained tables' current content: DAU/WAU,
  *     cohort retention, the ordered funnel + any-order twin, RFM, LTV.
  *   - day-1 arrivals land on BOTH axes in one wave; a crash replay of
  *     the drained feeds must be a version no-op on ALL FOUR artifacts.
  *   - day-2 is the wave the composition exists for: one GDPR erasure
  *     request wipes a user set from the EVENTS axis and the SAME
  *     subjects' orders from the COMMERCE axis — every store nets the
  *     wipe out of its own algebra (signed counts / signed cells), and
  *     every serving surface matches a live recompute over the reduced
  *     corpora.
  *   - day-3 folds all four version logs; serving is bit-invariant
  *     (a fold changes representation, not state).
  *
  * Run: `sbt "runMain graft.examples.CustomerServingDemo [sfDir] [outRoot]"`.
  */
object CustomerServingDemo {

  final case class DayReport(
      day: String,
      activeUsersEq: Boolean,   // served DAU/WAU/stickiness == live
      retentionEq: Boolean,     // served cohort retention == live
      funnelEq: Boolean,        // served ordered funnel == live
      funnelUnorderedEq: Boolean,
      rfmEq: Boolean,           // served RFM segmentation == live
      ltvEq: Boolean,           // served cohort LTV == live
      catalogSketchEq: Boolean, // maintained KMV sketches == fresh rescan
      fkServedOk: Boolean)      // served FK verdicts == exact discovery,
                                //   orders→customer edge present

  final case class FinalReport(
      replayNoopAllStores: Boolean, // re-drain moved no artifact version
      wipedBothAxes: Boolean,       // doomed subjects gone from activity AND rfm
      wipeNonVacuous: Boolean,      // ... and they existed before the wave
      foldReclaimedRows: Boolean)   // day-3 folds shrank the raw logs

  private val Steps = Seq("view", "click", "purchase")
  private val Gap = "24 hours"

  def run(spark: SparkSession, sfDir: String, outRoot: String)
      : (Seq[DayReport], FinalReport) = {
    graft.LocalFs.rmrf(new java.io.File(outRoot))
    val evDir = s"$outRoot/events_store"
    val ordDir = s"$outRoot/orders_store"
    val evCdc = s"$outRoot/events_cdc"
    val ordCdc = s"$outRoot/orders_cdc"
    val actDir = s"$outRoot/activity"
    val funDir = s"$outRoot/funnel"
    val rfmDir = s"$outRoot/rfm"
    val skDir = s"$outRoot/sketches"
    val evKeys = Seq("event_id")
    val ordKeys = Seq("o_orderkey")

    val ev = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type")
      .localCheckpoint(true)
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .localCheckpoint(true)
    // the static dimension the catalog axis discovers orders against
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey").localCheckpoint(true)
    SketchCatalogStore.build(spark, skDir, "customer", cust)

    // one drain() advances every consumer: the events feed fans out to
    // activity + funnel + catalog (separate checkpoints over the SAME
    // feed), the orders feed to rfm + catalog
    def drain(): Unit = {
      ActivityStore.maintainFromCdc(spark, evCdc, actDir,
        s"$outRoot/ckpt_act")
      FunnelStore.maintainFromCdc(spark, evCdc, funDir,
        s"$outRoot/ckpt_fun", Steps)
      RfmStore.maintainFromCdc(spark, ordCdc, rfmDir,
        s"$outRoot/ckpt_rfm")
      SketchCatalogStore.maintainFromCdc(spark, evCdc, skDir,
        s"$outRoot/ckpt_sk_ev", "events", evDir, evKeys)
      SketchCatalogStore.maintainFromCdc(spark, ordCdc, skDir,
        s"$outRoot/ckpt_sk_ord", "orders", ordDir, ordKeys)
    }

    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq

    // live twins over the maintained tables' CURRENT content — the
    // same artifact-free recomputes the store gates pin against
    def liveActivityPairs(): DataFrame =
      SnapshotStore.read(spark, evDir)
        .select(to_date(date_trunc("day", col("ts"))).as("d"),
          col("user_id"))
        .distinct()
    def liveEvents(): DataFrame = SnapshotStore.read(spark, evDir)
    def liveStats(): DataFrame =
      SnapshotStore.read(spark, ordDir).groupBy("o_custkey").agg(
        count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100, 0).cast("bigint")).as("cents"),
        max("o_orderdate").as("last_o"))
    def liveLtvCells(): DataFrame =
      SnapshotStore.read(spark, ordDir).select(col("o_custkey"),
        col("o_orderdate").as("d"),
        round(col("o_totalprice") * 100, 0).cast("bigint").as("cents"))

    // the catalog axis' live twins: fresh sketches / exact discovery
    // over the maintained tables' current content + the static dim
    def catalogNow(): Seq[(String, DataFrame)] = Seq(
      "events" -> SnapshotStore.read(spark, evDir),
      "orders" -> SnapshotStore.read(spark, ordDir),
      "customer" -> cust)
    def fkOf(df: DataFrame): Seq[String] =
      df.filter(col("verdict") === "fk_candidate")
        .select("table_a", "col_a", "table_b", "col_b")
        .collect().map(_.toString).toSeq.sorted

    def serve(day: String): DayReport = {
      import graft.queries.{Commerce, EventAnalytics}
      val servedFk = fkOf(SketchCatalogStore.discover(spark, skDir))
      DayReport(day,
        activeUsersEq = rows(ActivityStore.activeUsers(spark, actDir)) ==
          rows(EventAnalytics.activeUsersFrom(liveActivityPairs())),
        retentionEq = rows(ActivityStore.retentionCohort(spark, actDir)) ==
          rows(EventAnalytics.retentionCohortFrom(liveActivityPairs())),
        funnelEq = rows(FunnelStore.funnel(spark, funDir, Steps, Gap)) ==
          rows(graft.operators.Funnel.run(liveEvents(), Steps, Gap)),
        funnelUnorderedEq =
          rows(FunnelStore.funnelUnordered(spark, funDir, Steps, Gap)) ==
            rows(graft.operators.Funnel.runUnordered(liveEvents(), Steps, Gap)),
        rfmEq = rows(RfmStore.rfm(spark, rfmDir)) ==
          rows(Commerce.rfmFrom(liveStats())),
        ltvEq = rows(RfmStore.cohortLtv(spark, rfmDir)) ==
          rows(Commerce.cohortLtvFrom(liveLtvCells())),
        catalogSketchEq =
          rows(SketchCatalogStore.sketches(spark, skDir)).sorted ==
            rows(Relations.columnSketches(catalogNow())).sorted,
        fkServedOk = servedFk == fkOf(Relations.discover(catalogNow())) &&
          servedFk.contains("[orders,o_custkey,customer,c_custkey]"))
    }

    // day 0: backfill BOTH axes through the same CDC path arrivals use
    Streams.cdcBatch(spark, evDir, evCdc,
      ev.filter(col("event_id") % 10 =!= 0), evKeys)
    Streams.cdcBatch(spark, ordDir, ordCdc,
      ord.filter(col("o_orderkey") % 10 =!= 0), ordKeys)
    drain()
    val r0 = serve("day0")

    // day 1: one arrival wave lands on both axes, one composed drain
    Streams.cdcBatch(spark, evDir, evCdc,
      ev.filter(col("event_id") % 10 === 0), evKeys)
    Streams.cdcBatch(spark, ordDir, ordCdc,
      ord.filter(col("o_orderkey") % 10 === 0), ordKeys)
    drain()
    val r1 = serve("day1")

    // crash replay: the drained feeds must start no batch anywhere
    def versions(): Seq[Option[Long]] = Seq(actDir, funDir, rfmDir, skDir)
      .map(dr => SnapshotStore.currentManifest(spark, dr).map(_.version))
    val vBefore = versions()
    drain()
    val replayNoop = versions() == vBefore

    // day 2: ONE GDPR erasure request, BOTH axes — the composed wave.
    // The same subject-id rule picks the doomed users' events and the
    // doomed customers' orders; the signed-algebra stores (activity /
    // funnel / rfm) net them out, while the KMV catalog takes its
    // honest per-table rebuild (sketches cannot subtract) — both
    // disciplines inside one drain.
    def doomedActive(): Long = ActivityStore.activity(spark, actDir)
      .filter(col("user_id") % 37 === 0).count()
    def doomedRfm(): Long = RfmStore.customerStats(spark, rfmDir)
      .filter(col("o_custkey") % 37 === 0).count()
    val hadSubjects = doomedActive() > 0 && doomedRfm() > 0
    Streams.cdcDeleteBatch(spark, evDir, evCdc,
      SnapshotStore.read(spark, evDir)
        .filter(col("user_id") % 37 === 0).select("event_id"), evKeys)
    Streams.cdcDeleteBatch(spark, ordDir, ordCdc,
      SnapshotStore.read(spark, ordDir)
        .filter(col("o_custkey") % 37 === 0).select("o_orderkey"), ordKeys)
    drain()
    val wiped = doomedActive() == 0 && doomedRfm() == 0
    // the delete wave must have routed the catalog down its rebuild
    // path: a post-base 'full' sketch row for the mutated tables
    val catalogRebuilt = SnapshotStore.read(spark, skDir)
      .filter(col("kind") === "full" && col("ver") >= 0L &&
        col("tbl").isin("events", "orders"))
      .select("tbl").distinct().count() == 2L
    val r2 = serve("day2_gdpr")

    // day 3: compaction window — fold every version log; serving must
    // be bit-invariant because a fold changes representation, not state
    def rawRows(): Seq[Long] = Seq(actDir, funDir, rfmDir, skDir)
      .map(dr => SnapshotStore.read(spark, dr).count())
    val rowsBefore = rawRows()
    ActivityStore.fold(spark, actDir)
    FunnelStore.fold(spark, funDir)
    RfmStore.fold(spark, rfmDir)
    SketchCatalogStore.compact(spark, skDir)
    val rowsAfter = rawRows()
    val foldReclaimed = rowsAfter.zip(rowsBefore).forall { case (a, b) =>
      a <= b } && rowsAfter.sum < rowsBefore.sum
    val r3 = serve("day3_folded")

    graft.queries.GateMemo.unpersistCheckpoint(ev)
    graft.queries.GateMemo.unpersistCheckpoint(ord)
    graft.queries.GateMemo.unpersistCheckpoint(cust)
    (Seq(r0, r1, r2, r3),
      FinalReport(replayNoop, wiped && catalogRebuilt, hadSubjects,
        foldReclaimed))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outRoot = args.lift(1).getOrElse(
      "/root/repo/target/customer_serving_demo")
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
