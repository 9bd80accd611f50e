package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral-analytics scaling probe (round 12): the three event-log
  * keys measured against amplified logs, each on the axis that stresses
  * its claimed bound.
  *
  *  - `q_funnel` (Funnel.run) on TWO axes. More USERS (key-shifted
  *    copies — the horizontal-growth axis a 100 TB log actually grows
  *    on): every stage is a keyed agg + co-keyed join, so time should
  *    track rows with fleet-size parallelism. More EVENTS PER USER
  *    (same users, timestamp-jittered copies — the power-user axis):
  *    a hot user must stay ONE aggregation cell per stage (min-ts
  *    partial agg combines map-side), so cost follows the scan, not a
  *    per-user blowup.
  *  - `q_retention_cohort`: user axis — the cohort×offset summary must
  *    stay calendar-bounded (same row count at 4× users) while the
  *    distinct shuffle grows linearly.
  *  - `q_timeseries_fill` (TimeSeriesFill.hourly) on the TIME-SPAN
  *    axis (copies shifted by +30 days each): the spine — and with it
  *    the per-series sequential carry — grows with CALENDAR time, not
  *    data volume; the probe pins that 4× span costs ~4× spine rows
  *    through 5 series-parallel tasks, while 4× denser data over the
  *    SAME span leaves the carry untouched (only the hash agg grows).
  *
  * Prints rows for SCALING.md (pasted by hand, same as the other
  * probes). Run: `sbt "runMain graft.tools.EventScaleProbe"`. */
object EventScaleProbe {

  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def timeMin(body: => Unit): Double = (1 to 3).map(_ => time(body)).min

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/root/repo/target/eventscale"
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev1 = Tables.events(spark, sf)

    // 4x users: disjoint user-id spaces, same time span
    (0 until 4).map(i => ev1
        .withColumn("user_id", col("user_id") + i * 1000000L)
        .withColumn("event_id", col("event_id") + i * 10000000L))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/ev4_users")
    // 4x events per user: same users, copies jittered by +i seconds —
    // every user is 4x hotter, the span and user base are unchanged
    (0 until 4).map(i => ev1
        .withColumn("ts", col("ts") + expr(s"INTERVAL $i SECOND"))
        .withColumn("event_id", col("event_id") + i * 10000000L))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/ev4_dense")
    // 4x time span: copies shifted +30 days each — same density, the
    // spine (and the sequential carry) grows 4x
    (0 until 4).map(i => ev1
        .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 30} DAY"))
        .withColumn("event_id", col("event_id") + i * 10000000L))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/ev4_span")

    def rd(p: String) = spark.read.parquet(s"$out/$p")

    def funnel(d: DataFrame): Long =
      graft.operators.Funnel
        .run(d, Seq("view", "click", "purchase"), "24 hours").count()
    def retention(d: DataFrame): Long = {
      val first = d.groupBy("user_id")
        .agg(to_date(date_trunc("day", min("ts"))).as("cohort_day"))
      d.join(first, "user_id")
        .select(col("cohort_day"),
          datediff(to_date(date_trunc("day", col("ts"))), col("cohort_day"))
            .as("day_offset"), col("user_id"))
        .distinct()
        .groupBy("cohort_day", "day_offset").agg(count(lit(1))).count()
    }
    def fill(d: DataFrame): Long =
      graft.operators.TimeSeriesFill
        .hourly(d, "event_type", "ts", "value").count()

    val f1 = timeMin { funnel(ev1) }
    val fU = timeMin { funnel(rd("ev4_users")) }
    val fD = timeMin { funnel(rd("ev4_dense")) }
    println(f"FUNNEL 1x: $f1%.2f s")
    println(f"FUNNEL 4x users: $fU%.2f s (${fU / f1}%.1fx)")
    println(f"FUNNEL 4x per-user density: $fD%.2f s (${fD / f1}%.1fx)")

    val r1 = timeMin { retention(ev1) }
    val rU = timeMin { retention(rd("ev4_users")) }
    val rows1 = retention(ev1); val rowsU = retention(rd("ev4_users"))
    println(f"RETENTION 1x: $r1%.2f s ($rows1 summary rows)")
    println(f"RETENTION 4x users: $rU%.2f s (${rU / r1}%.1fx), " +
      f"$rowsU summary rows (${rowsU.toDouble / rows1}%.1fx)")

    // one-scan vs K-scan funnel (round-12 verdict item #6): the K-scan
    // plan's bet is that type pruning makes each stage cheap — so probe
    // the shape that breaks the bet (funnel steps COVER the log: the
    // log filtered to exactly the step types, densified 4x) against the
    // shape that rewards it (full log, steps are 3 of the types)
    rd("ev4_dense").filter(col("event_type").isin("view", "click", "purchase"))
      .write.mode("overwrite").parquet(s"$out/ev4_steps_only")
    def funnel1(d: DataFrame): Long =
      graft.operators.Funnel
        .runOneScan(d, Seq("view", "click", "purchase"), "24 hours").count()
    val kScanMixed = timeMin { funnel(rd("ev4_dense")) }
    val oneScanMixed = timeMin { funnel1(rd("ev4_dense")) }
    val kScanCover = timeMin { funnel(rd("ev4_steps_only")) }
    val oneScanCover = timeMin { funnel1(rd("ev4_steps_only")) }
    println(f"FUNNEL K-scan, steps 3-of-5 types (4x dense): $kScanMixed%.2f s")
    println(f"FUNNEL one-scan, steps 3-of-5 types (4x dense): $oneScanMixed%.2f s")
    println(f"FUNNEL K-scan, steps cover log (4x dense): $kScanCover%.2f s")
    println(f"FUNNEL one-scan, steps cover log (4x dense): $oneScanCover%.2f s")

    // round-13 keys, each on its bounding axis: the DAU/WAU summary is
    // CALENDAR-bounded (4x users must not grow the output), the
    // transition matrix is VOCABULARY-bounded (4x per-user density
    // grows only the lead() window's input, never the output)
    def activeUsers(d: DataFrame): Long = {
      val act = d.select(to_date(date_trunc("day", col("ts"))).as("dy"),
        col("user_id")).distinct()
      val hi = act.agg(max("dy")).head().getDate(0)
      val contrib = act.select(explode(sequence(col("dy"),
        least(date_add(col("dy"), 6), lit(hi)))).as("wend"), col("user_id"))
        .distinct()
      contrib.groupBy("wend").agg(count(lit(1))).count()
    }
    def transitions(d: DataFrame): Long = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      d.select(col("event_type"),
          lead("event_type", 1).over(w).as("nt"))
        .filter(col("nt").isNotNull)
        .groupBy("event_type", "nt").agg(count(lit(1))).count()
    }
    // the HLL twin: no (user, day) distinct shuffle at all — daily
    // state is a fixed-size sketch, so the user axis moves only the
    // map-side sketch updates
    def activeUsersSketch(d: DataFrame): Long = {
      val daily = d.select(to_date(date_trunc("day", col("ts"))).as("dy"),
        col("user_id")).groupBy("dy")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .localCheckpoint(true)
      val hi = daily.agg(max("dy")).head().getDate(0)
      daily.select(explode(sequence(col("dy"),
          least(date_add(col("dy"), 6), lit(hi)))).as("wend"), col("sk"))
        .groupBy("wend").agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
        .count()
    }
    val a1 = timeMin { activeUsers(ev1) }
    val aU = timeMin { activeUsers(rd("ev4_users")) }
    val rowsA1 = activeUsers(ev1); val rowsAU = activeUsers(rd("ev4_users"))
    println(f"ACTIVE_USERS 1x: $a1%.2f s ($rowsA1 summary rows)")
    println(f"ACTIVE_USERS 4x users: $aU%.2f s (${aU / a1}%.1fx), " +
      f"$rowsAU rows (${rowsAU.toDouble / rowsA1}%.1fx)")
    val as1 = timeMin { activeUsersSketch(ev1) }
    val asU = timeMin { activeUsersSketch(rd("ev4_users")) }
    println(f"ACTIVE_USERS_SKETCH 1x: $as1%.2f s")
    println(f"ACTIVE_USERS_SKETCH 4x users: $asU%.2f s (${asU / as1}%.1fx)")
    // the crossover claim at 16x users: the exact path's cost is the
    // (user, day) distinct + the 7-way expanded distinct (both grow
    // with users), the sketch's daily state stays fixed-size — so the
    // exact:sketch ratio must WIDEN from 4x to 16x
    (0 until 4).map(i => rd("ev4_users")
        .withColumn("user_id", col("user_id") + i * 1000000000L)
        .withColumn("event_id", col("event_id") + i * 1000000000L))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/ev16_users")
    val a16 = timeMin { activeUsers(rd("ev16_users")) }
    val as16 = timeMin { activeUsersSketch(rd("ev16_users")) }
    println(f"ACTIVE_USERS 16x users: $a16%.2f s " +
      f"(exact:sketch ${a16 / as16}%.1fx, was ${aU / asU}%.1fx at 4x)")
    println(f"ACTIVE_USERS_SKETCH 16x users: $as16%.2f s")
    val t1 = timeMin { transitions(ev1) }
    val tD = timeMin { transitions(rd("ev4_dense")) }
    val rowsT1 = transitions(ev1); val rowsTD = transitions(rd("ev4_dense"))
    println(f"TRANSITIONS 1x: $t1%.2f s ($rowsT1 matrix rows)")
    println(f"TRANSITIONS 4x per-user density: $tD%.2f s (${tD / t1}%.1fx), " +
      f"$rowsTD rows (${rowsTD.toDouble / rowsT1}%.1fx)")

    val s1 = timeMin { fill(ev1) }
    val sS = timeMin { fill(rd("ev4_span")) }
    val sD = timeMin { fill(rd("ev4_dense")) }
    val g1 = fill(ev1); val gS = fill(rd("ev4_span"))
    println(f"FILL 1x: $s1%.2f s ($g1 grid rows)")
    println(f"FILL 4x span: $sS%.2f s (${sS / s1}%.1fx), $gS grid rows (${gS.toDouble / g1}%.1fx)")
    println(f"FILL 4x density, same span: $sD%.2f s (${sD / s1}%.1fx), grid unchanged")

    // round-13 additions, driven through the REGISTERED keys (the
    // amplified frames are staged as <dir>/events.parquet so the Q
    // lambdas run verbatim): paths + attribution on the USER axis
    // (their per-user windows/aggs must track rows; their outputs are
    // vocabulary-bounded), LTV + RFM on the CUSTOMER axis of an
    // amplified order book (per-customer shuffles track rows; the LTV
    // summary is calendar-bounded, the RFM summary ≤4³ cells).
    ev1.write.mode("overwrite").parquet(s"$out/dir1x/events.parquet")
    rd("ev4_users").write.mode("overwrite")
      .parquet(s"$out/dir4u/events.parquet")
    def paths(d: String): Long =
      graft.queries.EventAnalytics.qEventPaths.run(spark, d).count()
    def attribution(d: String): Long =
      graft.queries.EventAnalytics.qAttribution.run(spark, d).count()
    val p1 = timeMin { paths(s"$out/dir1x") }
    val pU = timeMin { paths(s"$out/dir4u") }
    val rowsP1 = paths(s"$out/dir1x"); val rowsPU = paths(s"$out/dir4u")
    println(f"PATHS 1x: $p1%.2f s ($rowsP1 path rows)")
    println(f"PATHS 4x users: $pU%.2f s (${pU / p1}%.1fx), " +
      f"$rowsPU rows (${rowsPU.toDouble / rowsP1}%.1fx)")
    val at1 = timeMin { attribution(s"$out/dir1x") }
    val atU = timeMin { attribution(s"$out/dir4u") }
    println(f"ATTRIBUTION 1x: $at1%.2f s")
    println(f"ATTRIBUTION 4x users: $atU%.2f s (${atU / at1}%.1fx)")

    val o1 = Tables.orders(spark, sf)
    o1.write.mode("overwrite").parquet(s"$out/ord1x/orders.parquet")
    (0 until 4).map(i => o1
        .withColumn("o_custkey", col("o_custkey") + i * 10000000L)
        .withColumn("o_orderkey", col("o_orderkey") + i * 100000000L))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/ord4x/orders.parquet")
    def ltv(d: String): Long =
      graft.queries.Commerce.qCohortLtv.run(spark, d).count()
    def rfm(d: String): Long =
      graft.queries.Commerce.qRfm.run(spark, d).count()
    val l1 = timeMin { ltv(s"$out/ord1x") }
    val lC = timeMin { ltv(s"$out/ord4x") }
    val rowsL1 = ltv(s"$out/ord1x"); val rowsLC = ltv(s"$out/ord4x")
    println(f"COHORT_LTV 1x: $l1%.2f s ($rowsL1 summary rows)")
    println(f"COHORT_LTV 4x customers: $lC%.2f s (${lC / l1}%.1fx), " +
      f"$rowsLC rows (${rowsLC.toDouble / rowsL1}%.1fx)")
    val m1 = timeMin { rfm(s"$out/ord1x") }
    val mC = timeMin { rfm(s"$out/ord4x") }
    val rowsM1 = rfm(s"$out/ord1x"); val rowsMC = rfm(s"$out/ord4x")
    println(f"RFM 1x: $m1%.2f s ($rowsM1 cells)")
    println(f"RFM 4x customers: $mC%.2f s (${mC / m1}%.1fx), $rowsMC cells")
    def repeat(d: String): Long =
      graft.queries.Commerce.qRepeatPurchase.run(spark, d).count()
    val rp1 = timeMin { repeat(s"$out/ord1x") }
    val rpC = timeMin { repeat(s"$out/ord4x") }
    println(f"REPEAT_PURCHASE 1x: $rp1%.2f s")
    println(f"REPEAT_PURCHASE 4x customers: $rpC%.2f s (${rpC / rp1}%.1fx)")

    // basket pairs on the ORDER axis (amplified lineitem, disjoint
    // orderkey spaces): the self-join's pair volume is basket-bounded,
    // so 4x orders must cost ~4x pairs — linear, never quadratic
    val li1 = Tables.lineitem(spark, sf)
    li1.write.mode("overwrite").parquet(s"$out/li1x/lineitem.parquet")
    (0 until 4).map(i => li1
        .withColumn("l_orderkey", col("l_orderkey") + i * 100000000L))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/li4x/lineitem.parquet")
    def basket(d: String): Long =
      graft.queries.Commerce.qBasketPairs.run(spark, d).count()
    // pair volume (pre-top-k) on each book, for the linearity check
    def pairVolume(d: String): Long = {
      val li = spark.read.parquet(s"$d/lineitem.parquet")
        .select("l_orderkey", "l_partkey").distinct()
        .groupBy("l_orderkey").agg(count(lit(1)).as("k"))
      li.agg(sum(expr("k * (k - 1) / 2"))).head().getDouble(0).toLong
    }
    val b1 = timeMin { basket(s"$out/li1x") }
    val bC = timeMin { basket(s"$out/li4x") }
    val pv1 = pairVolume(s"$out/li1x"); val pvC = pairVolume(s"$out/li4x")
    println(f"BASKET_PAIRS 1x: $b1%.2f s ($pv1 candidate pairs)")
    println(f"BASKET_PAIRS 4x orders: $bC%.2f s (${bC / b1}%.1fx), " +
      f"$pvC pairs (${pvC.toDouble / pv1}%.1fx)")

    spark.stop()
  }
}
