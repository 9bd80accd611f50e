package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed sequential funnel over an event log — the step AFTER
  * sessionization that every product-analytics engine ships: of the
  * users who did step 1, how many went on to do step 2 within the
  * conversion window, then step 3, … in timestamp order. The window
  * matters: an unconstrained "ever did B after A" funnel saturates on
  * any long-lived log (every active user eventually does everything);
  * the per-step deadline is what makes the measurement behavioral.
  *
  * Semantics (the standard ordered-funnel definition): a user's step-1
  * time is their FIRST step-1 event; their step-k time is their first
  * step-k event STRICTLY after the step-(k−1) time and within `maxGap`
  * of it. Users are counted once per step they reach; conversion is
  * relative to the step-1 population.
  *
  * Scale shape: one type-pruned scan + hash aggregation per step —
  * the event-type filter reaches the parquet scan (PushedFilters), so
  * each stage reads only its step's rows, not the log. The frontier
  * (user_id, t) shrinks monotonically step over step and joins the next
  * stage on user_id — the same shuffle key every stage, so AQE plans
  * them as co-partitioned exchanges, and a skewed power-user is a
  * single aggregation cell, never a cross product (each stage keeps one
  * row per user). The final per-step counts are K one-row aggregates
  * unioned — the K-row window that derives conversion is driver-trivial
  * by construction, not a scale hazard.
  *
  * [[runOneScan]] is the measured alternative for logs where the funnel
  * steps cover MOST event types (so K type-pruned scans re-read nearly
  * the whole log K times): one scan, one shuffle on user, a per-user
  * time-ordered fold. SCALING.md "Behavioral analytics" holds the
  * crossover measurements; both formulations are hash-identical on the
  * spec corpus (FunnelSpec pins it).
  */
object Funnel {

  private val IntervalUnits = Set("nanosecond", "microsecond",
    "millisecond", "second", "minute", "hour", "day", "week",
    "month", "year")

  /** Validate the conversion deadline up front: `maxGap` is spliced
    * into an INTERVAL literal, and a malformed body would otherwise
    * surface as an opaque error deep inside the plan — `expr()` parses
    * LAZILY in Spark 4 (resolution happens at analysis), so the check
    * must be structural here: alternating count/unit pairs of known
    * interval units ("24 hours", "1 hour 30 minutes"). */
  private def parseGap(maxGap: String): Column = {
    val tokens = maxGap.trim.toLowerCase.split("\\s+").toSeq
    val wellFormed = tokens.nonEmpty && tokens.size % 2 == 0 &&
      tokens.grouped(2).forall {
        case Seq(n, unit) =>
          n.forall(_.isDigit) && n.nonEmpty &&
            IntervalUnits.contains(unit.stripSuffix("s"))
        case _ => false
      }
    require(wellFormed,
      s"maxGap must be a SQL interval body like '24 hours' or " +
        s"'1 hour 30 minutes', got '$maxGap'")
    expr(s"INTERVAL $maxGap")
  }

  /** The K+1-rows window deriving conversion from per-step counts —
    * over the step count, never the data. The divide is guarded: an
    * empty step-1 population yields NULL conversion (0/0 would be NaN
    * on every row). */
  private def withConversion(perStep: DataFrame): DataFrame = {
    val w = Window.orderBy("step")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = first("users").over(w)
    perStep
      .withColumn("conversion",
        when(base > 0, round(col("users").cast("double") / base, 4)))
      .orderBy("step")
  }

  /** Frontier k = users who reached step k, with their step-k time `t`
    * and their step-(k−1) time `pt` (NULL on the entry frontier) — the
    * prev-step carry is what [[latency]] reads; [[run]] ignores it.
    * Grouping on (user, pt) instead of (user) is free: pt is
    * functionally determined by user within a frontier, so the grouping
    * key change alters no shuffle. */
  private def frontierFrames(events: DataFrame, steps: Seq[String],
      gap: Column, userCol: String, typeCol: String,
      tsCol: String): Seq[DataFrame] = {
    val tsType = events.schema(tsCol).dataType
    val entry = events.filter(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(tsCol).as("t"))
      .withColumn("pt", lit(null).cast(tsType))
    steps.tail.scanLeft(entry) { (prev, step) =>
      events.filter(col(typeCol) === step)
        .join(prev.select(col(userCol), col("t").as("pt")), userCol)
        .filter(col(tsCol) > col("pt") && col(tsCol) <= col("pt") + gap)
        .groupBy(col(userCol), col("pt")).agg(min(tsCol).as("t"))
        .select(col(userCol), col("t"), col("pt"))
    }
  }

  /** Per-step reach over `events`.
    *
    * @param events  event log with `userCol`, `typeCol`, `tsCol`
    * @param steps   ordered event types forming the funnel (≥ 1)
    * @param maxGap  per-step conversion deadline, a SQL interval
    *                literal body, e.g. "24 hours"
    * @return one row per step: (step BIGINT, event_type, users BIGINT,
    *         conversion DOUBLE = users / step-1 users, 4 decimals;
    *         NULL when the step-1 population is empty)
    */
  def run(events: DataFrame, steps: Seq[String], maxGap: String,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val gap = parseGap(maxGap)
    val frontiers = frontierFrames(events, steps, gap, userCol, typeCol, tsCol)
    val perStep = steps.zip(frontiers).zipWithIndex.map {
      case ((step, frontier), i) =>
        frontier.agg(count(lit(1)).as("users"))
          .select(lit(i + 1L).as("step"), lit(step).as(typeCol),
            col("users"))
    }.reduce(_.union(_))
    withConversion(perStep)
  }

  /** Step-latency distribution — the other half of every funnel report:
    * for each step k ≥ 2, the per-user time-to-convert t_k − t_{k−1}
    * in whole seconds (both timestamps floored to the second, so the
    * delta is engine-portable across µs/ns timestamp precision), and
    * its exact interpolated percentiles.
    *
    * Scale shape: identical frontier frames as [[run]] — the prev-step
    * time rides the frontier row, so latency costs NO extra scan or
    * shuffle over the reach counts; the percentile aggregation is one
    * exact `percentile` per step over the (already user-deduped)
    * frontier. At 100 TB swap `percentile` for `approx_percentile` per
    * taste — the frame shape is unchanged.
    *
    * @return one row per step 2..K: (step BIGINT, event_type,
    *         users BIGINT, p50_sec DOUBLE, p90_sec DOUBLE), 4 decimals.
    */
  def latency(events: DataFrame, steps: Seq[String], maxGap: String,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.size >= 2, "funnel latency needs at least two steps")
    val gap = parseGap(maxGap)
    val frontiers = frontierFrames(events, steps, gap, userCol, typeCol, tsCol)
    // timestamp → epoch seconds floors (cast through LTZ for NTZ
    // inputs; the session is pinned UTC so wall-clock is preserved)
    def secs(c: Column): Column = c.cast("timestamp").cast("long")
    val perStep = steps.zip(frontiers).zipWithIndex.drop(1).map {
      case ((step, frontier), i) =>
        frontier
          .select((secs(col("t")) - secs(col("pt"))).as("d"))
          .agg(count(lit(1)).as("users"),
            round(percentile(col("d"), lit(0.5)), 4).as("p50_sec"),
            round(percentile(col("d"), lit(0.9)), 4).as("p90_sec"))
          .select(lit(i + 1L).as("step"), lit(step).as(typeCol),
            col("users"), col("p50_sec"), col("p90_sec"))
    }.reduce(_.union(_))
    perStep.orderBy("step")
  }

  /** Any-order funnel — the product-analytics staple next to the
    * ordered one: a user's entry time t0 is their FIRST event of ANY
    * funnel step; a step counts as reached if the user's first event of
    * that type falls within `maxGap` of t0. Step k's population is
    * users who reached ≥ k DISTINCT steps (monotone like the ordered
    * funnel, but order-free), conversion relative to step 1 (= anyone
    * who did any step; their t0 event always qualifies).
    *
    * Scale shape: one type-pruned scan (IN-list pushed), two hash
    * aggregations on user — no joins against the log. The per-user
    * reached-step counts collapse to a ≤K-row distribution before the
    * step frame touches them, so the final join is K×K.
    */
  def runUnordered(events: DataFrame, steps: Seq[String], maxGap: String,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct event types, got $steps")
    val gap = parseGap(maxGap)
    val spark = events.sparkSession
    import spark.implicits._
    // first event per (user, step), one pass
    val m = events.filter(col(typeCol).isin(steps: _*))
      .groupBy(col(userCol), col(typeCol)).agg(min(tsCol).as("t"))
    // entry time per user; re-aggregate m (user-keyed, already tiny
    // relative to the log) instead of rescanning events
    val entry = m.groupBy(userCol).agg(min("t").as("t0"))
    val reached = m.join(entry, userCol)
      .filter(col("t") <= col("t0") + gap)
      .groupBy(userCol).agg(count(lit(1)).as("k"))
    // ≤K-row distribution of reached-step counts
    val kCounts = reached.groupBy("k").agg(count(lit(1)).as("n"))
    val stepFrame = steps.indices.map(i => i + 1L).toDF("step")
    withConversion(
      stepFrame.join(kCounts, col("k") >= col("step"), "left")
        .groupBy("step").agg(coalesce(sum("n"), lit(0L)).as("users")))
  }

  /** Coverage threshold for the one-scan dispatch: below this fraction
    * of step-typed rows, the K type-pruned scans each skip most of the
    * log, so K-scan's skew safety costs little extra I/O. At/above it,
    * K scans re-read most of the log K times and the measured-2x
    * one-scan plan wins (SCALING.md "One-scan vs K-scan funnel"). */
  val DefaultOneScanMinCoverage: Double = 0.5

  /** Per-user step-typed event bound for the one-scan dispatch: the
    * fold buffers one (ts, type) struct per step-typed event of a user
    * (~32 bytes each), so 100k events is single-digit MBs in one task —
    * safe; a hotter user (bots, service accounts) keeps the K-scan
    * plan, where a hot user is ONE aggregation cell per stage. */
  val DefaultOneScanMaxUserEvents: Long = 100000L

  /** Session-scoped dispatch-metadata memo (round-15 ADVICE): the type
    * histogram and the per-steps hottest-user bound are pure functions
    * of the IMMUTABLE input plan, so repeated funnel calls over the
    * same frame (every `q_funnel` invocation re-dispatches) must not
    * pay up to two extra full scans each. Keyed by
    * `Dataset.semanticHash` + session UUID — a hash collision could at
    * worst flip the DISPATCH, never the answer (both funnel
    * formulations are hash-identical, `q_gate_funnel_dispatch`-pinned).
    * Access-ordered and capped so a long-lived service cannot
    * accumulate entries; compute runs OUTSIDE the lock (a duplicate
    * computation under a race beats holding a lock across a Spark
    * action). */
  private object DispatchMemo {
    private val cap = 256
    private val m = new java.util.LinkedHashMap[Any, Any](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Any, Any]): Boolean = size() > cap
    }
    def cached[A](key: Any)(compute: => A): A =
      m.synchronized(Option(m.get(key))) match {
        case Some(v) => v.asInstanceOf[A]
        case None =>
          val v = compute
          m.synchronized(m.put(key, v))
          v
      }
  }

  /** [[runAutoWithPath]] without the path tag. */
  def runAuto(events: DataFrame, steps: Seq[String], maxGap: String,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame =
    runAutoWithPath(events, steps, maxGap, userCol, typeCol, tsCol)._1

  /** Ordered funnel with measured-crossover dispatch (round-13 verdict
    * item #4 — the `TimeSeriesFill.hourlyWithPath` pattern): pick
    * [[runOneScan]] when the step types cover most of the log AND the
    * hottest user's step-typed event count is bounded; keep [[run]]
    * otherwise. Both formulations are hash-identical (FunnelSpec pins
    * it; `q_gate_funnel_dispatch` re-pins across forced dispatches), so
    * the dispatch can only change the plan, never the answer.
    *
    * Dispatch cost: two metadata aggregates, both cheap relative to
    * either funnel plan — (1) the type histogram, a vocabulary-sized
    * hash agg over the single pruned type column (decides coverage);
    * (2) only when coverage already argues for one-scan, the per-user
    * step-typed count bound — the same type-pruned scan + user-keyed
    * hash agg the one-scan fold is about to shuffle anyway, minus the
    * collect_list payload (decides skew safety).
    *
    * @return (result, path) with path "onescan" | "kscan" so the
    *         dispatch contract is testable without plan reflection. */
  def runAutoWithPath(events: DataFrame, steps: Seq[String], maxGap: String,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts",
      minCoverage: Double = DefaultOneScanMinCoverage,
      maxUserEvents: Long = DefaultOneScanMaxUserEvents): (DataFrame, String) = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct event types, got $steps")
    // semanticHash alone is NOT data-sensitive: a fresh read of the same
    // path canonicalizes identically, so a growing events directory
    // would reuse day-old dispatch metadata and the skew-safety bound
    // (maxUserEvents) would be judged on stale data. Fold the physical
    // file inventory into the key — appends and overwrites change the
    // leaf-file set (already cached in the plan's FileIndex, so this is
    // a driver metadata read, not a scan). Non-file sources hash to the
    // empty set: in-memory frames are immutable, so the plan hash alone
    // is sufficient there.
    val fileKey = scala.util.hashing.MurmurHash3
      .orderedHash(events.inputFiles.sorted)
    val planKey = (System.identityHashCode(events.sparkSession),
      events.semanticHash(), fileKey)
    // vocabulary-sized driver read (one row per event type), memoized
    // per (session, plan, typeCol)
    val hist = DispatchMemo.cached(("hist", planKey, typeCol)) {
      events.groupBy(typeCol).agg(count(lit(1)).as("n"))
        .collect().filterNot(_.isNullAt(0))
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val total = hist.valuesIterator.sum
    val stepRows = steps.flatMap(hist.get).sum
    val covered = total > 0L && stepRows.toDouble / total >= minCoverage
    lazy val hottestUser =
      DispatchMemo.cached(("hot", planKey, steps, userCol, typeCol)) {
        events.filter(col(typeCol).isin(steps: _*))
          .groupBy(userCol).agg(count(lit(1)).as("n"))
          .agg(coalesce(max("n"), lit(0L))).head().getLong(0)
      }
    if (covered && hottestUser <= maxUserEvents)
      (runOneScan(events, steps, maxGap, userCol, typeCol, tsCol), "onescan")
    else
      (run(events, steps, maxGap, userCol, typeCol, tsCol), "kscan")
  }

  /** One-scan ordered funnel — hash-identical to [[run]] (FunnelSpec
    * pins equality), shaped for logs where the funnel steps cover most
    * event types: ONE scan of the step-typed rows (IN-list pushed), ONE
    * shuffle on user, then a per-user time-ordered fold that fills each
    * step's slot at the first qualifying event (strictly after the
    * previous step's time, within the deadline). The fold is a
    * higher-order `aggregate` over the user's sorted step-typed events
    * — per-user memory is their step-typed event count, the same bound
    * the windowed sessionizers carry. See SCALING.md "Behavioral
    * analytics" for the measured crossover vs the K-scan plan.
    */
  def runOneScan(events: DataFrame, steps: Seq[String], maxGap: String,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct event types, got $steps")
    val gap = parseGap(maxGap)
    val tsType = events.schema(tsCol).dataType
    val perUser = events.filter(col(typeCol).isin(steps: _*))
      .groupBy(userCol)
      .agg(array_sort(collect_list(struct(col(tsCol).as("ts"),
        col(typeCol).as("tp")))).as("evs"))
    // fold state: one slot per step, filled exactly once, in time order
    val zero = struct(steps.indices.map(i =>
      lit(null).cast(tsType).as(s"t$i")): _*)
    def fold(acc: Column, ev: Column): Column = {
      val ts = ev.getField("ts")
      val tp = ev.getField("tp")
      struct(steps.indices.map { i =>
        val qualifies =
          if (i == 0) tp === steps.head
          else {
            val prev = acc.getField(s"t${i - 1}")
            tp === steps(i) && prev.isNotNull &&
              ts > prev && ts <= prev + gap
          }
        coalesce(acc.getField(s"t$i"), when(qualifies, ts)).as(s"t$i")
      }: _*)
    }
    val folded = perUser.select(aggregate(col("evs"), zero, fold).as("st"))
    val countCols = steps.indices.map(i =>
      coalesce(sum(when(col("st").getField(s"t$i").isNotNull, 1L)
        .otherwise(0L)), lit(0L)).as(s"c$i"))
    val counts = folded.agg(countCols.head, countCols.tail: _*)
    // melt the 1×K count row to K rows without touching the driver
    val perStep = counts.select(explode(array(steps.indices.map(i =>
        struct(lit(i + 1L).as("step"), lit(steps(i)).as(typeCol),
          col(s"c$i").as("users"))): _*)).as("r"))
      .select(col("r.step"), col(s"r.$typeCol"), col("r.users"))
    withConversion(perStep)
  }
}
