package graft

import graft.operators.IndexMaintenance
import graft.streaming.Streams
import org.scalatest.funsuite.AnyFunSuite

/** Streaming lift ≡ batch semantics: the streamed results over the same
  * parquet must equal the oracle-checked batch query keys (SURVEY §5). */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def sortedRows(df: org.apache.spark.sql.DataFrame, cols: String*) =
    df.orderBy(cols.head, cols.tail: _*).collect().map(_.toString).toSeq

  test("streaming tumbling window == batch q_stream_tumbling") {
    val events = Streams.eventsStream(spark, sf)
    assert(events.isStreaming)
    Streams.runToMemory(Streams.tumblingCounts(events), "t_tumbling", "complete")
    val streamed = sortedRows(spark.table("t_tumbling"), "wstart", "event_type")
    val batch = sortedRows(SparkEntry.queries("q_stream_tumbling")(spark, sf),
      "wstart", "event_type")
    assert(streamed == batch)
  }

  test("streaming sliding window == batch q_stream_sliding") {
    val events = Streams.eventsStream(spark, sf)
    Streams.runToMemory(Streams.slidingCounts(events), "t_sliding", "complete")
    val streamed = sortedRows(spark.table("t_sliding"), "wstart")
    val batch = sortedRows(SparkEntry.queries("q_stream_sliding")(spark, sf), "wstart")
    assert(streamed == batch)
  }

  test("streaming session windows == batch q_stream_session") {
    val events = Streams.eventsStream(spark, sf)
    Streams.runToMemory(Streams.sessionAgg(events), "t_session", "complete")
    val streamed = sortedRows(spark.table("t_session"), "user_id", "session_start")
    val batch = sortedRows(SparkEntry.queries("q_stream_session")(spark, sf),
      "user_id", "session_start")
    assert(streamed == batch)
  }

  test("hourly cell sink: late straggler updates a closed hour; replay is a version no-op") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val work = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_cells").toString)
    val landing = new java.io.File(work, "landing"); landing.mkdirs()
    val store = s"$work/cells"; val ckpt = s"$work/ckpt"
    def frame(rows: Seq[(String, String, Double)]) = rows
      .toDF("event_type", "tss", "value")
      .select(col("event_type"), to_timestamp(col("tss")).as("ts"), col("value"))
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = new java.io.File(work, s"tmp_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      assert(part.renameTo(new java.io.File(landing, name)))
    }
    val schema = frame(Nil).schema
    def drain(): Unit = {
      val q = Streams.hourlyCellSink(
        spark.readStream.schema(schema).parquet(landing.getPath), store, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    land(frame(Seq(("view", "2024-01-01 05:10:00", 1.25),
      ("view", "2024-01-01 05:40:00", 2.00))), "b1.parquet")
    drain()
    def cells() = graft.streaming.SnapshotStore.read(spark, store)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("h").toString, r.getAs[Long]("v"))).toSet
    assert(cells() == Set(("view", "2024-01-01 05:00:00.0", 325L)))
    // batch 2: a straggler for the already-committed 05:00 hour plus a
    // fresh hour — the closed cell's total must move, not be dropped
    land(frame(Seq(("view", "2024-01-01 05:55:00", 0.75),
      ("click", "2024-01-01 09:00:00", 1.00))), "b2.parquet")
    drain()
    assert(cells() == Set(("view", "2024-01-01 05:00:00.0", 400L),
      ("click", "2024-01-01 09:00:00.0", 100L)))
    val v = graft.streaming.SnapshotStore.currentManifest(spark, store).map(_.version)
    drain() // drained feed: checkpoint starts no batch, no new version
    assert(graft.streaming.SnapshotStore.currentManifest(spark, store)
      .map(_.version) == v)
  }

  test("scd2: planted lifecycle — insert opens, update chains, delete closes") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_scd2").toString
    val dim = s"$work/dim"; val cdc = s"$work/cdc"
    val keys = Seq("id")
    def batch(rows: Seq[(Long, String)]): Long = {
      Streams.cdcBatch(spark, dim, cdc, rows.toDF("id", "v"), keys,
        retainHistory = true)
      graft.streaming.SnapshotStore.currentManifest(spark, dim).get.version
    }
    val v1 = batch(Seq((1L, "a"), (2L, "x")))   // both open at v1
    val v2 = batch(Seq((1L, "b")))              // key 1 chains: [v1,v2) then [v2,…)
    Streams.cdcDeleteBatch(spark, dim, cdc, Seq((2L, "x")).toDF("id", "v"),
      keys, retainHistory = true)               // key 2 closes at v3, no new row
    val v3 = graft.streaming.SnapshotStore.currentManifest(spark, dim).get.version
    val hist = Streams.scd2(spark, cdc, keys).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong)))
      .toSet
    assert(hist == Set(
      (1L, "a", v1, Some(v2)), (1L, "b", v2, None),
      (2L, "x", v1, Some(v3))))
    // point-in-time membership at each version
    def at(v: Long) = Streams.scd2At(Streams.scd2(spark, cdc, keys), v)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(at(v1) == Set((1L, "a"), (2L, "x")))
    assert(at(v2) == Set((1L, "b"), (2L, "x")))
    assert(at(v3) == Set((1L, "b")))
  }

  test("flatMapGroupsWithState per-user stats match batch aggregation") {
    import org.apache.spark.sql.functions._
    val events = Streams.eventsStream(spark, sf)
    Streams.runToMemory(Streams.userStats(events).toDF(), "t_userstats", "update")
    val streamed = spark.table("t_userstats")
      .select("user_id", "n", "sum_val")
      .orderBy("user_id").collect().map(_.toString).toSeq
    val batch = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        (round(sum("value") * 10000) / 10000).as("sum_val"))
      .orderBy("user_id").collect().map(_.toString).toSeq
    assert(streamed == batch)
  }

  test("streaming transitions match the batch lead() pair counts") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val events = Streams.eventsStream(spark, sf)
    Streams.runToMemory(Streams.transitions(events).toDF(), "t_trans", "append")
    val streamed = spark.table("t_trans")
      .groupBy("event_type", "next_type").count()
      .orderBy("event_type", "next_type").collect().map(_.toString).toSeq
    val wNext = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val batch = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        lead("event_type", 1).over(wNext).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type").count()
      .orderBy("event_type", "next_type").collect().map(_.toString).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming dedup within watermark preserves distinct event ids") {
    val events = Streams.eventsStream(spark, sf)
    Streams.runToMemory(Streams.dedupStream(events), "t_dedup", "append")
    val n = spark.table("t_dedup").count()
    val expected = Tables.events(spark, sf).select("event_id").distinct().count()
    assert(n == expected)
  }

  test("stream-stream interval join == batch q_join_range") {
    val events = Streams.eventsStream(spark, sf)
    Streams.runToMemory(Streams.signupPurchaseJoin(events), "t_ssjoin", "append")
    val streamed = sortedRows(spark.table("t_ssjoin"), "eid_a", "eid_b")
    val batch = sortedRows(SparkEntry.queries("q_join_range")(spark, sf), "eid_a", "eid_b")
    assert(streamed == batch)
  }

  test("checkpointed file sink is exactly-once across stream restarts") {
    val out = new java.io.File("/root/repo/target/stream_out")
    val chk = new java.io.File("/root/repo/target/stream_chk")
    LocalFs.rmrf(out); LocalFs.rmrf(chk)
    def runOnce(): Unit = {
      val q = Streams.dedupStream(Streams.eventsStream(spark, sf)).writeStream
        .format("parquet")
        .option("path", out.getAbsolutePath)
        .option("checkpointLocation", chk.getAbsolutePath)
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    val n1 = spark.read.parquet(out.getAbsolutePath).count()
    // restart from the same checkpoint: committed offsets mean the input
    // file is NOT reprocessed — no duplicate rows in the sink
    runOnce()
    val n2 = spark.read.parquet(out.getAbsolutePath).count()
    val expected = Tables.events(spark, sf).select("event_id").distinct().count()
    assert(n1 == expected, s"first run wrote $n1, expected $expected")
    assert(n2 == n1, s"restart duplicated rows: $n1 -> $n2")
  }

  test("streaming upsert sink maintains a keyed snapshot; replay is idempotent") {
    import org.apache.spark.sql.functions._
    val target = new java.io.File("/root/repo/target/upsert_snapshot")
    val chk = new java.io.File("/root/repo/target/upsert_chk")
    LocalFs.rmrf(target); LocalFs.rmrf(chk)
    // latest state per user from the event stream, keyed on user_id
    val events = Streams.eventsStream(spark, sf)
      .select(col("user_id"), col("event_type"), col("value"))
    val q = Streams.upsertSink(events, target.getAbsolutePath,
      Seq("user_id"), chk.getAbsolutePath)
    try q.processAllAvailable() finally q.stop()
    // bucket-dir layout: read through the manifest, not the raw directory
    val snap = Streams.readSnapshot(spark, target.getAbsolutePath)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(snap.count() == users, "one row per key in the snapshot")
    // replaying the same batch converges (merge is idempotent on key)
    Streams.mergeIntoSnapshot(spark, target.getAbsolutePath,
      Tables.events(spark, sf).select("user_id", "event_type", "value"), Seq("user_id"))
    assert(Streams.readSnapshot(spark, target.getAbsolutePath).count() == users)
  }

  test("streaming upsert with CDC side channel: per-version change feed, bounded retention") {
    import org.apache.spark.sql.functions._
    val target = new java.io.File("/root/repo/target/cdc_snapshot")
    val cdc = new java.io.File("/root/repo/target/cdc_feed")
    val chk1 = new java.io.File("/root/repo/target/cdc_chk1")
    val chk2 = new java.io.File("/root/repo/target/cdc_chk2")
    Seq(target, cdc, chk1, chk2).foreach(LocalFs.rmrf)
    val evens = Streams.eventsStream(spark, sf)
      .filter(col("event_id") % 2 === 0).select("user_id", "event_id")
    val odds = Streams.eventsStream(spark, sf)
      .filter(col("event_id") % 2 === 1).select("user_id", "event_id")
    def run(src: org.apache.spark.sql.DataFrame, chk: java.io.File): Unit = {
      val q = Streams.upsertSinkWithCdc(src, target.getAbsolutePath,
        cdc.getAbsolutePath, Seq("user_id"), chk.getAbsolutePath,
        orderCol = Some("event_id"))
      try q.processAllAvailable() finally q.stop()
    }
    run(evens, chk1) // version 1: all inserts
    run(odds, chk2)  // version 2: updates for users with odd events
    val feed = spark.read.parquet(cdc.getAbsolutePath)
    val v1 = feed.filter(col("__version") === 1)
    val v2 = feed.filter(col("__version") === 2)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val evenUsers = Tables.events(spark, sf)
      .filter(col("event_id") % 2 === 0).select("user_id").distinct().count()
    assert(v1.count() == evenUsers, "first commit: one insert per even-batch user")
    assert(v1.filter(col("change_type") =!= "insert").count() == 0)
    // batch-2 winners always differ (odd ids), so every odd-batch user changes
    val oddUsers = Tables.events(spark, sf)
      .filter(col("event_id") % 2 === 1).select("user_id").distinct().count()
    assert(v2.count() == oddUsers, "second version: one change per odd-batch user")
    // retention stays bounded at the last two versions
    assert(graft.streaming.SnapshotStore
      .listVersions(spark, target.getAbsolutePath).size <= 2)
    // snapshot itself is complete and current
    assert(Streams.readSnapshot(spark, target.getAbsolutePath).count() == users)
  }

  test("CDC publish is stage-then-rename: scaffolds invisible + swept; update feeds the log") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val src = new java.io.File("/root/repo/target/cdcp_src")
    val cdc = new java.io.File("/root/repo/target/cdcp_cdc")
    Seq(src, cdc).foreach(LocalFs.rmrf)
    Streams.cdcBatch(spark, src.getAbsolutePath, cdc.getAbsolutePath,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"), numBuckets = 4)
    // plant crashed-publish scaffolds: one DEAD (version ≤ last logged —
    // its publish either landed or was retried) and one possibly
    // IN-FLIGHT (version beyond the log head)
    val dead = new java.io.File(cdc, "__stage_v1")
    val inflight = new java.io.File(cdc, "__stage_v99")
    Seq(dead, inflight).foreach { d =>
      d.mkdirs()
      java.nio.file.Files.writeString(d.toPath.resolve("junk.parquet"), "x")
    }
    // leading-underscore scaffolds are invisible to every reader: the
    // batch read sees only committed version partitions, and the
    // exactly-once diff base ignores them
    assert(spark.read.parquet(cdc.getAbsolutePath).count() == 2)
    assert(Streams.lastLoggedVersion(spark, cdc.getAbsolutePath) == Some(1L))
    // a predicate UPDATE cycle publishes version 2 atomically with
    // update-classified rows carrying old/new images
    Streams.cdcUpdateBatch(spark, src.getAbsolutePath, cdc.getAbsolutePath,
      Seq("k"), Map("v" -> lit("z")), col("k") === 1L)
    val v2 = spark.read.parquet(cdc.getAbsolutePath)
      .filter(col("__version") === 2).collect()
    assert(v2.length == 1)
    assert(v2.head.getAs[String]("change_type") == "update")
    assert(v2.head.getAs[String]("old_v") == "a" &&
      v2.head.getAs[String]("new_v") == "z")
    // vacuum sweeps the dead scaffold but leaves the possibly-in-flight one
    Streams.vacuumCdcLog(spark, cdc.getAbsolutePath, keepLast = 100)
    assert(!dead.exists(), "dead stage scaffold (v ≤ log head) must sweep")
    assert(inflight.exists(), "a stage beyond the log head may be in-flight — untouched")
    // IVM deltas from the update net −old +new
    val deltas = Streams.cdcCountDeltas(
      spark.read.parquet(cdc.getAbsolutePath).filter(col("__version") === 2), "v")
      .groupBy("v").agg(sum("delta").as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(deltas == Map("a" -> -1L, "z" -> 1L))
  }

  test("the CDC log is streamable: a readStream consumer sees exactly the feed") {
    import org.apache.spark.sql.functions._
    // consumes the feed the upsert-CDC test wrote (same target dir)
    val cdc = new java.io.File("/root/repo/target/cdc_feed")
    assume(cdc.exists(), "runs after the CDC sink test")
    val batchRows = spark.read.parquet(cdc.getAbsolutePath)
    val schema = batchRows.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // incremental consumption
      .parquet(cdc.getAbsolutePath)
    assert(stream.isStreaming)
    Streams.runToMemory(stream, "t_cdc_consume", "append")
    val streamed = spark.table("t_cdc_consume")
    assert(streamed.count() == batchRows.count(),
      "stream consumer must see every CDC row exactly once")
    assert(streamed.select("change_type").distinct().collect().map(_.getString(0)).toSet
      == batchRows.select("change_type").distinct().collect().map(_.getString(0)).toSet)
  }

  test("CDC feed drives a downstream count view end-to-end, exactly-once on restart") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val src = new java.io.File("/root/repo/target/ivm_src")
    val cdc = new java.io.File("/root/repo/target/ivm_cdc")
    val down = new java.io.File("/root/repo/target/ivm_down")
    val chk = new java.io.File("/root/repo/target/ivm_chk")
    Seq(src, cdc, down, chk).foreach(LocalFs.rmrf)
    def upstream(rows: Seq[(Long, String)]): Unit =
      Streams.cdcBatch(spark, src.getAbsolutePath, cdc.getAbsolutePath,
        rows.toDF("id", "status"), Seq("id"), numBuckets = 4)
    def refresh(): Unit = {
      val q = Streams.cdcCountViewSink(
        Streams.cdcSource(spark, cdc.getAbsolutePath, maxFilesPerTrigger = 1),
        "status", down.getAbsolutePath, chk.getAbsolutePath, numBuckets = 4)
      try q.processAllAvailable() finally q.stop()
    }
    def viewCounts(): Map[String, Long] =
      graft.streaming.SnapshotStore.read(spark, down.getAbsolutePath)
        .filter(col("n") =!= 0L).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    def snapshotCounts(): Map[String, Long] =
      graft.streaming.SnapshotStore.read(spark, src.getAbsolutePath)
        .groupBy("status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // two upstream merge cycles: inserts, then updates that MOVE a key
    // across groups plus a fresh insert
    upstream(Seq((1L, "new"), (2L, "new"), (3L, "done")))
    upstream(Seq((1L, "done"), (4L, "new"))) // 1 moves new->done, 4 inserts
    refresh()
    assert(viewCounts() == snapshotCounts(),
      s"view ${viewCounts()} != snapshot agg ${snapshotCounts()}")
    assert(viewCounts() == Map("new" -> 2L, "done" -> 2L))
    // third cycle after the consumer stopped; RESTART from the same
    // checkpoint must process only the new version — no double counts
    upstream(Seq((2L, "done"))) // 2 moves new->done
    refresh()
    assert(viewCounts() == snapshotCounts(),
      s"restart diverged: ${viewCounts()} vs ${snapshotCounts()}")
    assert(viewCounts() == Map("new" -> 1L, "done" -> 3L))
    // and a replay with NOTHING new is a no-op (exactly-once, not at-least-once)
    refresh()
    assert(viewCounts() == Map("new" -> 1L, "done" -> 3L))
    // a DELETE cycle flows through the same feed: the vanished key's
    // delete row subtracts from its group in the downstream view
    Streams.cdcDeleteBatch(spark, src.getAbsolutePath, cdc.getAbsolutePath,
      Seq(Tuple1(3L)).toDF("id"), Seq("id")) // id 3 was "done"
    refresh()
    assert(viewCounts() == snapshotCounts(),
      s"delete diverged: ${viewCounts()} vs ${snapshotCounts()}")
    assert(viewCounts() == Map("new" -> 1L, "done" -> 2L))
  }

  test("cdc sink absorbs schema drift mid-stream: added column flows into the feed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val src = new java.io.File("/root/repo/target/drift_src")
    val cdc = new java.io.File("/root/repo/target/drift_cdc")
    Seq(src, cdc).foreach(LocalFs.rmrf)
    // batch 1: (k, v); batch 2 ADDS score — the sink must merge without
    // manual alignment and the change feed must carry the union schema
    graft.streaming.Streams.cdcBatch(spark, src.getAbsolutePath,
      cdc.getAbsolutePath, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      Seq("k"), numBuckets = 4)
    graft.streaming.Streams.cdcBatch(spark, src.getAbsolutePath,
      cdc.getAbsolutePath, Seq((2L, "b2", 9), (3L, "c", 5)).toDF("k", "v", "score"),
      Seq("k"), numBuckets = 4)
    val snap = graft.streaming.SnapshotStore.read(spark, src.getAbsolutePath)
    assert(snap.columns.toSeq == Seq("k", "v", "score"))
    assert(snap.filter($"k" === 1L).head.isNullAt(2), "old row null-fills")
    // a PLAIN multi-dir read would infer v1's schema and drop the
    // evolved columns — the log reader aligns per version partition
    val feed = graft.streaming.Streams.readCdcLog(spark, cdc.getAbsolutePath)
    assert(feed.columns.toSet.contains("new_score"),
      s"the v2 feed must carry the evolved column, got ${feed.columns.toSeq}")
    val v2 = feed.filter($"__version" === 2)
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[String]("change_type"), r.getAs[Any]("new_score"))).toMap
    assert(v2(2L) == ("update", 9) && v2(3L) == ("insert", 5))
    assert(!v2.contains(1L), "null-fill alone must not register as a change")
    // v1 rows (written pre-drift) read back under the union feed schema
    assert(feed.filter($"__version" === 1).count() == 2)
  }

  test("readCdcLog: plan node count flat in version depth on the fast path") {
    // round-15 verdict item #6: a V-version log must NOT build a
    // V-branch union plan when no version widened a type — SCD2 over a
    // 1,000-version log would otherwise carry 1,000 scan branches.
    import spark.implicits._
    val cdc = new java.io.File("/root/repo/target/cdclog_depth")
    LocalFs.rmrf(cdc)
    // 8 versions, stable schema except v5 ADDS a column (null-filled by
    // the scan under the union schema — still the fast path; only a
    // type WIDENING forces per-version alignment)
    (1 to 8).foreach { v =>
      val base = Seq((v.toLong, s"r$v")).toDF("k", "change_type")
      val df = if (v == 5)
        base.withColumn("new_extra",
          org.apache.spark.sql.functions.lit(42))
      else base
      df.write.parquet(s"${cdc.getAbsolutePath}/__version=$v")
    }
    val feed = graft.streaming.Streams.readCdcLog(spark, cdc.getAbsolutePath)
    val leaves = feed.queryExecution.executedPlan.collectLeaves().size
    assert(leaves == 1, s"expected ONE multi-dir scan, got $leaves leaves:\n" +
      feed.queryExecution.executedPlan.treeString)
    assert(feed.count() == 8)
    assert(feed.filter($"__version" === 5).head.getAs[Int]("new_extra") == 42)
    assert(feed.filter($"__version" === 4).head.isNullAt(
      feed.columns.indexOf("new_extra")), "pre-add versions null-fill")
    // a type-WIDENED log (k: int in v9 vs long elsewhere) must fall back
    // to per-version alignment — the vectorized reader refuses
    // cross-type reads — and still produce the reconciled column
    Seq((9, "r9")).toDF("k", "change_type")
      .write.parquet(s"${cdc.getAbsolutePath}/__version=9")
    val widened = graft.streaming.Streams.readCdcLog(spark, cdc.getAbsolutePath)
    assert(widened.schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(widened.queryExecution.executedPlan.collectLeaves().size == 9,
      "a widened log pays per-version branches (correctness over plan shape)")
    assert(widened.filter($"__version" === 9).head.getAs[Long]("k") == 9L)
    assert(widened.count() == 9)
  }

  test("IVM deltas are per-row additive: a mid-version split cannot change totals") {
    // round-15 verdict item #2: pin the contract that makes
    // cdcCountDeltas/cdcSumDeltas safe under ANY cdcSource micro-batch
    // boundary (including a version split mid-batch, which breaks
    // co-occurrence consumers): per-group totals from per-fragment
    // deltas, summed, equal the unsplit computation for every way the
    // rows are partitioned.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum}
    val changes = Seq(
      ("insert", null.asInstanceOf[String], "a", null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(5.0)),
      ("insert", null.asInstanceOf[String], "b", null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(2.0)),
      ("update", "a", "b", java.lang.Double.valueOf(5.0), java.lang.Double.valueOf(7.0)),
      ("delete", "b", null.asInstanceOf[String], java.lang.Double.valueOf(2.0), null.asInstanceOf[java.lang.Double]))
      .toDF("change_type", "old_g", "new_g", "old_v", "new_v")
    def totals(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Double)] =
      graft.streaming.Streams.cdcCountDeltas(df, "g")
        .groupBy("g").agg(sum("delta").as("n"))
        .join(graft.streaming.Streams.cdcSumDeltas(df, "g", "v")
          .groupBy("g").agg(sum("delta").as("sv")), Seq("g"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
    val whole = totals(changes)
    assert(whole == Map("a" -> (0L, 0.0), "b" -> (1L, 7.0)))
    // split the 4 rows every possible contiguous way (incl. the
    // update row isolated from the rows it "pairs" with) and re-sum
    (1 to 3).foreach { cut =>
      val frag1 = changes.limit(cut)
      val frag2 = changes.exceptAll(frag1)
      val merged = (totals(frag1).toSeq ++ totals(frag2).toSeq)
        .groupBy(_._1).view.mapValues(vs =>
          (vs.map(_._2._1).sum, vs.map(_._2._2).sum)).toMap
      assert(merged.filter { case (_, (n, s)) => n != 0L || s != 0.0 } ==
        whole.filter { case (_, (n, s)) => n != 0L || s != 0.0 },
        s"split at $cut diverged")
    }
  }

  test("cdcCountDeltas: delete subtracts, group-preserving update nets zero") {
    import spark.implicits._
    val changes = Seq(
      ("insert", null, "a"),
      ("update", "a", "b"),   // moves a -> b
      ("update", "b", "b"),   // value change within the same group: net 0
      ("delete", "a", null)).toDF("change_type", "old_status", "new_status")
    val net = Streams.cdcCountDeltas(changes, "status")
      .groupBy("status").agg(org.apache.spark.sql.functions.sum("delta").as("n"))
      .collect().map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
    assert(net.getOrElse("a", 0L) == -1L, s"a: +1 insert -1 update-out -1 delete, got $net")
    assert(net.getOrElse("b", 0L) == 1L, s"b: +1 update-in (+1-1 self-move), got $net")
  }

  test("cdcSumDeltas maintains sum(value) per group exactly (incl. group moves)") {
    import spark.implicits._
    // upstream truth: start {1:(a,10), 2:(a,5)}, then 1 moves to b with
    // a new value, 2 changes value in place, 3 inserts, then 2 deletes
    val changes = Seq(
      ("insert", Option.empty[String], Option.empty[Double], Some("a"), Some(10.0)), // 1
      ("insert", Option.empty[String], Option.empty[Double], Some("a"), Some(5.0)),  // 2
      ("update", Some("a"), Some(10.0), Some("b"), Some(7.0)),  // 1: a->b, 10->7
      ("update", Some("a"), Some(5.0), Some("a"), Some(8.0)),   // 2: in-place 5->8
      ("insert", Option.empty[String], Option.empty[Double], Some("b"), Some(2.0)),  // 3
      ("delete", Some("a"), Some(8.0), Option.empty[String], Option.empty[Double])) // 2 gone
      .toDF("change_type", "old_status", "old_v", "new_status", "new_v")
    val net = Streams.cdcSumDeltas(changes, "status", "v")
      .groupBy("status").agg(org.apache.spark.sql.functions.sum("delta").as("s"))
      .collect().flatMap(r => Option(r.getString(0)).map(_ -> r.getDouble(1))).toMap
    // final truth: only 1:(b,7) and 3:(b,2) remain → a = 0, b = 9
    assert(math.abs(net.getOrElse("a", 0.0)) < 1e-9, s"a must net to zero, got $net")
    assert(math.abs(net("b") - 9.0) < 1e-9, s"b must be 7+2, got $net")
  }

  test("RocksDB state store produces identical results to the in-memory store") {
    // at production state sizes (billions of keys across session windows)
    // the default HDFS-backed in-memory store OOMs; RocksDB spills state
    // to local disk. Same query, same results, different state backend.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = Streams.eventsStream(spark, sf)
      Streams.runToMemory(Streams.tumblingCounts(events), "t_tumbling_rocks", "complete")
      val rocks = sortedRows(spark.table("t_tumbling_rocks"), "wstart", "event_type")
      val batch = sortedRows(SparkEntry.queries("q_stream_tumbling")(spark, sf),
        "wstart", "event_type")
      assert(rocks == batch)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming near-dup admission: exactly-once pairs feed, at-least-once index healed by vacuum") {
    import org.apache.spark.sql.functions._
    val root = new java.io.File("/root/repo/target/stream_neardup")
    LocalFs.rmrf(root)
    val src = new java.io.File(root, "src")
    val idx = new java.io.File(root, "index")
    val pairsDir = new java.io.File(root, "pairs")
    val chk = new java.io.File(root, "chk")

    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val founding = docs.filter(col("doc_id") % 4 === 0)
    // second arrival: a fresh stripe plus re-crawls of founding texts
    // under new ids — guaranteed est_jaccard-1.0 pairs vs history
    val recrawl = founding.filter(col("doc_id") % 16 === 0)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    val arrival = docs.filter(col("doc_id") % 4 === 1).unionAll(recrawl)

    val schema = founding.schema
    def sink() = Streams.nearDupIngestSink(
      spark.readStream.schema(schema).parquet(src.getAbsolutePath),
      idx.getAbsolutePath, pairsDir.getAbsolutePath, chk.getAbsolutePath,
      "doc_id", "text")
    // restart-with-same-checkpoint can race the previous run's async
    // deregistration ("concurrently using …/commits"); retrying is
    // exactly the at-least-once restart the protocol tolerates. The
    // teardown must swallow its own rethrow of the terminated query's
    // exception, or the retry never reaches attempt 2.
    def drain(mk: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      var ok = false
      var attempts = 0
      while (!ok) {
        attempts += 1
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try { q = mk; q.processAllAvailable(); ok = true }
        catch {
          case e: Exception if attempts < 10 &&
              Option(e.getMessage).exists(_.contains("concurrently using")) =>
            Thread.sleep(500)
        } finally if (q != null) {
          try { q.stop(); q.awaitTermination() }
          catch { case _: Exception => () } // already-reported failure
        }
      }
    }
    def pairSet() = Streams.readNearDupPairs(spark, pairsDir.getAbsolutePath)
      .select("new_id", "old_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

    founding.coalesce(1).write.parquet(src.getAbsolutePath)
    drain(sink())
    arrival.coalesce(1).write.mode("append").parquet(src.getAbsolutePath)
    drain(sink())

    val p1 = pairSet()
    assert(p1.size == p1.distinct.size, "duplicate pair rows in the feed")
    val recrawlIds = recrawl.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(recrawlIds.nonEmpty &&
      recrawlIds.subsetOf(p1.map(_._1).toSet),
      "re-crawled docs not flagged against history")
    val rowsAfterFirst = IndexMaintenance.stats(spark, idx.getAbsolutePath)

    // crash replay: drop the last commit marker so the restarted query
    // re-runs the final micro-batch (foreachBatch at-least-once)
    val commits = new java.io.File(chk, "commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.last.delete(), "could not plant the replay")
    // the local FS keeps a checksum shadow; an orphaned .N.crc makes
    // the re-commit's rename fail as a concurrent-writer conflict
    new java.io.File(commits.last.getParentFile,
      "." + commits.last.getName + ".crc").delete()
    drain(sink())

    // the feed is exactly-once: the replayed batch overwrote its own
    // __batch partition with identical content
    assert(pairSet().sorted == p1.sorted, "replay changed the pairs feed")
    // the index is at-least-once: the replay re-appended band rows...
    val replayed = IndexMaintenance.stats(spark, idx.getAbsolutePath)
    assert(replayed.rows > rowsAfterFirst.rows, "replay did not grow the index")
    // ...and vacuum heals it back to the distinct row set
    val v = IndexMaintenance.vacuum(spark, idx.getAbsolutePath, "__bkt")
    assert(v.rowsAfter == rowsAfterFirst.rows,
      s"vacuum did not restore the pre-replay index: $v vs $rowsAfterFirst")
  }

  test("streaming embed-dedup admission: re-sent vectors flagged against the frozen-model index") {
    import org.apache.spark.sql.functions._
    val root = new java.io.File("/root/repo/target/stream_embeddedup")
    LocalFs.rmrf(root)
    val src = new java.io.File(root, "src")
    val idx = new java.io.File(root, "index")
    val pairsDir = new java.io.File(root, "pairs")
    val chk = new java.io.File(root, "chk")

    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val founding = vecs.filter(col("vec_id") % 3 === 0)
    // identical embeddings re-sent under fresh ids: cosine-1.0 pairs
    val resent = founding.filter(col("vec_id") % 9 === 0)
      .withColumn("vec_id", col("vec_id") + lit(10000000L))
    val arrival = vecs.filter(col("vec_id") % 3 === 1).unionAll(resent)

    def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }
    def sink() = Streams.embedDedupIngestSink(
      spark.readStream.schema(founding.schema).parquet(src.getAbsolutePath),
      idx.getAbsolutePath, pairsDir.getAbsolutePath, chk.getAbsolutePath,
      "vec_id", "embedding")

    founding.coalesce(1).write.parquet(src.getAbsolutePath)
    drain(sink())
    arrival.coalesce(1).write.mode("append").parquet(src.getAbsolutePath)
    drain(sink())

    val pairs = Streams.readNearDupPairs(spark, pairsDir.getAbsolutePath)
      .select("new_id", "old_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.size == pairs.distinct.size, "duplicate pair rows in the feed")
    val resentIds = resent.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(resentIds.nonEmpty && resentIds.subsetOf(pairs.map(_._1).toSet),
      "re-sent vectors not flagged against history")
    // no replay happened: the gauge-driven policy leaves the index alone
    assert(IndexMaintenance.vacuumIfNeeded(spark, idx.getAbsolutePath,
      "__cell").isEmpty, "policy rewrote a clean index")
  }
}
