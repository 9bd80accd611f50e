package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.{IncrementalDedup, IncrementalNearDup, IndexMaintenance}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The day-2 loop [[CurationDemo]] leaves off at: the corpus is live,
  * batches keep arriving, and each one must be admitted against
  * EVERYTHING ever seen — without rescanning the corpus. Chains the
  * incremental operators the way an operator would run them nightly:
  *
  *   arriving batch
  *     → exact admission vs the bucketed corpus snapshot
  *       (IncrementalDedup: first-seen-wins, bucket-pruned anti-join,
  *       exactly-once across replays)
  *     → near-dup flagging vs the persisted band index
  *       (IncrementalNearDup: partition-pruned MinHash-LSH lookup,
  *       at-least-once appends)
  *     → maintenance when the replay tax shows
  *       (IndexMaintenance.stats gauges duplication in one shuffle-free
  *       scan; vacuum rewrites to the distinct row set and compacts)
  *     → corpus OPTIMIZE when fragmentation shows
  *       (SnapshotStore.compactionGauge reads one manifest-sized
  *       listing; compact runs only when the gauge recommends)
  *
  * Day 3 is deliberately a re-crawl: half its documents are day-1 texts
  * under fresh ids — the exact path must refuse them (alreadyKnown, not
  * accepted) without any text comparison against the full corpus. Day 2
  * crash-replays in full immediately after it lands: the corpus must
  * not grow (exactly-once) and the lookup must return the identical
  * pair set, while the band index grows on disk (at-least-once, by
  * design) — the replay tax the maintenance leg then gauges with
  * `stats` and reclaims with `vacuum`, lookups bit-identical across the
  * rewrite.
  *
  * Run: `sbt "runMain graft.examples.IncrementalIngestDemo [sfDir] [outRoot]"`.
  */
object IncrementalIngestDemo {

  final case class BatchReport(batch: String, arrived: Long,
      withinBatchDups: Long, alreadyKnown: Long, accepted: Long,
      nearDupFlagged: Long)

  final case class MaintenanceReport(
      replayAccepted: Long,        // exact path on a full replay: must be 0
      replayPairsStable: Boolean,  // near-dup pairs identical across replay
      dupRatioBefore: Double, dupRatioAfter: Double,
      vacuumedRows: Long, pairsStableAfterVacuum: Boolean,
      snapshotMaxFilesBefore: Int, // corpus gauge when the days are in
      snapshotCompacted: Boolean,  // gauge-dispatched OPTIMIZE ran
      snapshotQuietAfter: Boolean) // post-maintenance gauge is quiet

  def run(spark: SparkSession, sfDir: String, outRoot: String)
      : (Seq[BatchReport], MaintenanceReport) = {
    val corpusDir = s"$outRoot/corpus"
    val bandDir = s"$outRoot/neardup_index"

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    def stripe(i: Int): DataFrame = docs.filter(col("doc_id") % 4 === i)
    // day 3 re-crawls half of day 1: same texts, fresh provenance ids
    val recrawl = stripe(1).filter(col("doc_id") % 8 === 1)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    val days = Seq(
      "day1" -> stripe(1),
      "day2" -> stripe(2),
      "day3" -> stripe(3).unionAll(recrawl))

    def pairsOf(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    var day2Pairs = Set.empty[(Long, Long)]
    var replayAccepted = 0L
    var replayPairsStable = false
    val reports = days.map { case (label, batch) =>
      val b = batch.localCheckpoint(true)
      val exact = IncrementalDedup.ingest(spark, corpusDir, b,
        "doc_id", "text")
      val pairs = IncrementalNearDup.ingest(spark, bandDir, b,
        "doc_id", "text")
      val flagged = pairs.select("new_id").distinct().count()
      if (label == "day2") {
        // the crash happens HERE: day 2 replays in full before day 3
        // arrives. Exactly-once corpus: nothing newly accepted.
        // At-least-once index: same pair set back, duplicate band rows
        // planted on disk (the replay tax vacuum will reclaim).
        day2Pairs = pairsOf(pairs)
        val replayExact = IncrementalDedup.ingest(spark, corpusDir, b,
          "doc_id", "text")
        replayAccepted = replayExact.accepted
        replayPairsStable = pairsOf(IncrementalNearDup.ingest(
          spark, bandDir, b, "doc_id", "text")) == day2Pairs
      }
      BatchReport(label, exact.batchRows, exact.withinBatchDups,
        exact.alreadyKnown, exact.accepted, flagged)
    }

    // ---- maintenance: gauge the replay tax, vacuum, verify lookups ----
    // pre/post-vacuum lookups compare under the SAME history state
    // (all three days + the replay), so stability is attributable to
    // vacuum alone
    val day2 = days(1)._2.localCheckpoint(true)
    val preVacPairs = pairsOf(
      IncrementalNearDup.ingest(spark, bandDir, day2, "doc_id", "text"))
    val before = IndexMaintenance.stats(spark, bandDir)
    val vac = IndexMaintenance.vacuum(spark, bandDir, "__bkt")
    val after = IndexMaintenance.stats(spark, bandDir)
    val postVacPairs = pairsOf(
      IncrementalNearDup.ingest(spark, bandDir, day2, "doc_id", "text"))

    // the CORPUS side of maintenance: nightly gauge-then-OPTIMIZE on
    // the snapshot store (SnapshotStore.compactionGauge — one
    // manifest-sized listing, the analog of IndexMaintenance.stats for
    // the band index above). Idempotent: a quiet store skips the
    // rewrite entirely.
    import graft.streaming.SnapshotStore
    val corpusGauge = SnapshotStore.compactionGauge(spark, corpusDir)
    val compacted =
      if (corpusGauge.recommend) {
        SnapshotStore.compact(spark, corpusDir,
          keys = Seq("__fp", "text")) // IncrementalDedup's store keys
        true
      } else false
    val corpusQuiet = !SnapshotStore.compactionGauge(spark, corpusDir).recommend

    (reports, MaintenanceReport(
      replayAccepted = replayAccepted,
      replayPairsStable = replayPairsStable,
      dupRatioBefore = before.duplicationRatio,
      dupRatioAfter = after.duplicationRatio,
      vacuumedRows = vac.rowsBefore - vac.rowsAfter,
      pairsStableAfterVacuum = postVacPairs == preVacPairs,
      snapshotMaxFilesBefore = corpusGauge.maxBucketFiles,
      snapshotCompacted = compacted,
      snapshotQuietAfter = corpusQuiet))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outRoot = args.lift(1).getOrElse("/root/repo/target/incremental_demo")
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.LocalFs.rmrf(new java.io.File(outRoot))
    val (reports, m) = run(spark, sfDir, outRoot)
    reports.foreach(r => println(
      f"${r.batch}%-6s arrived=${r.arrived}%6d inBatchDups=${r.withinBatchDups}%5d " +
        f"known=${r.alreadyKnown}%5d accepted=${r.accepted}%6d nearFlagged=${r.nearDupFlagged}%5d"))
    println(f"replay: accepted=${m.replayAccepted} pairsStable=${m.replayPairsStable} " +
      f"dupRatio ${m.dupRatioBefore}%.2f -> ${m.dupRatioAfter}%.2f " +
      f"(vacuumed ${m.vacuumedRows} rows, stable=${m.pairsStableAfterVacuum})")
    println(s"corpus: maxBucketFiles=${m.snapshotMaxFilesBefore} " +
      s"compacted=${m.snapshotCompacted} quietAfter=${m.snapshotQuietAfter}")
    spark.stop()
  }
}
