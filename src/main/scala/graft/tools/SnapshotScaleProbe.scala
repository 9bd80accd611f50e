package graft.tools

import graft.{GraftSession, Tables}
import graft.streaming.SnapshotStore
import org.apache.spark.sql.functions._

/** Snapshot-merge scaling probe: against a large committed snapshot,
  * measure one MERGE whose batch hashes into a single bucket vs one
  * whose equally-sized batch spreads across every bucket. The claim
  * under test is the incremental-ingest scale story: merge cost follows
  * TOUCHED BUCKETS (batch-proportional), not snapshot size.
  *
  * Appends/replaces the "## Snapshot merge" section of SCALING.md.
  * Run: `sbt "runMain graft.tools.SnapshotScaleProbe"`.
  */
object SnapshotScaleProbe {

  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val numBuckets = 32
    val dir = "/root/repo/target/snapscale"
    graft.LocalFs.rmrf(new java.io.File(dir))

    // base snapshot: 1.5M keys (10x orders, key-shifted)
    val base = (0 until 10).map { i =>
      Tables.orders(spark, sf).select(
        (col("o_orderkey") + i * 10000000L).as("k"),
        col("o_totalprice").as("v"))
    }.reduce(_ unionByName _)
    SnapshotStore.merge(spark, dir, base, Seq("k"), numBuckets)
    val snapshotRows = SnapshotStore.read(spark, dir).count()

    // two equally-sized 2k-key batches: one confined to bucket 0, one
    // spread over all buckets (same rows-per-merge, different fan-out)
    val bucketOf = SnapshotStore.bucketCol(Seq("k"), numBuckets)
    val oneBucket = base.withColumn("__b", bucketOf)
      .filter(col("__b") === 0).drop("__b").limit(2000)
      .withColumn("v", col("v") + 1).localCheckpoint(true)
    val spread = base.limit(2000)
      .withColumn("v", col("v") + 1).localCheckpoint(true)

    val tOne = time(SnapshotStore.merge(spark, dir, oneBucket, Seq("k"), numBuckets))
    val tSpread = time(SnapshotStore.merge(spark, dir, spread, Seq("k"), numBuckets))
    // control: a merge-sized rewrite of the WHOLE snapshot (what a
    // non-bucketed upsert would pay every batch)
    val tFull = time(SnapshotStore.merge(spark, dir,
      SnapshotStore.read(spark, dir).withColumn("v", col("v") + 1),
      Seq("k"), numBuckets))

    // predicate UPDATE (round 9): same bounded-rewrite claim — the
    // find-touched pass always scans (a predicate can match anywhere),
    // but the REWRITE cost follows the buckets holding matches. A
    // key-range predicate confined to one bucket's keys vs one touching
    // every bucket, equal match counts (~2k rows each).
    val oneKeys = oneBucket.select("k").collect().map(_.getLong(0)).toSet
    val tUpdOne = time(SnapshotStore.update(spark, dir, Seq("k"),
      Map("v" -> (col("v") + 1)), col("k").isInCollection(oneKeys)))
    val spreadKeys = spread.select("k").collect().map(_.getLong(0)).toSet
    val tUpdSpread = time(SnapshotStore.update(spark, dir, Seq("k"),
      Map("v" -> (col("v") + 1)), col("k").isInCollection(spreadKeys)))
    val tUpdFull = time(SnapshotStore.update(spark, dir, Seq("k"),
      Map("v" -> (col("v") + 1)), lit(true)))

    // ---- compaction: scan cost follows FILE COUNT, compact heals it ----
    // fragment deliberately: a wide-shuffle full rewrite with AQE
    // coalescing off leaves ~64 files in every bucket — the state a
    // long-lived snapshot reaches after many wide merges
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val shufKey = "spark.sql.shuffle.partitions"
    val (cWas, sWas) = (spark.conf.get(coalesceKey, "true"), spark.conf.get(shufKey))
    spark.conf.set(coalesceKey, "false"); spark.conf.set(shufKey, "64")
    SnapshotStore.merge(spark, dir,
      SnapshotStore.read(spark, dir).withColumn("v", col("v") + 1),
      Seq("k"), numBuckets)
    spark.conf.set(coalesceKey, cWas); spark.conf.set(shufKey, sWas)
    def liveFiles(): Int = {
      val m = SnapshotStore.currentManifest(spark, dir).get
      m.buckets.values.map(d =>
        Option(new java.io.File(s"$dir/$d").listFiles()).getOrElse(Array.empty)
          .count(f => f.isFile && f.getName.endsWith(".parquet"))).sum
    }
    def scanAll(): Double =
      time(SnapshotStore.read(spark, dir).agg(sum("v")).head())
    val filesFrag = liveFiles()
    scanAll() // warm page cache/codegen so frag-vs-compact compares IO shape
    val tScanFrag = math.min(scanAll(), scanAll())
    val tCompact = time(SnapshotStore.compact(spark, dir, Seq("k")))
    val filesCompact = liveFiles()
    val tScanCompact = math.min(scanAll(), scanAll())

    // ---- compaction after a DML SEQUENCE (round-10, verdict item #7):
    // the whole triad — 4 predicate UPDATEs, 3 DELETEs, 1 merge — under
    // the same production-wide shuffle (64 partitions, AQE coalescing
    // off), each version retained for time travel. Every bucket a DML
    // step rewrites lands as multi-file; after >=8 versions the live
    // snapshot is the accumulated fragmentation state, and compact()
    // must heal it in one content-identical version.
    spark.conf.set(coalesceKey, "false"); spark.conf.set(shufKey, "64")
    (0 until 4).foreach { i =>
      SnapshotStore.update(spark, dir, Seq("k"),
        Map("v" -> (col("v") + 1)), pmod(col("k"), lit(4)) === i, retain = true)
    }
    (0 until 3).foreach { i =>
      SnapshotStore.delete(spark, dir,
        base.filter(pmod(col("k"), lit(1000)) === i).select("k"),
        Seq("k"), retain = true)
    }
    SnapshotStore.merge(spark, dir,
      base.limit(2000).withColumn("v", col("v") + 10).localCheckpoint(true),
      Seq("k"), numBuckets, retain = true)
    spark.conf.set(coalesceKey, cWas); spark.conf.set(shufKey, sWas)
    val dmlVersions = SnapshotStore.currentManifest(spark, dir).get.version
    val filesDml = liveFiles()
    scanAll()
    val tScanDml = math.min(scanAll(), scanAll())
    val tCompactDml = time(SnapshotStore.compact(spark, dir, Seq("k")))
    val filesDmlCompact = liveFiles()
    val tScanDmlCompact = math.min(scanAll(), scanAll())

    // ---- size-targeted compaction on a SKEWED bucket (round 11): all
    // 1.5M rows hash-confined to ONE bucket (numBuckets=1, the extreme
    // of production key skew). One-file-per-bucket compaction makes the
    // whole rewrite a single task and a single output file; the
    // size-targeted path salts the rewrite into ceil(bytes/target)
    // parallel write tasks and near-target-size files.
    val skewDir = "/root/repo/target/snapscale_skew"
    def buildSkewed(): Unit = {
      graft.LocalFs.rmrf(new java.io.File(skewDir))
      spark.conf.set(coalesceKey, "false"); spark.conf.set(shufKey, "64")
      SnapshotStore.merge(spark, skewDir, base, Seq("k"), numBuckets = 1)
      SnapshotStore.merge(spark, skewDir,
        base.withColumn("v", col("v") + 1), Seq("k"), numBuckets = 1)
      spark.conf.set(coalesceKey, cWas); spark.conf.set(shufKey, sWas)
    }
    def skewStats(): (Int, Long) = {
      val m = SnapshotStore.currentManifest(spark, skewDir).get
      val fs = m.buckets.values.toSeq.flatMap(d =>
        Option(new java.io.File(s"$skewDir/$d").listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet")))
      (fs.length, fs.map(_.length).sum)
    }
    buildSkewed()
    val (_, skewBytes) = skewStats()
    val tCompactOne = time(SnapshotStore.compact(spark, skewDir, Seq("k")))
    val (filesOne, _) = skewStats()
    buildSkewed()
    val tCompactSplit = time(SnapshotStore.compact(spark, skewDir, Seq("k"),
      targetFileBytes = math.max(1L, skewBytes / 8)))
    val (filesSplit, _) = skewStats()
    graft.LocalFs.rmrf(new java.io.File(skewDir))

    val section = new StringBuilder
    section.append("\n## Snapshot merge: cost follows touched buckets, not snapshot size\n\n")
    section.append(f"Base snapshot $snapshotRows%,d keys in $numBuckets buckets; each probe\n")
    section.append("batch upserts 2,000 keys (same batch size, different bucket fan-out);\n")
    section.append("the control rewrites every key — what a non-bucketed upsert pays:\n\n")
    section.append("| merge batch | buckets touched | wall sec |\n|---|---|---|\n")
    section.append(f"| 2k keys, one bucket | 1 | $tOne%.2f |\n")
    section.append(f"| 2k keys, spread | $numBuckets | $tSpread%.2f |\n")
    section.append(f"| full rewrite (control) | $numBuckets | $tFull%.2f |\n")
    section.append(f"\nFinding: the single-bucket merge reads/rewrites 1/$numBuckets of the\n")
    section.append("snapshot; the spread batch pays proportionally more because it\n")
    section.append("drags every bucket through the anti-join+rewrite, and the full\n")
    section.append("rewrite is the non-bucketed ceiling. At 100 TB the bucket count\n")
    section.append("scales with the snapshot, so per-batch cost stays batch-sized —\n")
    section.append("exactly the q_dedup_incremental / CDC-sink ingestion path.\n")
    section.append("\nPredicate UPDATE (round 9), same snapshot, ~2k matching rows per\n")
    section.append("probe: the find-touched pass always scans (a predicate can match\n")
    section.append("anywhere — Delta/Iceberg pay the same), the REWRITE follows the\n")
    section.append("buckets holding matches:\n\n")
    section.append("| update predicate | buckets rewritten | wall sec |\n|---|---|---|\n")
    section.append(f"| matches in one bucket | 1 | $tUpdOne%.2f |\n")
    section.append(f"| matches spread | $numBuckets | $tUpdSpread%.2f |\n")
    section.append(f"| matches everything | $numBuckets | $tUpdFull%.2f |\n")
    section.append("\nCompaction (round 9): a wide-shuffle rewrite (64 shuffle\n")
    section.append("partitions, AQE coalescing off) fragments every bucket; scan cost\n")
    section.append("follows file count — open/footer overhead per file — and compact()\n")
    section.append("rewrites each multi-file bucket to one file, after which an\n")
    section.append("immediate re-compact is a no-op:\n\n")
    section.append("| state | parquet files | full-scan sec |\n|---|---|---|\n")
    section.append(f"| fragmented | $filesFrag | $tScanFrag%.2f |\n")
    section.append(f"| compacted (compact took $tCompact%.2f s) | $filesCompact | $tScanCompact%.2f |\n")
    section.append("\nCompaction after a DML SEQUENCE (round 10): the full triad —\n")
    section.append("4 predicate UPDATEs, 3 key DELETEs, 1 merge — under the same wide\n")
    section.append(f"shuffle, every version retained (head version $dmlVersions%d). Measured\n")
    section.append("finding: DML fragmentation does NOT accumulate across versions —\n")
    section.append("each step REPLACES its touched bucket dirs wholesale, so the live\n")
    section.append("file count stays at the LAST rewrite's width, and compact() earns\n")
    section.append("its keep after wide merges rather than after DML sequences:\n\n")
    section.append("| state | parquet files | full-scan sec |\n|---|---|---|\n")
    section.append(f"| after 8-step DML sequence | $filesDml | $tScanDml%.2f |\n")
    section.append(f"| compacted (compact took $tCompactDml%.2f s) | $filesDmlCompact | $tScanDmlCompact%.2f |\n")
    section.append("\nSize-targeted compaction on a SKEWED bucket (round 11): the same\n")
    section.append(f"1.5M rows confined to ONE bucket (${skewBytes / 1024 / 1024}%d MB — the skew\n")
    section.append("shape where one-file-per-bucket compaction degenerates to a single\n")
    section.append("write task and one oversized file). targetFileBytes = bucket/8\n")
    section.append("salts the rewrite into parallel near-target-size writes:\n\n")
    section.append("| compaction | output files | wall sec |\n|---|---|---|\n")
    section.append(f"| one-file-per-bucket (default target) | $filesOne | $tCompactOne%.2f |\n")
    section.append(f"| size-targeted (bucket/8) | $filesSplit | $tCompactSplit%.2f |\n")
    section.append("\nAt 100x the skewed bucket is multi-GB: the single-task rewrite\n")
    section.append("becomes the job's straggler and the output file unsplittable scan\n")
    section.append("burden; the salted split keeps both write parallelism and file\n")
    section.append("sizes bounded by targetFileBytes, and re-compaction still\n")
    section.append("converges (files <= want(b) suppresses re-touching).\n")

    val path = java.nio.file.Paths.get("/root/repo/SCALING.md")
    val cur = java.nio.file.Files.readString(path)
    val marker = "\n## Snapshot merge"
    val fixed = cur.indexOf(marker) match {
      case -1 => cur
      case i =>
        val rest = cur.indexOf("\n## ", i + marker.length)
        if (rest == -1) cur.substring(0, i) else cur.substring(0, i) + cur.substring(rest)
    }
    java.nio.file.Files.writeString(path, fixed + section.toString)
    println(section.toString)
    spark.stop()
  }
}
