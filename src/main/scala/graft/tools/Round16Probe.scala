package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Round-16 measurements (rows pasted into SCALING.md, same protocol as
  * the other probes):
  *
  *  1. BM25 store batch-cost vs history (the ER probe's twin, round-15
  *     verdict item #5): the SAME documents batch ingested against a 1×
  *     vs 4× indexed corpus. The design claim under test: a batch's
  *     cost is tokenize(batch) + bucket-pruned merges — the corpus text
  *     is never re-read, and the only history-sized component is the
  *     touched-bucket rewrite (store-size/numBuckets per touched
  *     bucket), which log-fold keeps postings-sized. Report the ratio.
  *  2. BM25 fold cost at 1× vs 4× postings: the claim is fold reads the
  *     POSTINGS store only (corpus text untouched) — cost should track
  *     the postings row count, i.e. ~4× between the two stores, with
  *     neither number anywhere near a corpus re-tokenize.
  *  3. ER name-index I/O at a UNIFORM-length vocabulary (round-15
  *     verdict item #6, the "documented next notch"): with fixed-width
  *     names the length prune degenerates to one partition and every
  *     batch reads ~the whole index. Measure the same batch ingested
  *     against 1× vs 4× uniform-vocabulary history: if the ratio stays
  *     near flat, vocabulary I/O does NOT dominate a batch and the
  *     (seg_id, segment-hash)-bucketed layout stays unbuilt (recorded
  *     negative); a clearly super-flat ratio would justify building it.
  *
  * Run: `sbt "runMain graft.tools.Round16Probe [sfDir]"`. */
object Round16Probe {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/root/repo/target/round16probe"
    graft.LocalFs.rmrf(new java.io.File(out))
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.TextIndexStore

    // ---- 1+2: BM25 store vs history size --------------------------------
    // 4 disjoint corpus copies: shifted ids, texts tagged with a per-copy
    // suffix token so postings stay disjoint across copies
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .filter(col("text").isNotNull).localCheckpoint(true)
    val n = docs.count()
    def copy(i: Int) = docs
      .withColumn("doc_id", col("doc_id") + i * 100000000L)
      .withColumn("text", concat(col("text"), lit(s" copytag$i")))
    val hist1 = copy(0)
    val hist4 = (0 until 4).map(copy).reduce(_ unionByName _)
    // the arriving batch: ~10% of one copy, shifted clear of all history
    val batch = docs.filter(col("doc_id") % 10 === 3)
      .withColumn("doc_id", col("doc_id") + 900000000L)
      .select(col("doc_id"), lit("insert").as("change_type"),
        lit(null).cast("string").as("old_text"), col("text").as("new_text"))
      .localCheckpoint(true)
    val bn = batch.count()
    def buildStore(hist: org.apache.spark.sql.DataFrame, tag: String) = {
      val (p, l) = (s"$out/$tag/post", s"$out/$tag/len")
      TextIndexStore.build(spark, p, l, hist)
      (p, l)
    }
    val (p1, l1) = buildStore(hist1, "x1")
    val (p4, l4) = buildStore(hist4, "x4")
    val t1 = time(TextIndexStore.ingestBatch(spark, p1, l1, batch, 0L))
    val t4 = time(TextIndexStore.ingestBatch(spark, p4, l4, batch, 0L))
    println(f"bm25 batch ($bn docs) vs history: 1x($n docs)=$t1%.2f s " +
      f"4x=$t4%.2f s ratio=${t4 / t1}%.2fx")
    // fold cost: postings-sized, corpus never re-read
    val f1 = time(TextIndexStore.foldPostings(spark, p1))
    val f4 = time(TextIndexStore.foldPostings(spark, p4))
    val rows1 = graft.streaming.SnapshotStore.read(spark, p1).count()
    val rows4 = graft.streaming.SnapshotStore.read(spark, p4).count()
    println(f"bm25 fold: 1x=$f1%.2f s ($rows1 rows) 4x=$f4%.2f s " +
      f"($rows4 rows) ratio=${f4 / f1}%.2fx (postings ratio ${rows4.toDouble / rows1}%.1fx)")

    // ---- 3: ER index I/O under a UNIFORM-length vocabulary --------------
    import graft.operators.IncrementalEntityResolution
    // fixed-width 12-hex codes: one length partition, so the band prune
    // reads the WHOLE index — the adversarial regime for index I/O
    def codes(n: Long, salt: String) = spark.range(n)
      .select(substring(md5(concat(lit(salt), col("id"))), 1, 12).as("name"))
    val erBatch = codes(5000, "batch").localCheckpoint(true)
    def ingestAgainst(histN: Long, dir: String): Double = {
      IncrementalEntityResolution.ingest(spark, dir, codes(histN, "hist"),
        "name")
      time(IncrementalEntityResolution.ingest(spark, dir, erBatch, "name"))
    }
    val e1 = ingestAgainst(25000L, s"$out/er1")
    val e4 = ingestAgainst(100000L, s"$out/er4")
    println(f"er uniform-vocab batch (5000 names) vs history: " +
      f"1x(25k)=$e1%.2f s 4x(100k)=$e4%.2f s ratio=${e4 / e1}%.2fx")

    // ---- 4: stats store batch cost vs maintained table size -------------
    // claim: a batch's cost is feed-sized (two 1-row driver aggregates
    // melted to columns-bounded delta rows + a columns-bounded merge) —
    // the maintained table's SIZE never enters the per-batch path
    import graft.streaming.StatsStore
    val li = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey", "l_partkey")
      .agg(sum("l_quantity").as("l_quantity"),
        max("l_returnflag").as("l_returnflag"))
      .localCheckpoint(true)
    val statCols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    def liCopy(i: Int) = li
      .withColumn("l_orderkey", col("l_orderkey") + i * 100000000L)
    StatsStore.build(spark, s"$out/st1", liCopy(0), statCols)
    StatsStore.build(spark, s"$out/st4",
      (0 until 4).map(liCopy).reduce(_ unionByName _), statCols)
    val statBatch = liCopy(0).filter(col("l_orderkey") % 10 === 3)
      .withColumn("l_orderkey", col("l_orderkey") + 900000000L)
      .select(col("l_orderkey"), col("l_partkey"),
        lit("insert").as("change_type"),
        lit(null).cast("double").as("old_l_quantity"),
        col("l_quantity").as("new_l_quantity"),
        lit(null).cast("string").as("old_l_returnflag"),
        col("l_returnflag").as("new_l_returnflag"))
      .localCheckpoint(true)
    val sbn = statBatch.count()
    val st1 = time(StatsStore.ingestBatch(spark, s"$out/st1", statBatch, 0L,
      Seq("l_orderkey", "l_partkey"), Seq("l_quantity", "l_returnflag")))
    val st4 = time(StatsStore.ingestBatch(spark, s"$out/st4", statBatch, 0L,
      Seq("l_orderkey", "l_partkey"), Seq("l_quantity", "l_returnflag")))
    println(f"stats store batch ($sbn rows) vs table: 1x=$st1%.2f s " +
      f"4x=$st4%.2f s ratio=${st4 / st1}%.2fx")
    spark.stop()
  }
}
