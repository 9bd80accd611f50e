package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Round-15 additions measured on their bounding axes (rows pasted
  * into SCALING.md, same protocol as the other probes): 4 disjoint
  * copies of each key's input.
  *
  *  - `q_impute`: 4x customer rows, SAME 5 segments → the repair scan
  *    grows 4x while the broadcast stats stay 5 rows. Should track the
  *    scan axis exactly (the map-side-repair design claim).
  *  - `q_entity_resolution`: 4x the name vocabulary via per-copy
  *    suffixes at pairwise distance 3 (> the match threshold 2), so
  *    copies stay disjoint — pairs and clusters grow exactly 4x, the
  *    banded join's candidate work 4x (vs 16x unbanded). CC rounds
  *    unchanged (cluster diameter is a property of the variant set,
  *    not the corpus).
  *
  * Run: `sbt "runMain graft.tools.Round15Probe"`. */
object Round15Probe {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def timeMin(body: => Unit): Double = (1 to 3).map(_ => time(body)).min

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/root/repo/target/round15probe"
    graft.LocalFs.rmrf(new java.io.File(out))
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 4x customer (shifted ids, segments unchanged → stats stay 5 rows)
    val cust = Tables.customer(spark, sf)
    (0 until 4).map(i => cust
        .withColumn("c_custkey", col("c_custkey") + i * 100000000L))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/x4/customer.parquet")

    // 4x part-name vocabulary: per-copy suffix alphabet at pairwise
    // edit distance 3 keeps copies unmatchable at threshold 2
    val suffix = Seq("aaa", "bbb", "ccc", "ddd")
    val part = Tables.part(spark, sf)
    (0 until 4).map(i => part
        .withColumn("p_partkey", col("p_partkey") + i * 10000000L)
        .withColumn("p_name", concat(col("p_name"), lit(" " + suffix(i)))))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/x4/part.parquet")

    println(f"${"key"}%-22s ${"base_s"}%8s ${"x4_s"}%8s ratio")
    Seq("q_impute", "q_entity_resolution").foreach { k =>
      val q = SparkEntry.queries(k)
      val base = timeMin(q(spark, sf).collect())
      val x4 = timeMin(q(spark, s"$out/x4").collect())
      println(f"$k%-22s $base%8.2f $x4%8.2f ${x4 / base}%.1fx")
    }
    // sanity: the x4 ER output really is 4x the clusters
    val c1 = SparkEntry.queries("q_entity_resolution")(spark, sf).count()
    val c4 = SparkEntry.queries("q_entity_resolution")(spark, s"$out/x4").count()
    println(s"er clusters: base=$c1 x4=$c4")

    // day-2 axis: the SAME arriving batch ingested against 1x vs 4x
    // history — the claim under test is that batch cost is flat in
    // history size (band-pruned lookups + merge-bounded writes), while
    // a from-scratch rebuild is vocabulary-bounded by construction.
    // (At probe scale fixed protocol costs dominate both paths — the
    // RATIO across history sizes is the signal, not the absolute.)
    import graft.operators.IncrementalEntityResolution
    val vocab4 = spark.read.parquet(s"$out/x4/part.parquet")
      .select(col("p_name").as("name")).distinct().localCheckpoint(true)
    val batch = vocab4.filter(substring(col("name"), 1, 1) === "c"
      && col("name").endsWith("aaa"))
    def ingestAgainst(hist: org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      IncrementalEntityResolution.ingest(spark, dir, hist, "name")
      time(IncrementalEntityResolution.ingest(spark, dir, batch, "name"))
    }
    val hist1 = vocab4.filter(col("name").endsWith("aaa")).exceptAll(batch)
    val hist4 = vocab4.exceptAll(batch)
    val t1 = ingestAgainst(hist1, s"$out/er1")
    val t4 = ingestAgainst(hist4, s"$out/er4")
    println(f"er day-2 batch vs history size: 1x=$t1%.2f s 4x=$t4%.2f s " +
      f"ratio=${t4 / t1}%.2fx (resolved rows at 4x=" +
      s"${IncrementalEntityResolution.resolved(spark, s"$out/er4").count()})")
    spark.stop()
  }
}
