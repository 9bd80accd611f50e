package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe: amplifies the sf0.1 tables ~10× by unioning key-shifted
  * copies (≈ sf1: 6M lineitem rows), then times the plan-critical
  * operators at 1× and 10× to measure how close to linear they scale.
  * Writes SCALING.md. This is a measurement artifact — the amplified
  * data lives in target/ and is never used for correctness checks.
  *
  * Run: `sbt "runMain graft.tools.ScaleProbe"`.
  */
object ScaleProbe {

  private def amplify(df: DataFrame, keyCols: Seq[String], copies: Int,
      offset: Long): DataFrame =
    (0 until copies).map { i =>
      keyCols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + i * offset))
    }.reduce(_.unionByName(_))

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/root/repo/target/scaleup"
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // materialize the 10x tables once (excluded from the timings)
    amplify(Tables.lineitem(spark, sf), Seq("l_orderkey"), 10, 10000000L)
      .write.mode("overwrite").parquet(s"$out/lineitem10")
    amplify(Tables.orders(spark, sf), Seq("o_orderkey"), 10, 10000000L)
      .write.mode("overwrite").parquet(s"$out/orders10")
    amplify(Tables.documents(spark, sf), Seq("doc_id"), 4, 1000000L)
      .write.mode("overwrite").parquet(s"$out/documents4")

    def li1 = Tables.lineitem(spark, sf)
    def li10 = spark.read.parquet(s"$out/lineitem10")
    def ord1 = Tables.orders(spark, sf)
    def ord10 = spark.read.parquet(s"$out/orders10")
    def docs1 = Tables.documents(spark, sf)
    def docs4 = spark.read.parquet(s"$out/documents4")

    def q1(li: DataFrame): Long = li
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity"), sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        count(lit(1)))
      .count()

    def smj(li: DataFrame, o: DataFrame): Long = li.hint("merge")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1))).count()

    def neardup(docs: DataFrame): Long = {
      val inv = graft.functions.TextOps.shingleRows(docs, "doc_id", "text", 3)
        .select(col("doc_id"), xxhash64(col("shingle")).as("s"))
      inv.as("a").join(inv.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1)))
        .count()
    }

    // warm-up
    q1(li1); smj(li1, ord1)

    val results = Seq(
      ("agg (TPC-H Q1 shape)", time(q1(li1))._2, time(q1(li10))._2, 10),
      ("sort-merge join + agg", time(smj(li1, ord1))._2, time(smj(li10, ord10))._2, 10),
      ("near-dup inverted index", time(neardup(docs1))._2, time(neardup(docs4))._2, 4))

    val sb = new StringBuilder
    sb.append("# SCALING — measured scale-up behavior (round 1)\n\n")
    sb.append(s"Base = sf0.1 (600k lineitem / 5k documents), amplified by key-shifted\n")
    sb.append(s"copies on local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]. ")
    sb.append("A plan that scales linearly in data volume on fixed\nresources is the ")
    sb.append("one that scales horizontally when resources grow with data.\n\n")
    sb.append("| operator | 1x sec | Nx sec | N | time ratio | vs linear |\n")
    sb.append("|---|---|---|---|---|---|\n")
    results.foreach { case (name, t1, tn, n) =>
      sb.append(f"| $name | $t1%.2f | $tn%.2f | ${n}x | ${tn / t1}%.1fx | " +
        f"${(tn / t1) / n * 100}%.0f%% |\n")
    }
    sb.append("\n(vs linear < 100% = better than linear — fixed per-job overhead\n")
    sb.append("amortizes; > 100% = superlinear growth, a red flag.)\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/SCALING.md"),
      sb.toString)
    println(sb.toString)
    spark.stop()
  }
}
