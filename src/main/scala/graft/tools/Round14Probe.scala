package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Round-14 additions measured on their bounding axes (rows pasted
  * into SCALING.md, same protocol as the other probes): 4 disjoint
  * copies of each key's input — part-id/order-id spaces shifted so
  * the copies stay independent.
  *
  *  - `q_trending`: 4x lineitem AND 4x part vocabulary → 4x weekly
  *    cells, 4x lag partitions. Should track the scan axis.
  *  - `q_skyline`: 4x parts → 4x per-price groups into ONE CumMax
  *    range exchange; the frontier itself stays frontier-sized.
  *  - `q_fuzzy_match`: 4x the name vocabulary → up to 16x banded
  *    candidate pairs (the quadratic axis the length band bounds) —
  *    the interesting probe: does the banded equi-join absorb it.
  *  - `q_profile_fd`: 4x part rows, same K·(K−1) pair fan-out → the
  *    melt shuffle is 4x rows, vocabulary rollup unchanged.
  *
  * Run: `sbt "runMain graft.tools.Round14Probe"`. */
object Round14Probe {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def timeMin(body: => Unit): Double = (1 to 3).map(_ => time(body)).min

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/root/repo/target/round14probe"
    graft.LocalFs.rmrf(new java.io.File(out))
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 4x lineitem (shifted order AND part ids) for q_trending
    val li = Tables.lineitem(spark, sf)
    (0 until 4).map(i => li
        .withColumn("l_orderkey", col("l_orderkey") + i * 100000000L)
        .withColumn("l_partkey", col("l_partkey") + i * 10000000L))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/x4/lineitem.parquet")

    // 4x part (shifted ids, distinct name/price spaces per copy so the
    // name vocabulary and the price axis really grow 4x)
    val part = Tables.part(spark, sf)
    (0 until 4).map(i => part
        .withColumn("p_partkey", col("p_partkey") + i * 10000000L)
        .withColumn("p_name", concat(col("p_name"), lit(" v" + i)))
        .withColumn("p_retailprice", col("p_retailprice") + i * 100000.0))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/x4/part.parquet")

    // nation/region pass through unchanged (q_profile_fd reads them too)
    Tables.load(spark, sf, "nation")
      .write.mode("overwrite").parquet(s"$out/x4/nation.parquet")
    Tables.load(spark, sf, "region")
      .write.mode("overwrite").parquet(s"$out/x4/region.parquet")

    println(f"${"key"}%-16s ${"base_s"}%8s ${"x4_s"}%8s ratio")
    Seq("q_trending", "q_skyline", "q_fuzzy_match", "q_profile_fd")
      .foreach { k =>
        val q = SparkEntry.queries(k)
        val base = timeMin(q(spark, sf).collect())
        val x4 = timeMin(q(spark, s"$out/x4").collect())
        println(f"$k%-16s $base%8.2f $x4%8.2f ${x4 / base}%.1fx")
      }
    spark.stop()
  }
}
