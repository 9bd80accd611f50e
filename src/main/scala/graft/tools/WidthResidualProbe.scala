package graft.tools

import graft.{GraftSession, Tables}
import graft.catalog.Relations
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-12 diagnosis (round-11 verdict item #8): the width sweep shows
  * sketch cost per column creeping 0.118→0.200 s from 16→128 columns.
  * This probe times each stage of the sketch pipeline separately per
  * width — melt-only scan, melt+hash, the k-bounded aggregation, and
  * the pair compare — so the residual can be attributed (aggregation
  * state vs scan shape vs scoring) instead of guessed. */
object WidthResidualProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/root/repo/target/relscale"
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.BottomKAggregate.register(spark)
    val key = Tables.orders(spark, sf).select("o_orderkey")
    def wide(df: DataFrame, w: Int): DataFrame =
      df.select((0 until w).map(i =>
        (col("o_orderkey") + i * 100000000L).as(f"k$i%03d_key")): _*)
    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def tmin[T](body: => T): Double = (1 to 3).map(_ => time(body)).min
    Seq(16, 64, 128).foreach { w =>
      wide(key, w).write.mode("overwrite").parquet(s"$out/wf_$w")
      wide(key.filter(col("o_orderkey") % 10 === 0), w)
        .write.mode("overwrite").parquet(s"$out/wh_$w")
      val tabs = Seq("wide_full" -> spark.read.parquet(s"$out/wf_$w"),
        "wide_head" -> spark.read.parquet(s"$out/wh_$w"))
      Relations.sketchDiscover(tabs).count() // warm
      val tMelt = tmin(Relations.melt(tabs).count())
      val tHash = tmin(Relations.melt(tabs)
        .select(col("tbl"), col("col"), xxhash64(col("v")).as("h")).count())
      val tSketch = tmin(Relations.columnSketches(tabs).count())
      val tFull = tmin(Relations.sketchDiscover(tabs).count())
      println(f"w=$w%3d melt=$tMelt%.2f +hash=$tHash%.2f " +
        f"+agg(sketch)=$tSketch%.2f full=$tFull%.2f " +
        f"per-col: melt=${tMelt / w}%.4f sketch=${tSketch / w}%.4f full=${tFull / w}%.4f")
    }
    spark.stop()
  }
}
