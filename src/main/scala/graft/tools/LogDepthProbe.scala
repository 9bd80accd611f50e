package graft.tools

import graft.GraftSession
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** CDC-log version-depth probe (round-15 verdict item #6): measure
  * `readCdcLog`/`scd2` against log DEPTH — the axis a dimension's
  * change log grows on in production (one version per upstream commit;
  * a year of hourly commits is ~9k versions).
  *
  * Builds stable-schema logs at increasing depths (fixed total row
  * count, so only depth varies) and reports, per depth: plan leaf
  * count (must be 1 on the fast path — flat in depth), analysis+exec
  * time of a full-log aggregate, and scd2 current-view time. A
  * type-widened variant at the deepest depth shows the fallback's
  * per-version-branch cost for contrast — the price the fast path
  * avoids. Prints rows for SCALING.md.
  * Run: `sbt "runMain graft.tools.LogDepthProbe"`. */
object LogDepthProbe {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def timeMin(body: => Unit): Double = (1 to 3).map(_ => time(body)).min

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val out = "/root/repo/target/logdepthprobe"
    graft.LocalFs.rmrf(new java.io.File(out))
    val totalRows = 100000

    def buildLog(dir: String, depth: Int, widenLast: Boolean): Unit = {
      val perVersion = totalRows / depth
      (1 to depth).foreach { v =>
        val base = spark.range(perVersion.toLong)
          .select((col("id") + (v - 1).toLong * perVersion).as("k"),
            lit("insert").as("change_type"),
            lit(null).cast("string").as("old_status"),
            concat(lit("s"), col("id") % 5).as("new_status"))
        val df = if (widenLast && v == depth)
          base.withColumn("k", col("k").cast("int")) else base
        df.coalesce(1).write.parquet(s"$dir/__version=$v")
      }
    }

    println(s"log-depth probe (local[$cpus], $totalRows rows total, " +
      "stable schema unless noted):")
    println("| depth | plan leaves | read+agg s | scd2 current s |")
    println("|---|---|---|---|")
    Seq(5, 50, 200).foreach { depth =>
      val dir = s"$out/d$depth"
      buildLog(dir, depth, widenLast = false)
      val feed = Streams.readCdcLog(spark, dir)
      val leaves = feed.queryExecution.executedPlan.collectLeaves().size
      val tRead = timeMin(
        Streams.readCdcLog(spark, dir).groupBy("new_status").count().count())
      val tScd2 = timeMin(
        Streams.scd2(spark, dir, Seq("k"))
          .filter(col("valid_to").isNull).count())
      println(f"| $depth | $leaves | $tRead%.2f | $tScd2%.2f |")
    }
    // the fallback for contrast: one type-widened version at depth 200
    // forces per-version alignment — the branch-per-version plan the
    // fast path exists to avoid
    val wDir = s"$out/d200w"
    buildLog(wDir, 200, widenLast = true)
    val wFeed = Streams.readCdcLog(spark, wDir)
    val wLeaves = wFeed.queryExecution.executedPlan.collectLeaves().size
    val wRead = timeMin(
      Streams.readCdcLog(spark, wDir).groupBy("new_status").count().count())
    println(f"| 200 (widened: fallback) | $wLeaves | $wRead%.2f | — |")
    spark.stop()
  }
}
