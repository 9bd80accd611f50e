package graft.examples

import graft.GraftSession
import graft.queries.{Commerce, EventAnalytics, Graphs}
import org.apache.spark.sql.SparkSession

/** One-job "growth report" — the product/revenue analytics surface
  * composed the way an analyst would run it daily: a single session
  * reads the event log and the order book and emits every headline
  * report from the rounds-12/13 family:
  *
  *   events → ordered funnel + step latency   (acquisition)
  *          → top session-opening paths       (navigation)
  *          → first/last-touch attribution    (channels)
  *          → weekly retention + curve        (engagement)
  *          → DAU/WAU stickiness              (engagement)
  *          → A/B experiment readout          (experimentation)
  *   orders → monthly cohort LTV curve        (revenue)
  *          → RFM segmentation                (revenue)
  *          → basket co-occurrence top-20     (merchandising)
  *          → association rules by lift       (merchandising)
  *          → repeat-purchase cadence         (revenue)
  *   items  → co-purchase hub degree          (merchandising)
  *          → PageRank product centrality     (merchandising)
  *          → seasonal component histogram    (merchandising)
  *
  * Every section is one registered `SparkEntry` key run verbatim — the
  * demo adds NOTHING the oracle hasn't hash-checked; what it
  * demonstrates is that the whole report is a handful of bounded
  * frames (vocabulary / calendar / 4³ cells / top-k) over exactly one
  * user-keyed pass of events and one custkey-keyed pass of orders per
  * section, so the daily report stays interactive at any corpus size.
  *
  * Run: `sbt "runMain graft.examples.GrowthReportDemo [sfDir]"`.
  */
object GrowthReportDemo {

  final case class Section(name: String, rows: Long)

  /** Runs every report section; returns (section, row-count) pairs in
    * report order. Row counts are the bounded-frame sizes the Scaladoc
    * claims — PipelineSpec pins the bounds. */
  def run(spark: SparkSession, sfDir: String): Seq[Section] = {
    val sections = Seq(
      "funnel" -> EventAnalytics.qFunnel,
      "funnel_latency" -> EventAnalytics.qFunnelLatency,
      "session_paths" -> EventAnalytics.qEventPaths,
      "attribution" -> EventAnalytics.qAttribution,
      "retention_weekly" -> EventAnalytics.qRetentionWeekly,
      "active_users" -> EventAnalytics.qActiveUsers,
      "experiment_lift" -> EventAnalytics.qExperimentLift,
      "cohort_ltv" -> Commerce.qCohortLtv,
      "rfm" -> Commerce.qRfm,
      "basket_pairs" -> Commerce.qBasketPairs,
      "basket_lift" -> Commerce.qBasketLift,
      "repeat_purchase" -> Commerce.qRepeatPurchase,
      "graph_degree" -> Graphs.qGraphDegree,
      "graph_pagerank" -> Graphs.qGraphPagerank,
      "graph_components" -> Graphs.qGraphComponents)
    sections.map { case (name, q) =>
      Section(name, q.run(spark, sfDir).count())
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir).foreach(s => println(f"${s.name}%-18s ${s.rows}%8d rows"))
    spark.stop()
  }
}
