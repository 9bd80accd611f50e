package graft

import graft.operators.{AsOf, RangeJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The packaged time-join operators must agree with the oracle-checked
  * query-key formulations / a naive reference plan. */
class TimeJoinsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("AsOf.join reproduces the oracle-checked q_join_asof result") {
    val events = Tables.events(spark, sf)
    val errors = events.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_event_id"))
    val got = AsOf.join(errors, clicks, Seq("user_id"),
        leftTs = "ts", rightTs = "ts", valueCols = Seq("click_event_id"),
        rightId = Some("click_event_id"))
      .select("event_id", "user_id", "click_event_id")
      .orderBy("event_id")
      .collect().map(_.toString).toSeq
    val expected = SparkEntry.queries("q_join_asof")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(got == expected)
  }

  test("bucketed range join equals the nested-loop reference, without NestedLoop") {
    val events = Tables.events(spark, sf)
    val points = events.select(col("event_id").as("pid"), col("ts"))
    val intervals = events.filter(col("event_type") === "signup").limit(50)
      .select(col("event_id").as("iid"),
        col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("end_ts"))
    val bucketed = RangeJoin.pointInInterval(points, intervals,
      "ts", "start_ts", "end_ts", bucketWidthSec = 600)
    bucketed.collect()
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan.linesIterator.take(12).mkString("\n"))
    val naive = points.crossJoin(intervals)
      .filter(col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
    assert(bucketed.count() == naive.count())
    assert(bucketed.count() > 0, "expected some point-in-interval matches")
  }
}
