package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** One-off plan inspector for the shingle pipeline (diagnostic tool). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val sh = graft.functions.TextOps.shingleRows(docs, "doc_id", "text", 3)
    val plan = sh.queryExecution.executedPlan.toString
    val nSplit = "split\\(".r.findAllIn(plan).size
    println(s"=== split() occurrences in physical plan: $nSplit")
    println(plan.take(4000))
    spark.stop()
  }
}
