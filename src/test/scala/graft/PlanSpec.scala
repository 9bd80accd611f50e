package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts (the scale-design assertions behind SURVEY §4):
  * the right join strategies, pushdowns, and codegen spans must survive
  * refactors — a correct-but-repartitioned plan is a regression at 100 TB
  * even when results match. */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // materialize THIS plan so AQE finalizes + codegen spans appear
    df.queryExecution.executedPlan.toString
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(20).mkString("\n"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("fact-fact join is sort-merge (the strategy that scales)") {
    assert(plan("q_join_sortmerge").contains("SortMergeJoin"))
  }

  test("global top-k fuses to TakeOrderedAndProject (no full sort)") {
    assert(plan("q_topk_global").contains("TakeOrderedAndProject"))
  }

  test("equi+range join stays a hash/merge join, not a nested loop") {
    val p = plan("q_join_range")
    assert(!p.contains("NestedLoop"), p.linesIterator.take(12).mkString("\n"))
  }

  // whole-stage-codegen spans print as "*(n)" stage markers
  private val codegenSpan = """\*\(\d+\)""".r

  test("flagship aggregate does partial (map-side) aggregation in codegen") {
    val p = plan("q_agg_group")
    assert("partial_sum".r.findAllIn(p).nonEmpty, "expected map-side partial agg")
    assert(codegenSpan.findFirstIn(p).isDefined, "expected codegen spans")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual"),
      "expected shipdate pushed to parquet scan")
  }

  test("similarity join keeps the fused cosine inside codegen") {
    val p = plan("q_dedup_embed")
    assert(p.toLowerCase.contains("cosinesimilarityexpr"))
    assert(codegenSpan.findFirstIn(p).isDefined, "expected codegen spans")
  }

  test("semi/anti joins plan as join operators, not subquery re-scans") {
    assert(plan("q_join_semi").contains("LeftSemi"))
    assert(plan("q_join_anti").contains("LeftAnti"))
  }
}
