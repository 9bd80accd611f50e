package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", "4").appName("graft-test").getOrCreate()
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("flagship entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs and is non-empty at sf0.001") {
    // except q_except / anti-join shapes which may legitimately return 0
    // q_graph_kcore: the k=4 core of the sparse sf0.001 seasonal graph
    // is legitimately empty (every node peels)
    val mayBeEmpty =
      Set("q_except", "q_join_anti", "q_join_range", "q_graph_kcore")
    SparkEntry.registry.foreach { q =>
      val n = q.run(spark, sf).count()
      assert(n >= 0, s"${q.name} failed to run")
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("every oracle key exists in queries and names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q_agg_group exact values on sf0.001 (TPC-H Q1 shape)") {
    val rows = SparkEntry.queries("q_agg_group")(spark, sf).collect()
    assert(rows.nonEmpty)
    // group keys are the 2-letter flag/status pairs; counts sum to filtered total
    val total = rows.map(_.getAs[Long]("n")).sum
    val filtered = Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <=
        org.apache.spark.sql.functions.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
      .count()
    assert(total == filtered)
  }

  test("determinism: q_agg_group identical across shuffle partition counts") {
    val a = SparkEntry.queries("q_agg_group")(spark, sf).collect().map(_.toString).toSeq
    val s2 = GraftSession.builder("local[2]", "2").appName("graft-test-p2").getOrCreate()
    try {
      val b = SparkEntry.queries("q_agg_group")(s2, sf).collect().map(_.toString).toSeq
      assert(a == b)
    } finally ()
  }
}
