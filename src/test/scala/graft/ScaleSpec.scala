package graft

import graft.sources.{Bucketing, Salting}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-elimination / skew primitives: semantics preserved, and the
  * plan-shape claims (no Exchange on bucketed joins) actually hold. */
class ScaleSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketed join plans without Exchange (co-located, zero shuffle)") {
    Bucketing.writeBucketed(Tables.orders(spark, sf), "b_orders", Seq("o_orderkey"), 8)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), 8)
    val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem", Seq("o_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(15).mkString("\n"))
    assert(!plan.contains("Exchange hashpartitioning"),
      plan.linesIterator.take(15).mkString("\n"))
    assert(plan.contains("Bucketed: true"), "bucket layout should be used")
    // semantics: same as the unbucketed join
    val o = Tables.orders(spark, sf)
    val l = Tables.lineitem(spark, sf)
    val plain = o.join(l, o("o_orderkey") === l("l_orderkey"))
    assert(joined.count() == plain.count())
  }

  test("partitioned write enables static partition pruning on read") {
    val path = "/root/repo/target/partitioned/lineitem_by_flag"
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .partitionBy("l_returnflag").parquet(path)
    val pruned = spark.read.parquet(path).filter(col("l_returnflag") === "A")
      .select("l_orderkey", "l_quantity")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      plan.linesIterator.take(8).mkString("\n"))
    val expected = Tables.lineitem(spark, sf).filter(col("l_returnflag") === "A").count()
    assert(pruned.count() == expected)
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    val path = "/root/repo/target/partitioned/lineitem_by_flag"
    if (!new java.io.File(path).exists())
      Tables.lineitem(spark, sf).write.mode("overwrite")
        .partitionBy("l_returnflag").parquet(path)
    import spark.implicits._
    // DPP needs a selective predicate on a real (file) relation — a
    // LocalRelation folds its filter away and never triggers pruning
    val dimPath = "/root/repo/target/partitioned/flag_dim"
    Seq(("A", "accepted"), ("N", "new"), ("R", "returned"))
      .toDF("flag", "label").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = spark.read.parquet(path)
      .join(dim.filter(col("label") === "returned"),
        col("l_returnflag") === col("flag"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      plan.linesIterator.take(12).mkString("\n"))
  }

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // pathological skew: 90% of rows share one key
    val large = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i)).toDF("k", "v")
    val small = Seq((7L, "hot"), (20L, "cold"), (30L, "cold")).toDF("k", "name")
    val salted = Salting.saltedEquiJoin(large, small, "k", factor = 8)
    val plain = large.join(small, "k")
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("v")).head.getLong(0) == plain.agg(sum("v")).head.getLong(0))
  }
}
