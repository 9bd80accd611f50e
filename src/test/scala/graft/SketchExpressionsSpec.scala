package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** kmv_containment must be bit-identical to the array-algebra KMV
  * formulation it replaced (slice(array_sort(array_distinct(concat)))
  * + intersect counting) — checked over seeded random sorted distinct
  * sketches, including unsaturated (|A∪B| < k), disjoint, and empty
  * cases. The heavy sweep runs driver-side against a reference
  * implementation (one Spark job per case would dominate the suite);
  * one Spark case pins the registered-function path and null safety. */
class SketchExpressionsSpec extends AnyFunSuite {
  import SparkTestSession._

  /** The replaced formulation, literally: unified bottom-k of the
    * distinct union, then membership counts. */
  private def reference(a: Seq[Long], b: Seq[Long], k: Int): (Int, Int) = {
    val unified = (a ++ b).distinct.sorted.take(k)
    val as = a.toSet; val bs = b.toSet
    (unified.count(as), unified.count(h => as(h) && bs(h)))
  }

  private def merged(a: Seq[Long], b: Seq[Long], k: Int): (Int, Int) = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}
    val expr = graft.functions.KmvContainmentExpr(
      Literal(new GenericArrayData(a.toArray), ArrayType(LongType)),
      Literal(new GenericArrayData(b.toArray), ArrayType(LongType)),
      Literal(k, IntegerType))
    val row = expr.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    (row.getInt(0), row.getInt(1))
  }

  test("merge scorer == array-algebra scorer over a seeded random sweep") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(25))(rnd.nextLong() % 50).distinct.sorted
      val b = Seq.fill(rnd.nextInt(25))(rnd.nextLong() % 50).distinct.sorted
      val k = 1 + rnd.nextInt(16)
      assert(merged(a, b, k) == reference(a, b, k),
        s"mismatch for a=$a b=$b k=$k")
    }
    // boundary shapes the sweep may miss
    assert(merged(Nil, Nil, 4) == (0, 0))
    assert(merged(Seq(1L, 2L), Nil, 4) == (2, 0))
    assert(merged(Seq(Long.MaxValue), Seq(Long.MaxValue), 2) == (1, 1))
  }

  test("registered function scores a DataFrame pair; null sketch → null") {
    graft.functions.SketchExpressions.register(spark)
    import spark.implicits._
    val r = Seq((Seq(1L, 3L, 5L), Seq(3L, 5L, 9L)))
      .toDF("sa", "sb")
      .select(call_function("kmv_containment",
        col("sa"), col("sb"), lit(4)).as("c"))
      .select(col("c.in_a"), col("c.in_both")).head()
    // unified bottom-4 of {1,3,5,9} = all; in A: {1,3,5}, in both: {3,5}
    assert((r.getInt(0), r.getInt(1)) == (3, 2))
    val n = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("sa", "sb")
      .select(call_function("kmv_containment",
        col("sa"), col("sb"), lit(4)).as("c")).head()
    assert(n.isNullAt(0))
  }
}
