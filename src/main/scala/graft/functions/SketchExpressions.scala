package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** KMV pair comparison fused into one merge pass (round-11 verdict item
  * #8). The sketch scorer's per-pair algebra —
  * `slice(array_sort(array_distinct(concat(a, b))), 1, k)` then three
  * `array_intersect`s — walks and reallocates the two k-element arrays
  * ~6 times per candidate pair; at a 128-column catalog the W² pair
  * compare dominated the whole sketch run (probe: 17.9 s of 20.3 s at
  * width 128, while the k-bounded aggregation itself stayed per-column
  * flat). Both sketches arrive SORTED ASCENDING and DISTINCT (the
  * [[BottomKDistinctAgg]] eval contract), so the unified-bottom-k
  * membership counts are one two-pointer merge: O(k) with zero
  * allocation, bit-identical to the array-algebra formulation (the
  * merge enumerates exactly the k smallest distinct union elements and
  * counts which sides they appear on).
  *
  * Interpreted eval (CodegenFallback) is deliberate: the pair compare
  * is CATALOG-sized (W² candidate pairs), never data-sized — codegen
  * compilation would cost more than it saves.
  */
case class KmvContainmentExpr(first: Expression, second: Expression,
    third: Expression)
  extends TernaryExpression with CodegenFallback with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), IntegerType)

  override def dataType: DataType = StructType(Seq(
    StructField("in_a", IntegerType, nullable = false),
    StructField("in_both", IntegerType, nullable = false)))

  override def prettyName: String = "kmv_containment"

  override protected def nullSafeEval(av: Any, bv: Any, kv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val k = kv.asInstanceOf[Int]
    val an = a.numElements()
    val bn = b.numElements()
    var i = 0; var j = 0; var taken = 0; var inA = 0; var inBoth = 0
    while (taken < k && (i < an || j < bn)) {
      if (i < an && j < bn) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { inA += 1; inBoth += 1; i += 1; j += 1 }
        else if (x < y) { inA += 1; i += 1 }
        else j += 1
      } else if (i < an) { inA += 1; i += 1 }
      else j += 1
      taken += 1
    }
    val row = new GenericInternalRow(2)
    row.setInt(0, inA)
    row.setInt(1, inBoth)
    row
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SketchExpressions {

  /** Register `kmv_containment(a, b, k)` when the session was built
    * without GraftExtensions. No-op when already resolvable. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("kmv_containment")))
      reg.createOrReplaceTempFunction(
        "kmv_containment",
        exprs => KmvContainmentExpr(exprs(0), exprs(1), exprs(2)),
        "built-in")
  }
}
