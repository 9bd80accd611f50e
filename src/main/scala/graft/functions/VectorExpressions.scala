package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path (SURVEY.md §4
  * "optional custom Catalyst work").
  *
  * The higher-order-function formulation (VectorOps.cosine:
  * `aggregate(zip_with(...))`) materializes an intermediate 64-element
  * array per evaluated pair and runs the lambda interpreter — measured
  * ~17 µs/pair on the sf0.1 all-pairs join. These expressions compute
  * dot/norms in one fused loop over the raw `ArrayData` with full
  * whole-stage-codegen support: no allocation, no virtual calls in the
  * inner loop. Numerically identical (same left-to-right double
  * accumulation), so DuckDB oracles and the HOF twin agree bit-for-bit
  * after round(.,4).
  */
abstract class FusedFloatVecExpr extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = getClass.getSimpleName.stripSuffix("$").toLowerCase
  // These are registered session-wide (vec_cosine/vec_dot), so an
  // array<double>/array<int> argument must fail at analysis time like a
  // built-in would — the eval path reads raw float slots and would
  // otherwise return silently wrong values. (Covariant override:
  // AbstractDataType itself is private[sql] in Spark 4.)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
}

/** cosine(a, b) over two array<float> columns in one pass; 0.0 for zero
  * vectors; length = min(|a|, |b|). */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends FusedFloatVecExpr {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi"); val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(a, b) over two array<float> columns. */
case class DotProductExpr(left: Expression, right: Expression)
    extends FusedFloatVecExpr {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {

  /** Expose the expressions through the session's function registry (the
    * public extension point; Column-from-Expression constructors are
    * private[sql] in Spark 4). Idempotent AND quiet: a GraftSession
    * already has these injected via GraftExtensions, and re-registering
    * per query call emits a "replaced a previously registered function"
    * WARN per invocation — so this is a no-op when the name resolves. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("vec_cosine")))
      reg.createOrReplaceTempFunction(
        "vec_cosine", exprs => CosineSimilarityExpr(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot")))
      reg.createOrReplaceTempFunction(
        "vec_dot", exprs => DotProductExpr(exprs(0), exprs(1)), "built-in")
  }

  /** Column API for the fused cosine (requires [[register]]). */
  def cosineFast(a: Column, b: Column): Column = call_function("vec_cosine", a, b)

  def dotFast(a: Column, b: Column): Column = call_function("vec_dot", a, b)
}
