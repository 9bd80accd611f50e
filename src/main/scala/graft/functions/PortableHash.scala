package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Engine-portable deterministic hash for selection operators
  * (sampling, splits, mixture weighting): a 31-bit multiply-xorshift
  * mixer whose every intermediate stays below 2^63, so the arithmetic
  * is exact signed-64 in Spark AND any ANSI SQL engine with plain
  * BIGINT math — a DuckDB oracle recomputes the identical value from
  * the mirrored SQL expression chain.
  *
  * Domain: the FULL non-negative int64 key space. The mixer state must
  * stay < ~3.4e9 (2^63 / 2654435761) for the multiply to be exact, so
  * a raw key cannot feed the mixer directly once ids pass 2^31 (at the
  * 100 TB stance, > 2^31 rows is the normal case, and a silently
  * wrapped multiply would desync engines). Keys are therefore folded
  * structurally BEFORE mixing: split into three chunks that each fit
  * the state bound — low 31 bits, middle 31 bits, top bit — and
  * absorbed sponge-style, `f = mix31(chunk XOR f)` per chunk. Every
  * mix31 input is < 2^31 by construction (xor of two 31-bit values),
  * so no intermediate can overflow FOR ANY non-negative key — the old
  * "hash upstream for wider id spaces" footnote is enforced by the
  * operator itself, not by caller discipline. Negative keys remain out
  * of contract (`%` vs `pmod` sign semantics differ across engines);
  * ids are non-negative everywhere this is used.
  *
  * Spark-side the fold runs as [[PortableHashExpr]], a native codegen
  * Expression (registered as `portable_hash` by GraftExtensions): the
  * equivalent built-in Column tree duplicates its input subtree at
  * every pmod/xorshift step (~16x per round, ~4000x over three
  * absorb rounds), which measured 19x slower end-to-end on q_sample —
  * the straight-line generated Java evaluates each step exactly once
  * and stays inside whole-stage codegen.
  *
  * PropertySpec pins codegen == interpreted == the exact-int64 scalar
  * model for ids beyond 2^31, and partitioning-invariance of the
  * selected subset.
  */
object PortableHash {

  /** One 31-bit multiply-xorshift round; input must be in [0, 2^31). */
  private def mix31(x: Long): Long = {
    val h1 = Math.floorMod(x * 2654435761L, 2147483648L)
    val m1 = h1 ^ (h1 >> 15)
    val h2 = Math.floorMod(m1 * 1597334677L, 2147483648L)
    h2 ^ (h2 >> 13)
  }

  /** The scalar fold+mix chain — the single source of truth the
    * Expression's eval path, its generated code, and the oracle SQL all
    * mirror term by term. */
  def hash(k: Long): Long = {
    val lo = Math.floorMod(k, 2147483648L)
    val mid = Math.floorMod(k >> 31, 2147483648L)
    val top = k >> 62
    mix31(mix31(mix31(lo) ^ mid) ^ top)
  }

  /** Idempotent session registration — the same self-install hazard
    * guard Relations.columnSketches applies for bottom_k_distinct: a
    * session built WITHOUT GraftExtensions must not fail analysis with
    * an unresolved portable_hash. No-op when the name already resolves
    * (re-registering would WARN per call). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("portable_hash")))
      reg.createOrReplaceTempFunction(
        "portable_hash", exprs => PortableHashExpr(exprs(0)), "built-in")
  }

  def column(c: Column): Column = {
    // call_function resolves lazily at analysis; install into the active
    // session here so plain SparkSession.builder sessions keep working
    // (the pre-round-9 built-in Column tree needed no registration)
    org.apache.spark.sql.SparkSession.getActiveSession.foreach(register)
    call_function("portable_hash", c)
  }

  /** The mixer folded to [0, 1000) — per-mille selection buckets. */
  def permille(c: Column): Column = pmod(column(c), lit(1000L))
}

/** `portable_hash(key)` as a native Catalyst expression: straight-line
  * generated Java (each fold/mix step computed once, assigned to a
  * local), full whole-stage-codegen, interpreted eval delegating to the
  * same scalar chain. */
case class PortableHashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // covariant override: AbstractDataType is private[sql] in Spark 4
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "portable_hash"

  override def nullSafeEval(input: Any): Any =
    PortableHash.hash(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mixName = ctx.freshName("mix31")
    val mix = ctx.addNewFunction(mixName,
      s"""private long $mixName(long x) {
         |  long h1 = java.lang.Math.floorMod(x * 2654435761L, 2147483648L);
         |  long m1 = h1 ^ (h1 >> 15);
         |  long h2 = java.lang.Math.floorMod(m1 * 1597334677L, 2147483648L);
         |  return h2 ^ (h2 >> 13);
         |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, c => {
      val lo = ctx.freshName("lo")
      val mid = ctx.freshName("mid")
      val top = ctx.freshName("top")
      s"""
         |long $lo = java.lang.Math.floorMod($c, 2147483648L);
         |long $mid = java.lang.Math.floorMod($c >> 31, 2147483648L);
         |long $top = $c >> 62;
         |${ev.value} = $mix($mix($mix($lo) ^ $mid) ^ $top);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PortableHashExpr =
    copy(child = newChild)
}
