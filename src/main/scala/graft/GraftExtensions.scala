package graft

import graft.functions.{BottomKDistinctAgg, CosineSimilarityExpr, DotProductExpr, PortableHashExpr, TopKPairsAgg, WordSetJaccardExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension installing the engine's native expressions as
  * first-class SQL functions — `SELECT vec_cosine(a, b)` works in any
  * query (spark.sql, views, the S8 passthrough) with no per-session
  * registration call. Activated two ways:
  *
  *  - `GraftSession.builder(...)` wires it via `.withExtensions`;
  *  - `--conf spark.sql.extensions=graft.GraftExtensions` for sessions
  *    built elsewhere (spark-submit / thrift server).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "vec_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarityExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("word_jaccard"),
      new ExpressionInfo(classOf[WordSetJaccardExpr].getName, "word_jaccard"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordSetJaccardExpr(exprs(0), exprs(1))))
    // the analyzer wraps a bare AggregateFunction in AggregateExpression
    e.injectFunction((
      FunctionIdentifier("top_k_pairs"),
      new ExpressionInfo(classOf[TopKPairsAgg].getName, "top_k_pairs"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopKPairsAgg(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("portable_hash"),
      new ExpressionInfo(classOf[PortableHashExpr].getName, "portable_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PortableHashExpr(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("kmv_containment"),
      new ExpressionInfo(classOf[graft.functions.KmvContainmentExpr].getName,
        "kmv_containment"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.KmvContainmentExpr(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("bottom_k_distinct"),
      new ExpressionInfo(classOf[BottomKDistinctAgg].getName, "bottom_k_distinct"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BottomKDistinctAgg(exprs(0), exprs(1))))
  }
}
