package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap per-group top-k as a native Catalyst aggregate
  * (SURVEY.md §2.3 "Per-group top-k").
  *
  * Keeps a k-bounded min-heap per group inside the partial (map-side)
  * aggregate, so the shuffle carries at most k rows per (group × map
  * partition) and the final merge is O(k log k) per group. Same
  * preference-order slot as Spark's internal `CollectTopK` (used by the
  * pandas API's nlargest), which is not exposed to SQL/DataFrame users.
  *
  * Honest comparison with the window formulation (`row_number() OVER
  * (...) <= k`, q_topk_pergroup): since Spark 3.5 Catalyst rewrites that
  * rank filter into a map-side `WindowGroupLimit` (pinned in PlanSpec),
  * so BOTH plans bound the exchange — SCALING.md measures near-identical
  * shuffle volumes. What this aggregate still buys:
  *  - no sort anywhere (the group-limit path partially sorts each map
  *    partition; the heap is O(n log k) with k-sized state);
  *  - composability: it is a real aggregate, so one `groupBy.agg` pass
  *    can compute top-k ALONGSIDE count/sum/avg — the window form needs
  *    a second shuffle and a join to combine with aggregates;
  *  - reachable from SQL via the session extension (`top_k_pairs`).
  *
  * Semantics: top `k` (value, id) pairs ordered by (value DESC, id ASC)
  * — the id tie-break keeps results deterministic and hash-comparable
  * across engines and partitionings. Null value or id rows are ignored.
  *
  * Returns `array<struct<v: double, id: bigint>>` sorted in rank order;
  * `posexplode` it to get ranked rows.
  */
case class TopKPairsAgg(
    valueExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with ImplicitCastInputTypes {

  // analysis-time contract: int/decimal values and int ids implicitly
  // cast to (double, bigint, int); anything non-coercible fails analysis
  // instead of ClassCastException-ing at executor time. (Declared as
  // Seq[DataType] — covariant with the inherited Seq[AbstractDataType],
  // which itself is private[sql] in Spark 4.)
  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, LongType, IntegerType)

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "top_k_pairs: k must be a literal (foldable) expression")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val k: Int = {
    val v = kExpr.eval(InternalRow.empty)
    require(v != null, "top_k_pairs: k must be a non-null literal")
    val kk = v.asInstanceOf[Number].intValue()
    // k <= 0 would otherwise surface as an obscure executor-side
    // NoSuchElementException on the empty heap's head inside offer()
    require(kk > 0, s"top_k_pairs: k must be positive, got $kk")
    kk
  }

  // the queue's head is the WORST retained pair (smallest v, then largest
  // id), so a better candidate replaces it in O(log k)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by(p => (-p._1, p._2))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)], v: Double, id: Long): Unit = {
    if (buf.size < k) buf.enqueue((v, id))
    else {
      val (wv, wid) = buf.head
      if (v > wv || (v == wv && id < wid)) { buf.dequeue(); buf.enqueue((v, id)) }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    // NaN is skipped like null: under IEEE semantics a NaN in a FULL
    // buffer freezes it (v > NaN and v == NaN are both false, so no
    // candidate could ever displace anything again) — and "largest
    // value" is meaningless for NaN anyway
    if (v != null && id != null && !v.asInstanceOf[Double].isNaN)
      offer(buf, v.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (v, id) => offer(buf, v, id) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val ranked = buf.toArray.sortBy(p => (-p._1, p._2))
    new GenericArrayData(ranked.map { case (v, id) => InternalRow(v, id) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, id) => out.writeDouble(v); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(valueExpr, idExpr, kExpr)
  override def prettyName: String = "top_k_pairs"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}

object TopKAggregate {

  /** Register `top_k_pairs(value, id, k)` in the session's function
    * registry (same public path as VectorExpressions.register). No-op
    * when already resolvable (GraftSession injects it via
    * GraftExtensions) — re-registering WARNs per call. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("top_k_pairs")))
      reg.createOrReplaceTempFunction(
        "top_k_pairs",
        exprs => TopKPairsAgg(exprs(0), exprs(1), exprs(2)),
        "built-in")
  }
}
