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

/** Bottom-k DISTINCT values as a native Catalyst aggregate — the
  * bounded-state primitive behind KMV (k-minimum-values) sketches:
  * `bottom_k_distinct(xxhash64(v), k)` per group yields the column's KMV
  * sketch in ONE aggregation pass.
  *
  * Why not `distinct` + a rank-filter window: that is two data-sized
  * exchanges (dedup shuffle, then the window's repartition) where this
  * aggregate needs ONE whose volume is k-bounded per (group × map
  * partition) — the partial (map-side) buffer keeps at most k values,
  * exactly like [[TopKPairsAgg]]'s heap.
  *
  * State per buffer: a k-bounded max-heap (head = largest retained, so a
  * smaller candidate replaces it in O(log k)) plus a membership set for
  * O(1) dedup. Nulls are ignored. Result: `array<bigint>` sorted
  * ascending — the k smallest distinct inputs.
  */
case class BottomKDistinctAgg(
    valueExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer]
  with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bottom_k_distinct: k must be a literal (foldable) expression")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val k: Int = {
    val v = kExpr.eval(InternalRow.empty)
    require(v != null, "bottom_k_distinct: k must be a non-null literal")
    val kk = v.asInstanceOf[Number].intValue()
    // k <= 0 would otherwise surface as an obscure executor-side
    // NoSuchElementException on the empty heap's head inside offer()
    require(kk > 0, s"bottom_k_distinct: k must be positive, got $kk")
    kk
  }

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer()

  private def offer(buf: BottomKBuffer, v: Long): Unit = {
    if (!buf.set.contains(v)) {
      if (buf.set.size < k) { buf.heap.enqueue(v); buf.set.add(v) }
      else if (v < buf.heap.head) {
        buf.set.remove(buf.heap.dequeue()); buf.heap.enqueue(v); buf.set.add(v)
      }
    }
  }

  override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val v = valueExpr.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    other.heap.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: BottomKBuffer): Any =
    new GenericArrayData(buf.heap.toArray.sorted)

  override def serialize(buf: BottomKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    buf.heap.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { val v = in.readLong(); buf.heap.enqueue(v); buf.set.add(v); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(valueExpr, kExpr)
  override def prettyName: String = "bottom_k_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), kExpr = newChildren(1))
}

/** k-bounded distinct max-heap: head of `heap` is the largest retained
  * value; `set` mirrors the heap for O(1) membership checks. */
final class BottomKBuffer {
  val heap: mutable.PriorityQueue[Long] = mutable.PriorityQueue.empty[Long]
  val set: mutable.HashSet[Long] = mutable.HashSet.empty[Long]
}

object BottomKAggregate {

  /** Register `bottom_k_distinct(value, k)` when the session was built
    * without GraftExtensions. No-op when already resolvable. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("bottom_k_distinct")))
      reg.createOrReplaceTempFunction(
        "bottom_k_distinct",
        exprs => BottomKDistinctAgg(exprs(0), exprs(1)),
        "built-in")
  }
}
