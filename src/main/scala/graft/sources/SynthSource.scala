package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 synthetic-corpus source — the full connector extension
  * surface on the read path (SURVEY §2.1 sources; the custom-source
  * counterpart of the custom Expression/Aggregate work):
  *
  *  - `TableProvider` → `Table` → `ScanBuilder` → `Batch` lifecycle;
  *  - `SupportsPushDownRequiredColumns`: only requested fields are
  *    generated (a projection reaching the source, like parquet
  *    ReadSchema);
  *  - `SupportsPushDownFilters`: doc_id range/equality predicates narrow
  *    the generated id range BEFORE any row exists — the source-side
  *    equivalent of partition pruning;
  *  - deterministic parallelism: N `InputPartition`s each own an id
  *    range, rows are a pure function of doc_id (no RNG state), so the
  *    output is identical at any parallelism.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.SynthSource")
  *   .option("rows", "10000").option("partitions", "8").load()
  * }}}
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(4))
  override def supportsExternalMetadata(): Boolean = false
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))

  private val vocab: Array[String] = Array(
    "the", "data", "pipeline", "spark", "engine", "query", "scale",
    "shuffle", "join", "filter", "column", "stream", "batch", "index",
    "vector", "token", "model", "train", "corpus", "sample")
  private val langs = Array("en", "es", "de")

  /** splitmix64 — stateless per-id mixing, so any partition can generate
    * any id without sequence coupling. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def tokensOf(docId: Long): Int = 5 + (mix(docId) & 0x1f).toInt // 5..36
  def langOf(docId: Long): String = langs((mix(docId * 31 + 7) % 3).abs.toInt)
  def textOf(docId: Long): String = {
    val n = tokensOf(docId)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(vocab((mix(docId * 131 + i) % vocab.length).abs.toInt))
      i += 1
    }
    sb.toString
  }
}

class SynthTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"synth($rows)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions)
}

class SynthScanBuilder(rows: Long, partitions: Int)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
  with SupportsPushDownLimit with SupportsPushDownTopN {

  private var lo = 0L
  private var hi = rows - 1
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SynthSource.schema
  private var aggPushed: Option[
    org.apache.spark.sql.connector.expressions.aggregate.Aggregation] = None

  // doc_id range predicates narrow [lo, hi] before generation; anything
  // else stays a post-scan filter (returned as unhandled)
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, rest) = filters.partition {
      case EqualTo("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    handled.foreach {
      case EqualTo(_, v) =>
        val x = v.asInstanceOf[Number].longValue(); lo = math.max(lo, x); hi = math.min(hi, x)
      case GreaterThan(_, v) => lo = math.max(lo, v.asInstanceOf[Number].longValue() + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, v.asInstanceOf[Number].longValue())
      case LessThan(_, v) => hi = math.min(hi, v.asInstanceOf[Number].longValue() - 1)
      case LessThanOrEqual(_, v) => hi = math.min(hi, v.asInstanceOf[Number].longValue())
      case _ =>
    }
    pushed = handled
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- aggregate pushdown: COUNT(*)/MIN(doc_id)/MAX(doc_id) over an id
  // range are METADATA — answerable from [lo, hi] without generating a
  // single row (filters push before aggregates, so the range is already
  // narrowed). Group-bys and other aggregates fall back to a real scan.
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
  import org.apache.spark.sql.connector.expressions.NamedReference

  private def refName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames()(0))
      case _ => None
    }

  private def canAnswer(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case c: Count => !c.isDistinct && refName(c.column).contains("doc_id")
        case m: Min => refName(m.column).contains("doc_id")
        case m: Max => refName(m.column).contains("doc_id")
        case _ => false
      }

  override def supportCompletePushDown(agg: Aggregation): Boolean = canAnswer(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    if (canAnswer(agg)) { aggPushed = Some(agg); true } else false

  // ---- limit / top-N pushdown: LIMIT n shrinks the range to its first
  // n ids, and ORDER BY doc_id LIMIT n range-prunes to the first (asc)
  // or last (desc) n ids — pure range arithmetic, so the source
  // GENERATES at most n rows. Declared partially pushed: Spark keeps
  // its final limit/sort pass (partitions emit ascending ranges, so a
  // fully-pushed DESC top-N would otherwise trust an order the batch
  // scan does not guarantee across partitions); the win is pruned
  // generation, not an elided operator. Only doc_id orderings claimed.
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit - 1)
    true
  }
  override def isPartiallyPushed(): Boolean = true

  import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder}
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    val byDocId = orders.length == 1 &&
      refName(orders(0).expression()).contains("doc_id")
    if (!byDocId) return false
    if (orders(0).direction() == SortDirection.ASCENDING)
      hi = math.min(hi, lo + limit - 1)
    else lo = math.max(lo, hi - limit + 1)
    true
  }

  override def build(): Scan = aggPushed match {
    case Some(agg) => new SynthAggScan(lo, hi, agg, pushed)
    case None => new SynthScan(lo, hi, partitions, required, pushed)
  }
}

/** Completely-pushed-down aggregate scan: one row computed from the id
  * range bounds — COUNT = range size, MIN/MAX(doc_id) = the bounds
  * themselves (null on an empty range) — zero rows generated. */
class SynthAggScan(lo: Long, hi: Long,
    agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation,
    pushed: Array[Filter]) extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}

  private val n = math.max(0L, hi - lo + 1)

  override def readSchema(): StructType = StructType(
    agg.aggregateExpressions.toSeq.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_: Count, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
    })

  override def description(): String =
    s"SynthAggScan range=[$lo,$hi] " +
      s"PushedAggregates=[${agg.aggregateExpressions.mkString(", ")}] " +
      s"PushedFilters=[${pushed.mkString(", ")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthRange(0, 0)) // one logical row regardless of range

  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Seq[Any] = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => n
      case _: Count => n // doc_id is never null in this source
      case _: Min => if (n == 0) null else lo
      case _: Max => if (n == 0) null else hi
      case other => throw new IllegalStateException(s"unplanned aggregate $other")
    }
    new SynthAggReaderFactory(values)
  }
}

class SynthAggReaderFactory(values: Seq[Any]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(values)
      override def close(): Unit = ()
    }
}

case class SynthRange(lo: Long, hi: Long) extends InputPartition

class SynthScan(lo: Long, hi: Long, partitions: Int, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"SynthScan range=[$lo,$hi] cols=${required.fieldNames.mkString(",")} " +
      s"PushedFilters=[${pushed.mkString(", ")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo + 1)
    if (n == 0) return Array.empty
    val per = math.max(1L, math.ceil(n.toDouble / partitions).toLong)
    (lo to hi by per).map(s => SynthRange(s, math.min(hi, s + per - 1))).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

class SynthReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SynthRange(lo, hi) = partition.asInstanceOf[SynthRange]
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var id = lo - 1
      override def next(): Boolean = { id += 1; id <= hi }
      override def get(): InternalRow = {
        val values: Seq[Any] = fields.toSeq.map {
          case "doc_id" => id
          case "text" => UTF8String.fromString(SynthSource.textOf(id))
          case "lang" => UTF8String.fromString(SynthSource.langOf(id))
          case "n_tokens" => SynthSource.tokensOf(id).toLong
        }
        InternalRow.fromSeq(values)
      }
      override def close(): Unit = ()
    }
  }
}
