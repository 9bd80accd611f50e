package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift tolerance — the self-healing half of ingest the
  * reference's pipeline declares (batches evolve; loads must not break):
  *
  *  - a batch MISSING a known column loads with nulls in it;
  *  - a batch ADDING a column widens the table (earlier rows read null);
  *  - a column whose type drifts numerically widens along the standard
  *    ladder (integral→wider integral→double); anything irreconcilable
  *    falls back to string rather than failing the load.
  *
  * All pure schema algebra + per-batch `select` casts — no data movement
  * beyond the union itself, so it composes with any downstream plan
  * unchanged (the casts ride the scan's codegen stage).
  */
object SchemaEvolution {

  /** Widest common type for one column across batches: equal types pass
    * through; integrals widen to the larger; any numeric pair with a
    * fractional side widens to double; everything else reconciles as
    * string (the lossless universal fallback). */
  /** byte < short < int < long (IntegralType itself is private[sql]) */
  private val integralWidth: Map[DataType, Int] =
    Map(ByteType -> 1, ShortType -> 2, IntegerType -> 4, LongType -> 8)

  private[graft] def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (x, y) if integralWidth.contains(x) && integralWidth.contains(y) =>
      if (integralWidth(x) >= integralWidth(y)) x else y
    case (_: NumericType, _: NumericType) => DoubleType
    case _ => StringType
  }

  /** Union of the batches' schemas, first-seen column order, types
    * reconciled via [[widen]]. */
  private[graft] def reconcile(schemas: Seq[StructType]): StructType = {
    val order = scala.collection.mutable.LinkedHashMap[String, DataType]()
    schemas.foreach(_.fields.foreach { f =>
      order.get(f.name) match {
        case None => order.update(f.name, f.dataType)
        case Some(t) => order.update(f.name, widen(t, f.dataType))
      }
    })
    StructType(order.map { case (n, t) => StructField(n, t, nullable = true) }.toSeq)
  }

  /** Project one batch onto the target schema: cast present columns,
    * null-fill absent ones, in target column order. */
  def align(df: DataFrame, target: StructType): DataFrame = {
    val present = df.schema.fieldNames.toSet
    df.select(target.fields.toSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Load a sequence of drifted batches as one frame under the
    * reconciled schema — the evolve-on-read equivalent of DuckDB's
    * `UNION ALL BY NAME` (which is exactly how the oracle checks it). */
  def unionEvolved(batches: Seq[DataFrame]): DataFrame = {
    require(batches.nonEmpty, "unionEvolved needs at least one batch")
    val target = reconcile(batches.map(_.schema))
    batches.map(align(_, target)).reduce(_ unionByName _)
  }
}
