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
    * reconciled via [[widen]]. Column names match CASE-INSENSITIVELY
    * (Spark's default resolution, and DuckDB's `UNION ALL BY NAME` —
    * the oracle this mirrors): header-case drift across batches ("id"
    * then "ID", classic re-export drift) is the SAME logical column
    * under the first-seen spelling, not a duplicate pair that breaks
    * the union. */
  private[graft] def reconcile(schemas: Seq[StructType]): StructType = {
    // keyed by folded name; value = (first-seen spelling, widened type)
    val order = scala.collection.mutable.LinkedHashMap[String, (String, DataType)]()
    schemas.foreach(_.fields.foreach { f =>
      val key = f.name.toLowerCase
      order.get(key) match {
        case None => order.update(key, (f.name, f.dataType))
        case Some((n0, t)) => order.update(key, (n0, widen(t, f.dataType)))
      }
    })
    StructType(order.values.map { case (n, t) =>
      StructField(n, t, nullable = true) }.toSeq)
  }

  /** Project one batch onto the target schema: cast present columns
    * (matched case-insensitively, like [[reconcile]]), null-fill absent
    * ones, in target column order under the target's spelling. */
  def align(df: DataFrame, target: StructType): DataFrame = {
    val present = df.schema.fieldNames.map(n => n.toLowerCase -> n).toMap
    df.select(target.fields.toSeq.map { f =>
      present.get(f.name.toLowerCase) match {
        case Some(actual) => col(actual).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
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
