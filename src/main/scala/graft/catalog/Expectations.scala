package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality contracts over catalog tables — the
  * "expectations" surface a self-healing pipeline gates loads on
  * (reference P5's quality checks, generalized from per-column profiling
  * to assertable table contracts): not-null, uniqueness, value range,
  * and cross-table referential integrity, each reported as a violation
  * count rather than a boolean so downstream policy can threshold.
  *
  * Scale shape: all of a table's non-referential rules fuse into ONE
  * aggregation pass over it (each rule is a conditional-sum / distinct
  * column in the same `agg`), so N rules cost one scan, not N.
  * Referential rules are per-rule anti-join counts keyed on the FK —
  * the same equi-join shape every FK validation needs.
  */
object Expectations {

  sealed trait Rule { def column: String; def name: String }
  /** No nulls in `column`. */
  final case class NotNull(column: String) extends Rule {
    def name = s"$column not_null"
  }
  /** `column` values are distinct (violations = duplicate row count). */
  final case class Unique(column: String) extends Rule {
    def name = s"$column unique"
  }
  /** `column` within [lo, hi] (nulls don't violate — pair with NotNull). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    def name = s"$column range[$lo,$hi]"
  }
  /** `column` values drawn from a fixed vocabulary (nulls exempt —
    * pair with NotNull). The enum-column contract. */
  final case class AcceptedValues(column: String, values: Seq[String]) extends Rule {
    def name = s"$column in(${values.mkString(",")})"
  }
  /** Every `column` value exists in `parentTable.parentColumn`. */
  final case class Referential(column: String, parentTable: String,
      parentColumn: String) extends Rule {
    def name = s"$column ref $parentTable.$parentColumn"
  }

  /** Violation counts for every rule, one row per rule:
    * (expectation, violations, status). Fuses each table's scan rules
    * into a single aggregation pass; referential rules anti-join their
    * parent. */
  def check(tables: Seq[(String, DataFrame, Seq[Rule])]): DataFrame = {
    val byName = tables.map { case (n, df, _) => n -> df }.toMap
    val perTable = tables.flatMap { case (tname, df, rules) =>
      val scanRules = rules.filter(!_.isInstanceOf[Referential])
      val scan = if (scanRules.isEmpty) None else {
        val aggs: Seq[Column] = scanRules.zipWithIndex.map { case (rule, i) =>
          // coalesce to 0: sum() over an EMPTY table is NULL, and the
          // status expression would read NULL violations as "fail" —
          // an empty batch violates nothing
          coalesce(rule match {
            case NotNull(c) =>
              sum(when(col(c).isNull, 1).otherwise(0)).cast("bigint")
            case Unique(c) =>
              (count(col(c)) - countDistinct(col(c))).cast("bigint")
            case InRange(c, lo, hi) =>
              sum(when(col(c) < lo || col(c) > hi, 1).otherwise(0)).cast("bigint")
            case AcceptedValues(c, vs) =>
              sum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1).otherwise(0))
                .cast("bigint")
            case r => throw new IllegalStateException(r.toString)
          }, lit(0L)).as(s"c$i")
        }
        // one row of counts → one (expectation, violations) row per rule
        Some(df.agg(aggs.head, aggs.tail: _*).select(explode(array(
          scanRules.zipWithIndex.map { case (r, i) =>
            struct(lit(s"$tname.${r.name}").as("expectation"),
              col(s"c$i").as("violations"))
          }: _*)).as("e")).select(col("e.expectation"), col("e.violations")))
      }
      val refs = rules.collect { case r @ Referential(c, pt, pc) =>
        val parent = byName.getOrElse(pt,
          throw new IllegalArgumentException(s"unknown parent table $pt"))
        // alias the parent key: with the common FK naming (customer_id
        // referencing customer_id) an unaliased col(c) === col(pc) is
        // the same attribute on both join sides — ambiguous or
        // trivially true, either way wrong
        byName(tname).where(col(c).isNotNull)
          .join(parent.select(col(pc).as("__parent_key")),
            col(c) === col("__parent_key"), "left_anti")
          .agg(count(lit(1)).cast("bigint").as("violations"))
          .select(lit(s"$tname.${r.name}").as("expectation"), col("violations"))
      }
      scan.toSeq ++ refs
    }
    if (perTable.isEmpty) {
      // an empty contract trivially passes — return the report schema
      // with zero rows rather than throwing empty.reduce from deep
      // inside (ContractGate.gatedLoad with no rules = ungated load)
      require(tables.nonEmpty,
        "Expectations.check needs at least one table to bind the session")
      val spark = tables.head._2.sparkSession
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("expectation", StringType),
          StructField("violations", LongType),
          StructField("status", StringType))))
    }
    perTable.reduce(_ unionByName _)
      .select(col("expectation"), col("violations"),
        when(col("violations") === 0, "pass").otherwise("fail").as("status"))
      .orderBy("expectation")
  }
}
