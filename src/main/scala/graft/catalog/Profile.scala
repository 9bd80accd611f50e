package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A column's catalog entry — mirrors the reference's `ColumnAnalysis`
  * shape (`automated-data-catalog-&-etl/types.ts:2-9`), produced
  * deterministically instead of by an LLM (SURVEY.md §2.2 P2-P5, §7). */
case class ColumnProfile(
    columnName: String,
    originalType: String,
    inferredSqlType: String,
    semanticType: String,
    description: String,
    qualityIssues: Seq[String],
    rowCount: Long,
    nullCount: Long,
    distinctCount: Long)

/** The profiling seam (SURVEY.md §7 design stance): the deterministic
  * [[Profile]] implementation is the library's contract, but the
  * reference's original profiler is an LLM (geminiService.ts:50-99) —
  * an LLM-backed implementation slots in here without touching any
  * caller (DDL synthesis, quality checks, and the q_profile_* keys all
  * consume [[ColumnProfile]] rows, not the producer).
  */
trait Profiler {
  /** @param sampleRows profile only the first N rows (the reference
    *   caps its LLM sample at 50, constants.ts:5); None = full data */
  def profile(df: DataFrame, sampleRows: Option[Int] = None): Seq[ColumnProfile]
}

/** Deterministic data profiler (SURVEY.md §2.2). The reference sends a
  * 50-row sample to Gemini to infer per-column SQL type, semantic type,
  * description, and quality issues (geminiService.ts:50-99); here the
  * same outputs come from Spark aggregations over the full data (or a
  * `limit(sampleRows)` sample mirroring constants.ts:5).
  *
  * Scale design: the whole profile is ONE wide-to-long reshape
  * (`stack`) followed by ONE hash aggregation keyed by column name —
  * a single shuffle whose key cardinality equals the column count.
  * Type detection is regex-based (identical semantics in any engine,
  * which also makes it DuckDB-oracle-checkable) rather than cast-based
  * (engines disagree on string→int truncation).
  */
object Profile extends Profiler {

  override def profile(df: DataFrame, sampleRows: Option[Int] = None): Seq[ColumnProfile] =
    of(df, sampleRows)

  // Type-detection regexes — the deterministic replacement for the LLM
  // type menu TEXT/INTEGER/REAL/DATE/TIMESTAMP/BOOLEAN/BLOB
  // (geminiService.ts:61).
  val IntRe = "^-?[0-9]+$"
  val NumRe = "^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"
  val BoolRe = "^(true|false|TRUE|FALSE|True|False)$"
  val DateRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
  val TsRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}[ T][0-9]{2}:[0-9]{2}:[0-9]{2}.*$"

  /** Wide → long: one (column_name, value_as_string) row per cell.
    * Binary columns are excluded (they map straight to BLOB). */
  def melt(df: DataFrame, cols: Seq[String]): DataFrame = {
    // Column-API melt, NOT a string-built stack(): uploaded headers are
    // arbitrary text, and a name like "item's price" (or one carrying a
    // backtick) breaks — or injects into — interpolated SQL. Batched in
    // codegen-safe groups like Relations.melt so a wide table's explode
    // stays inside whole-stage codegen (spark.sql.codegen.maxFields).
    val quoted = (c: String) => col("`" + c.replace("`", "``") + "`")
    cols.grouped(48).toSeq.map { group =>
      df.select(explode(array(group.map(c =>
          struct(lit(c).as("col"), quoted(c).cast("string").as("v"))): _*))
          .as("kv"))
        .select(col("kv.col").as("col"), col("kv.v").as("v"))
    }.reduce(_ unionByName _)
  }

  /** Distributed per-column tallies: the profile's numeric core as a
    * DataFrame (one row per column), exposed for the q_profile_* keys. */
  def typeTallies(df: DataFrame, cols: Seq[String]): DataFrame = {
    def tally(re: String): Column =
      sum(when(col("v").rlike(re), 1).otherwise(0)).cast("bigint")
    melt(df, cols)
      .groupBy("col")
      .agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - count(col("v"))).cast("bigint").as("nulls"),
        countDistinct(col("v")).as("n_distinct"),
        tally(IntRe).as("n_int"),
        tally(NumRe).as("n_num"),
        tally(BoolRe).as("n_bool"),
        tally(DateRe).as("n_date"),
        tally(TsRe).as("n_ts"))
      .withColumn("n_nonnull", (col("n") - col("nulls")).cast("bigint"))
      .withColumn("inferred", inferredTypeCol)
  }

  /** The type-menu decision (P2): all-parse wins, else TEXT — the
    * reference's "Prioritize TEXT for unknown or mixed types". */
  def inferredTypeCol: Column =
    when(col("n_nonnull") === 0, "TEXT")
      .when(col("n_bool") === col("n_nonnull"), "BOOLEAN")
      .when(col("n_int") === col("n_nonnull"), "INTEGER")
      .when(col("n_num") === col("n_nonnull"), "REAL")
      .when(col("n_date") === col("n_nonnull"), "DATE")
      .when(col("n_ts") === col("n_nonnull"), "TIMESTAMP")
      .otherwise("TEXT")

  /** Semantic-type classification (P3) — rule engine over column name +
    * cardinality stats, with the reference's suggested vocabulary
    * (geminiService.ts:62). */
  def semanticType(name: String, inferred: String, distinct: Long, nonNull: Long): String = {
    val n = name.toLowerCase
    val unique = nonNull > 0 && distinct == nonNull
    if (n.contains("email")) "Email Address"
    else if (n == "id" || n.endsWith("_id") || n.endsWith("key")) {
      if (unique) "Unique Identifier" else "Category"
    } else if (n.contains("name")) "Person Name"
    else if (n.contains("url") || n.contains("link")) "URL"
    else if (n.contains("date") || n.contains("time") || n == "ts" ||
      inferred == "DATE" || inferred == "TIMESTAMP") "Date/Time"
    else if (n.contains("price") || n.contains("bal") || n.contains("cost") ||
      n.contains("amount")) "Monetary Value"
    else if (n.startsWith("n_") || n.contains("count") || n.contains("qty") ||
      n.contains("quantity")) "Count"
    else if (inferred == "INTEGER" || inferred == "REAL") "Numeric Value"
    else if (nonNull > 0 && distinct <= math.max(1L, nonNull / 10)) "Category"
    else "General Text"
  }

  /** Quality issues (P5) — the reference's checklist (geminiService.ts:64):
    * nulls, mixed types, high cardinality. Outlier detection is numeric
    * and handled by [[Quality.outlierBounds]]. */
  def qualityIssues(nulls: Long, nonNull: Long, distinct: Long,
      nInt: Long, nNum: Long, nBool: Long, inferred: String,
      nDate: Long = 0L, nTs: Long = 0L): Seq[String] = {
    val issues = Seq.newBuilder[String]
    if (nulls > 0) issues += "Contains null values"
    // date/timestamp tallies count toward "partially typed": a column
    // half of whose values parse as dates and half as free text is
    // exactly the mixed-type case this check reports
    val anyTyped = nInt.max(nNum).max(nBool).max(nDate).max(nTs)
    if (inferred == "TEXT" && anyTyped > 0 && anyTyped < nonNull)
      issues += "Mixed data types observed"
    if (nonNull > 100 && distinct == nonNull)
      issues += "High cardinality"
    issues.result()
  }

  /** Full profile (P1-P5): driver-side assembly of the tiny per-column
    * result; all heavy lifting stays distributed in [[typeTallies]].
    * `sampleRows` mirrors the reference's 50-row LLM sample cap. */
  def of(df: DataFrame, sampleRows: Option[Int] = None): Seq[ColumnProfile] = {
    val base = sampleRows.map(df.limit).getOrElse(df)
    val stringish = base.schema.fields.filterNot(_.dataType == BinaryType).map(_.name).toSeq
    val origTypes = base.schema.fields.map(f => f.name -> f.dataType).toMap
    val tallied = typeTallies(base, stringish).collect().toSeq
    // a ZERO-ROW table melts to zero tally groups — emit one all-zero
    // profile per schema column anyway (the catalog must describe an
    // empty-but-schema'd table; Ddl.fromProfile would otherwise
    // generate a zero-column CREATE TABLE)
    val missing = stringish
      .filterNot(tallied.map(_.getAs[String]("col")).toSet)
      .map { name =>
        val orig = origTypes(name)
        val inferred = orig match {
          case _: StringType => "TEXT"
          case _ => Ddl.sqlTypeOf(orig)
        }
        val sem = semanticType(name, inferred, 0L, 0L)
        ColumnProfile(
          columnName = name,
          originalType = orig.simpleString,
          inferredSqlType = inferred,
          semanticType = sem,
          description = s"$sem column `$name` ($inferred), " +
            "0 distinct over 0 non-null rows",
          qualityIssues = Seq.empty,
          rowCount = 0L, nullCount = 0L, distinctCount = 0L)
      }
    (missing ++ tallied.map { r =>
      val name = r.getAs[String]("col")
      val orig = origTypes(name)
      // a column Spark already typed keeps its native mapping; regex
      // inference only decides for string columns (CSV/JSON ingest path)
      val inferred = orig match {
        case _: StringType => r.getAs[String]("inferred")
        case _ => Ddl.sqlTypeOf(orig)
      }
      val (n, nulls, distinct) =
        (r.getAs[Long]("n"), r.getAs[Long]("nulls"), r.getAs[Long]("n_distinct"))
      val sem = semanticType(name, inferred, distinct, n - nulls)
      ColumnProfile(
        columnName = name,
        originalType = orig.simpleString,
        inferredSqlType = inferred,
        semanticType = sem,
        description = s"$sem column `$name` ($inferred), " +
          s"$distinct distinct over ${n - nulls} non-null rows",
        qualityIssues = qualityIssues(nulls, n - nulls, distinct,
          r.getAs[Long]("n_int"), r.getAs[Long]("n_num"), r.getAs[Long]("n_bool"), inferred,
          r.getAs[Long]("n_date"), r.getAs[Long]("n_ts")),
        rowCount = n, nullCount = nulls, distinctCount = distinct)
    }).sortBy(_.columnName)
  }
}

/** DDL synthesis (P6): `CREATE TABLE` from a profile — the deterministic
  * replacement for geminiService.ts:101-147, with the same constraints:
  * quoted table name, the reference's 7-type menu, no keys/constraints
  * except a PRIMARY KEY comment-hint for 'Unique Identifier' columns. */
object Ddl {

  def sqlTypeOf(dt: DataType): String = dt match {
    case _: StringType => "TEXT"
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => "INTEGER"
    case _: FloatType | _: DoubleType | _: DecimalType => "REAL"
    case _: DateType => "DATE"
    case _: TimestampType | _: TimestampNTZType => "TIMESTAMP"
    case _: BooleanType => "BOOLEAN"
    case _: BinaryType => "BLOB"
    case ArrayType(e, _) => s"${sqlTypeOf(e)}[]"
    case _ => "TEXT" // reference fallback: prioritize TEXT
  }

  def fromProfile(tableName: String, profile: Seq[ColumnProfile]): String = {
    val cols = profile.map { p =>
      val pk = if (p.semanticType == "Unique Identifier") " /* PRIMARY KEY */" else ""
      s"""  "${p.columnName}" ${p.inferredSqlType}$pk"""
    }
    s"""CREATE TABLE "$tableName" (\n${cols.mkString(",\n")}\n);"""
  }

  def fromSchema(tableName: String, schema: StructType): String = {
    val cols = schema.fields.map(f => s"""  "${f.name}" ${sqlTypeOf(f.dataType)}""")
    s"""CREATE TABLE "$tableName" (\n${cols.mkString(",\n")}\n);"""
  }
}
