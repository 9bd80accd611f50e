package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingestion module (SURVEY.md §2.1 S1-S4, §7 step 1): the rebuild of the
  * reference's browser-side file parsing
  * (`automated-data-catalog-&-etl/services/dataProcessingService.ts:5-31`)
  * as Spark sources.
  *
  * Parity rules (SURVEY §1.2-1.3):
  *  - CSV: header row, dynamic typing via inferSchema, empty lines
  *    skipped, parse errors tolerated (PERMISSIVE) with the corrupt line
  *    captured instead of dropped (dataProcessingService.ts:14-17 logs
  *    errors but still returns data).
  *  - Mixed-type columns fall back to StringType (per-cell typing can't
  *    exist in a columnar engine; the reference's own guidance is
  *    "Prioritize TEXT for mixed types", geminiService.ts:61) and are
  *    *reported* by the profiler as a quality issue, not an error.
  *  - JSON: array-of-objects or a single object as one row
  *    (dataProcessingService.ts:23); rows with missing/extra keys use
  *    the union of keys (deliberate fix of the reference's
  *    first-row-schema hazard, pgliteService.ts:59 — SURVEY §1.3).
  *  - Unknown extensions rejected (dataProcessingService.ts:28-30).
  */
object Ingest {

  val CorruptRecordCol = "_corrupt_record"

  /** Format dispatch by file extension (S3). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val lower = path.toLowerCase
    if (lower.endsWith(".csv")) csv(spark, path)
    else if (lower.endsWith(".json")) json(spark, path)
    // columnar staging formats dispatch too (S9's tier): self-describing,
    // no inference or corrupt-record handling needed
    else if (lower.endsWith(".parquet")) spark.read.parquet(path)
    else if (lower.endsWith(".orc")) spark.read.orc(path)
    else throw new IllegalArgumentException(
      s"Unsupported file type: $path. " +
        "Please upload a CSV, JSON, Parquet, or ORC file.")
  }

  /** CSV source (S1, S4): header + per-column dynamic typing; ragged
    * rows tolerate under PERMISSIVE (missing fields null-fill, extras
    * drop). CAVEAT: with an INFERRED schema Spark only keeps fully
    * corrupt records when the schema contains [[CorruptRecordCol]] —
    * which inference never adds — so an unparseable LINE (e.g. an
    * unclosed quote) is dropped here; callers needing capture-not-drop
    * use [[graft.pipeline.Quarantine.csv]], which re-reads with the
    * widened corrupt-record schema for exactly this reason. */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptRecordCol)
      .csv(path)

  /** JSON source (S2): array-of-objects or single object (one row);
    * Spark's JSON reader already takes the union of keys across rows. */
  def json(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptRecordCol)
      .json(path)

  /** Table-name derivation (P7): filename stem sanitized with the
    * reference's exact regex `[^a-zA-Z0-9_] → _` (App.tsx:132). */
  def tableName(fileName: String): String = {
    val stem = fileName.split('/').last.split('.').head
    val sanitized = stem.replaceAll("[^a-zA-Z0-9_]", "_")
    if (sanitized.isEmpty) "uploaded_data" else sanitized
  }
}
