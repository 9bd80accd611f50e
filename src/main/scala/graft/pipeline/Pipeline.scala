package graft.pipeline

import graft.ingest.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** The "self-healing" pipeline surface (reference README.md:4-17 declares
  * a self-healing ETL pipeline; its only concrete mechanisms are the
  * process log `types.ts:16-21` + parse-error tolerance
  * `dataProcessingService.ts:14-17`). Here that intent becomes concrete,
  * deterministic machinery:
  *
  *  - [[Retry.withRetry]]: bounded retry with exponential backoff for
  *    transient job failures;
  *  - [[Quarantine]]: PERMISSIVE ingest that *routes* corrupt rows to a
  *    quarantine output instead of failing or dropping (heal = keep the
  *    good rows flowing, preserve the bad ones for repair);
  *  - [[Monitor]]: structured log entries (the reference's ETL log shape)
  *    plus a QueryExecutionListener feeding a queryable log DataFrame.
  *
  * Scale notes: quarantine is a single extra column + partitioned filter
  * writes (no second scan); the monitor's state is driver-side and O(jobs),
  * never per-row.
  */
object Retry {

  final case class Attempt(n: Int, errorClass: String, message: String)

  /** Run `body` up to `maxAttempts` times with exponential backoff.
    * Returns the result plus the attempt log. Non-fatal errors only —
    * analysis errors (bad SQL/schema) fail fast since retrying cannot
    * heal them; runtime/IO errors retry. */
  def withRetry[T](maxAttempts: Int = 3, initialBackoffMs: Long = 100,
      retryable: Throwable => Boolean = defaultRetryable)
      (body: => T): (Either[Throwable, T], Seq[Attempt]) = {
    var attempts = Vector.empty[Attempt]
    var backoff = initialBackoffMs
    var i = 0
    while (true) {
      i += 1
      try return (Right(body), attempts)
      catch {
        case NonFatal(e) =>
          attempts :+= Attempt(i, e.getClass.getSimpleName, String.valueOf(e.getMessage).take(200))
          if (i >= maxAttempts || !retryable(e)) return (Left(e), attempts)
          Thread.sleep(backoff)
          backoff *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Analysis/parse errors are deterministic — retry cannot fix them. */
  def defaultRetryable(e: Throwable): Boolean = e match {
    case _: org.apache.spark.sql.AnalysisException => false
    case _: IllegalArgumentException => false
    case _ => true
  }
}

/** Contract-gated load — the self-healing composition of the quality
  * expectations with the quarantine path: a batch whose violation total
  * stays within tolerance loads; one that breaches its contract diverts
  * whole to the quarantine side with its violation report, and the
  * pipeline keeps going either way. (Row-level corrupt-record routing is
  * [[Quarantine]]; this gates on TABLE-level contracts — uniqueness,
  * ranges, referential integrity — that no single row can decide.) */
object ContractGate {

  final case class GateResult(passed: Boolean,
      violations: Seq[(String, Long)], total: Long)

  /** Evaluate `rules` on `batch` (referential rules resolve against
    * `parents`); within `maxViolations` → `load` runs, beyond it →
    * `quarantine` runs with the report. Exactly one of the two callbacks
    * fires; the decision and full report are returned either way. */
  def gatedLoad(name: String, batch: DataFrame,
      rules: Seq[graft.catalog.Expectations.Rule],
      parents: Map[String, DataFrame] = Map.empty,
      maxViolations: Long = 0)(load: DataFrame => Unit)(
      quarantine: (DataFrame, Seq[(String, Long)]) => Unit): GateResult = {
    val report = graft.catalog.Expectations
      .check(Seq((name, batch, rules)) ++
        parents.toSeq.map { case (n, df) => (n, df, Seq.empty[graft.catalog.Expectations.Rule]) })
      .filter(col("expectation").startsWith(s"$name."))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val total = report.map(_._2).sum
    val passed = total <= maxViolations
    if (passed) load(batch) else quarantine(batch, report)
    GateResult(passed, report, total)
  }
}

/** Corrupt-record routing for ingestion: the reference logs CSV errors
  * and keeps going (dataProcessingService.ts:14-17); we additionally
  * keep the bad rows addressable. */
object Quarantine {

  /** `unpersist()` releases the single cached scan both splits share —
    * call it once both sides are consumed, or a long-lived session
    * ingesting many files accumulates one cached relation per call. */
  final case class SplitResult(clean: DataFrame, quarantined: DataFrame,
      private val raw: Option[DataFrame] = None) {
    def unpersist(): Unit = { raw.foreach(_.unpersist()); () }
  }

  /** Read a CSV keeping corrupt lines, then split: clean rows flow on,
    * corrupt raw lines (with the reason) go to the quarantine side. */
  def csv(spark: SparkSession, path: String): SplitResult = {
    // PERMISSIVE + corrupt-record column requires the column in the schema:
    // infer first, then re-read with the widened schema
    val inferred = Ingest.csv(spark, path).schema
    val widened = org.apache.spark.sql.types.StructType(
      inferred.fields.filterNot(_.name == Ingest.CorruptRecordCol) :+
        org.apache.spark.sql.types.StructField(Ingest.CorruptRecordCol,
          org.apache.spark.sql.types.StringType))
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Ingest.CorruptRecordCol)
      .schema(widened)
      .csv(path)
      .cache() // one scan serves both splits
    SplitResult(
      clean = raw.filter(col(Ingest.CorruptRecordCol).isNull)
        .drop(Ingest.CorruptRecordCol),
      quarantined = raw.filter(col(Ingest.CorruptRecordCol).isNotNull)
        .select(col(Ingest.CorruptRecordCol).as("raw_line"),
          lit("CSV parse failure").as("reason")),
      raw = Some(raw))
  }

  /** JSON twin: malformed records land in the corrupt column instead of
    * failing the read (mirrors the reference's "Invalid JSON format."
    * error path, dataProcessingService.ts:24-27 — but healing, not
    * aborting).
    *
    * Parse-mode dispatch: inference and re-read must use the SAME mode
    * (a mode mismatch parses different record shapes — the round-11
    * review finding). JSON-Lines is tried first (the Spark-native
    * shape, one record per line); when EVERY record comes back corrupt
    * the file is almost certainly a pretty-printed array / single
    * object (the reference's upload shapes, which line mode sees as
    * one malformed record per physical line) — retry as one multi-line
    * document. A genuinely garbage file stays all-quarantined either
    * way. */
  def json(spark: SparkSession, path: String): SplitResult = {
    def readWith(multiLine: Boolean): DataFrame = {
      val inferred = spark.read
        .option("multiLine", multiLine.toString)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", Ingest.CorruptRecordCol)
        .json(path).schema
      val widened =
        if (inferred.fieldNames.contains(Ingest.CorruptRecordCol)) inferred
        else org.apache.spark.sql.types.StructType(
          inferred.fields :+ org.apache.spark.sql.types.StructField(
            Ingest.CorruptRecordCol, org.apache.spark.sql.types.StringType))
      spark.read
        .option("multiLine", multiLine.toString)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", Ingest.CorruptRecordCol)
        .schema(widened)
        .json(path)
        .cache() // one scan serves the shape probe AND both splits
    }
    // shape probe: a top-level '[' can ONLY be the array upload shape
    // (JSON-Lines records are objects) → parse as one multi-line doc.
    // An all-corrupt line-mode read catches the pretty-printed
    // SINGLE-object shape (its first line "{" alone is malformed).
    // The probe must look at the BYTES: line mode half-parses a pretty
    // array (objects parse, the bracket lines quarantine), so a
    // corrupt-fraction probe alone mis-splits it.
    val isArray = {
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(hp)
      val head = try {
        val buf = new Array[Byte](256)
        val n = math.max(0, in.read(buf))
        new String(buf, 0, n, "UTF-8")
      } finally in.close()
      head.trim.startsWith("[")
    }
    val raw =
      if (isArray) readWith(multiLine = true)
      else {
        val lineMode = readWith(multiLine = false)
        val total = lineMode.count()
        val corrupt = lineMode.filter(col(Ingest.CorruptRecordCol).isNotNull).count()
        if (total > 0 && corrupt == total) {
          lineMode.unpersist()
          readWith(multiLine = true)
        } else lineMode
      }
    SplitResult(
      clean = raw.filter(col(Ingest.CorruptRecordCol).isNull)
        .drop(Ingest.CorruptRecordCol),
      quarantined = raw.filter(col(Ingest.CorruptRecordCol).isNotNull)
        .select(col(Ingest.CorruptRecordCol).as("raw_line"),
          lit("JSON parse failure").as("reason")),
      raw = Some(raw))
  }
}

/** The reference's ETL log entry shape (types.ts:16-21). */
final case class LogEntry(id: Long, ts_ms: Long, message: String, level: String)

/** One data-lineage edge: a source the executed query read, and where
  * the result went (an output path for writes, the action name for
  * driver-side results). */
final case class LineageEdge(
    query_id: Long, input: String, output: String, op: String, ts_ms: Long)

/** Data lineage from the same QueryExecutionListener seam as [[Monitor]]
  * — the reference's README declares lineage as a capability
  * (`README.md:4-17`) with no code behind it; here every executed query
  * contributes (input source → output sink) edges, queryable as a
  * DataFrame and joinable back to the process log by time.
  *
  * Inputs are the leaf relations of the ANALYZED plan (file-source root
  * paths, DataSourceV2 table names); the output is the write command's
  * target path when the query is a write, else the action name. State
  * is driver-side and O(executed queries), never per-row.
  */
final class Lineage(spark: SparkSession) extends Serializable {

  private val edges = new ConcurrentLinkedQueue[LineageEdge]()
  private val nextId = new java.util.concurrent.atomic.AtomicLong(0)

  private[pipeline] def record(funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
    val inputs = Lineage.inputsOf(qe.analyzed)
    val output = Lineage.outputOf(qe.analyzed).getOrElse(s"($funcName)")
    val id = nextId.getAndIncrement()
    val now = System.currentTimeMillis()
    inputs.foreach(in => edges.add(LineageEdge(id, in, output, funcName, now)))
  }

  val listener: QueryExecutionListener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      record(funcName, qe)
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
      () // failed queries produced no output — no edge
  }

  def install(): Unit = spark.listenerManager.register(listener)
  def uninstall(): Unit = spark.listenerManager.unregister(listener)

  /** Barrier: block until every query-execution event queued so far has
    * been delivered. Listener delivery is async (it rides the shared
    * LiveListenerBus), so without this the edge set read after an action
    * is a race; with it, edges are deterministic — install-time drain
    * flushes stragglers from EARLIER queries, read-time drain waits for
    * this chain's own events. */
  def drain(): Unit =
    org.apache.spark.graft.ListenerBusHook.drain(spark.sparkContext)

  def toDF(): DataFrame = {
    import spark.implicits._
    edges.asScala.toSeq.toDF()
  }
}

object Lineage {

  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InsertIntoHadoopFsRelationCommand, LogicalRelation}
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  /** Leaf data sources of an analyzed plan: file-relation root paths and
    * V2 table names, deduplicated and sorted. In-memory relations
    * (literal test frames, localCheckpoints) carry no lineage. */
  def inputsOf(plan: LogicalPlan): Seq[String] = plan.collect {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
      case other => Seq(other.getClass.getSimpleName)
    }
    case r: DataSourceV2Relation => Seq(r.table.name)
  }.flatten.distinct.sorted

  /** Write target of the plan, when it is a write command. */
  def outputOf(plan: LogicalPlan): Option[String] = plan.collectFirst {
    case c: InsertIntoHadoopFsRelationCommand => c.outputPath.toString
  }

  /** File path / table name → the reference's table-name derivation
    * (`App.tsx:132` sanitize rule) — so edges can be read at table grain
    * rather than physical-path grain. Action-name outputs like
    * "(collect)" pass through untouched. */
  def tableGrain(source: String): String =
    if (source.startsWith("(")) source else Ingest.tableName(source)
}

/** Structured process log — fed manually and by a QueryExecutionListener,
  * queryable as a DataFrame (reference P10). */
final class Monitor(spark: SparkSession) extends Serializable {

  private val entries = new ConcurrentLinkedQueue[LogEntry]()
  private val nextId = new java.util.concurrent.atomic.AtomicLong(0)

  def log(message: String, level: String = "info"): Unit =
    entries.add(LogEntry(nextId.getAndIncrement(), System.currentTimeMillis(), message, level))

  /** Spark-level success/failure feed (maps reference P10 progress log). */
  val listener: QueryExecutionListener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      log(s"$funcName completed in ${durationNs / 1000000} ms", "success")
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
      log(s"$funcName failed: ${e.getMessage}", "error")
  }

  def install(): Unit = spark.listenerManager.register(listener)
  def uninstall(): Unit = spark.listenerManager.unregister(listener)

  def toDF(): DataFrame = {
    import spark.implicits._
    entries.asScala.toSeq.toDF()
  }
}
