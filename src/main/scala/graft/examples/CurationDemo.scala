package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.ConnectedComponents
import graft.pipeline.Monitor
import graft.queries.Extensions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the pipeline a user of the
  * reference would actually run at scale, chaining the library's
  * operators into one job:
  *
  *   documents → exact dedup (min-id keeper per text)
  *             → near-dup clustering (shingle pairs → connected
  *               components → keep each cluster's canonical doc)
  *             → benchmark decontamination (drop docs sharing 8-gram
  *               shingles with the held-out eval slice)
  *             → PII redaction (mask emails/URLs/phones map-side)
  *             → quality gate (token count / type-token ratio)
  *             → per-language token budget (windowed running sum —
  *               partitioned by lang, so the sequential fill is
  *               per-partition, not global)
  *             → partitioned parquet sink (lang directories ⇒
  *               partition-pruned reads downstream)
  *
  * Every stage is a narrow transformation or a keyed shuffle — nothing
  * collects to the driver; the Monitor records per-stage row accounting.
  *
  * Run: `sbt "runMain graft.examples.CurationDemo [sfDir] [outDir]"`.
  */
object CurationDemo {

  final case class StageCount(stage: String, rows: Long)

  def run(spark: SparkSession, sfDir: String, outDir: String,
      tokenBudgetPerLang: Long = 50000): Seq[StageCount] = {
    val monitor = new Monitor(spark)
    val stages = scala.collection.mutable.ArrayBuffer.empty[StageCount]
    def record(stage: String, df: DataFrame): DataFrame = {
      val n = df.count()
      stages += StageCount(stage, n)
      monitor.log(s"$stage: $n rows", "info")
      df
    }

    val docs = record("input", Tables.documents(spark, sfDir))

    // 1. exact dedup: one keeper per identical text (min doc_id)
    val exactKeep = record("exact_dedup",
      docs.groupBy("text").agg(min("doc_id").as("doc_id"),
          first("lang").as("lang"), first("n_chars").as("n_chars"))
        .select("doc_id", "text", "lang", "n_chars"))

    // 2. near-dup clustering: shingle-jaccard pairs -> components;
    //    drop every non-canonical member (cluster label = keeper id)
    val clusters = ConnectedComponents
      .run(Extensions.nearDupPairs(spark, sfDir, 0.2), "ida", "idb")
    val dropIds = clusters.filter(col("node") =!= col("lbl"))
      .select(col("node").as("doc_id"))
    val nearKeep = record("neardup_dedup",
      exactKeep.join(dropIds, Seq("doc_id"), "left_anti"))

    // 3. benchmark decontamination: the held-out eval slice (here a
    //    deterministic doc_id stripe standing in for a real benchmark)
    //    must not leak into training — drop any doc sharing an 8-gram
    val bench = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("bench_id"), col("text"))
    val decontaminated = record("decontaminate",
      graft.operators.Decontamination.clean(
        nearKeep, "doc_id", "text", bench, "bench_id", "text",
        w = 8, minOverlap = 2))

    // 4. PII redaction: mask emails/URLs/phones map-side (the synthetic
    //    corpus has none — the stage is plumbing-in-place, zero-cost
    //    when nothing matches)
    val redacted = record("pii_redact",
      graft.operators.Redaction.redact(decontaminated, Seq("text")))

    // 5. quality gate: enough tokens, enough lexical diversity
    val toks = split(col("text"), " ")
    val quality = record("quality_gate",
      redacted
        .withColumn("n_tokens", size(toks).cast("long"))
        .withColumn("ttr", size(array_distinct(toks)).cast("double") / size(toks))
        .filter(col("n_tokens") >= 10 && col("ttr") >= 0.3))

    // 6. per-language token budget: running sum in doc_id order WITHIN
    //    each language partition — the global-sort bottleneck stays off
    //    the plan; each language fills independently
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budgeted = record("token_budget",
      quality.withColumn("cum_tokens", sum("n_tokens").over(w))
        .filter(col("cum_tokens") <= tokenBudgetPerLang))

    // 7. partitioned sink: lang directories for pruned downstream reads
    budgeted.select("doc_id", "text", "lang", "n_tokens")
      .write.mode("overwrite").partitionBy("lang").parquet(outDir)
    stages += StageCount("sink", spark.read.parquet(outDir).count())
    monitor.log(s"sink: wrote $outDir", "success")
    stages.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/root/repo/target/curated")
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir).foreach(s => println(f"${s.stage}%-15s ${s.rows}"))
    spark.stop()
  }
}
