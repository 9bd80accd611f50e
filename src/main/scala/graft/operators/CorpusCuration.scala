package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition the LLM-data operators
  * exist for, as ONE declarative pipeline:
  *
  *   1. exact dedup, first-seen-wins (min doc id per text);
  *   2. quality scoring (the q_text_quality weighted score: length,
  *      type-token ratio, stopword ratio);
  *   3. quality-threshold filter;
  *   4. token-budget selection: best-quality-first running total over
  *      the whitespace token counts, cut at the budget.
  *
  * Scale shape: dedup is one text-keyed hash aggregation (metrics are
  * text-derived, so they ride the same pass — no re-join with the
  * winning id); the budget cut is CumSum's two-pass range-partitioned
  * running total, never a single-task global window. Every stage is the
  * same plan the stage's standalone query key uses, so the composite
  * inherits their 100 TB arguments unchanged.
  */
object CorpusCuration {

  /** English stopword markers shared with the standalone quality key
    * (graft.queries.Extensions.enMarkers — single source kept there). */
  def curate(docs: DataFrame, markers: Seq[String], minQuality: Double,
      tokenBudget: Long): DataFrame = {
    // null/empty text is uncurateable by definition — and size(split(
    // NULL)) is -1 in Spark (the TextSearch.scala hazard), which would
    // DECREMENT the running token total and shift the budget boundary;
    // drop such rows up front instead of letting them score
    val nonNull = docs.filter(col("text").isNotNull && col("text") =!= "")
    // 1. first-seen-wins exact dedup: one hash agg keyed by text
    val deduped = nonNull.groupBy("text").agg(min("doc_id").as("doc_id"))

    // 2. weighted quality score — the same rational q_text_quality
    // emits (that key now OUTPUTS it as exact-integer 4dp, the
    // hash-compare contract); here the score is only RANKED/thresholded
    // and the oracle replicates this double form verbatim, so the
    // unrounded double stays adequate
    val ws = TextOps.tokens(col("text"))
    val nTok = size(ws).cast("double")
    val nTypes = size(array_distinct(ws)).cast("double")
    val nStop = TextOps.markerHits(ws, markers).cast("double")
    val quality: Column =
      lit(0.4) * least(lit(1.0), nTok / 100.0) +
        lit(0.3) * (nTypes / nTok) +
        lit(0.3) * (lit(1) - nStop / nTok)
    val scored = deduped.select(
      col("doc_id"),
      size(ws).cast("bigint").as("n_tokens"),
      quality.as("q"))

    // 3-4. threshold filter, then budget cut on the distributed running
    // total ordered best-quality-first (doc id tie-break for determinism)
    CumSum.runningTotal(
        scored.filter(col("q") >= minQuality),
        "n_tokens", "cum_tokens", Seq(col("q").desc, col("doc_id").asc))
      .filter(col("cum_tokens") <= tokenBudget)
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"),
        round(col("q"), 4).as("quality"))
  }
}
