package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style heuristic quality filtering (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * §A1.1) — the HARD-filter complement to the weighted score the
  * `q_text_quality` key computes. Where the score ranks, the rule set
  * GATES, and per-rule boolean attribution is the point: a curation
  * pipeline needs to know *why* a document was dropped (length? cut it;
  * repetition? near-dup it first) before tuning any threshold.
  *
  * Rules evaluated per document, each a named boolean column:
  *   - `r_len`        — token count within [minTokens, maxTokens];
  *   - `r_word_len`   — mean word length within [minAvgWordLen,
  *                      maxAvgWordLen] (gibberish / minified-blob cut);
  *   - `r_stopwords`  — at least minStopwordHits function-word hits
  *                      (Gopher's "2 of the stop words" natural-language
  *                      evidence rule);
  *   - `r_ttr`        — type-token ratio at least minTypeTokenRatio
  *                      (in-document repetition cut);
  *   - `r_top_token`  — most-frequent-token share at most
  *                      maxTopTokenFrac (degenerate-loop cut — Gopher's
  *                      top-n-gram-fraction family at n=1).
  * Plus `n_passed` (how many rules passed) and `pass` (all of them).
  *
  * Scale shape: one scan, zero shuffles, zero joins — every signal is a
  * per-row expression over the token array (higher-order `transform` /
  * `filter` / `array_max` built-ins, all inside whole-stage codegen), so
  * the filter runs map-side at any corpus size and composes with any
  * downstream shuffle for free. The top-token count is O(n log n) per
  * document (sort + run-length pass) — bounded by document length, not
  * corpus size, and safe even at the 100k-token r_len cap.
  */
object QualityRules {

  /** Thresholds, defaulted to the Gopher-flavored cuts that are
    * non-degenerate on the synthetic corpus (each rule both passes and
    * fails real rows at sf0.01 — pinned in ExtensionsSpec). */
  final case class Config(
      minTokens: Int = 30,
      maxTokens: Int = 100000,
      minAvgWordLen: Double = 4.0,
      maxAvgWordLen: Double = 10.0,
      minStopwordHits: Int = 2,
      minTypeTokenRatio: Double = 0.35,
      maxTopTokenFrac: Double = 0.15)

  /** Per-document rule evaluation over a (doc_id, text) frame.
    * All ratio comparisons are single int-int divisions compared against
    * the literal threshold — bit-identical across engines, so the DuckDB
    * oracle can hash-match the booleans exactly. */
  def evaluate(docs: DataFrame, markers: Seq[String],
      cfg: Config = Config()): DataFrame = {
    val ws = TextOps.tokens(col("text"))
    val n = size(ws)
    // mean word length from char count: n-1 separators for n tokens
    val awl = (length(col("text")) - n + lit(1.0)) / n
    val ttr = size(array_distinct(ws)).cast("double") / n
    // Max token frequency in O(n log n): sort the tokens, then a single
    // aggregate() pass counts run lengths. The obvious alternative —
    // transform(array_distinct(ws), w => size(filter(ws, w))) — is
    // O(types × tokens) per document, which at the 100k-token r_len cap
    // is ~10^9 comparisons inside ONE task for a single pathological web
    // document: an executor-wedger, not a filter. The sort-run pass is
    // ~1.7M ops at the same cap.
    val sorted = array_sort(ws)
    val topCount = aggregate(
      sorted,
      struct(lit(0).as("best"), lit(0).as("run"),
        lit(null).cast("string").as("prev")),
      (acc, w) => {
        val run = when(w === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(greatest(acc.getField("best"), run).as("best"),
          run.as("run"), w.as("prev"))
      },
      acc => acc.getField("best"))
    val topFrac = topCount.cast("double") / n

    val rLen = n >= cfg.minTokens && n <= cfg.maxTokens
    val rWordLen = awl >= cfg.minAvgWordLen && awl <= cfg.maxAvgWordLen
    val rStop = TextOps.markerHits(ws, markers) >= cfg.minStopwordHits
    val rTtr = ttr >= cfg.minTypeTokenRatio
    val rTop = topFrac <= cfg.maxTopTokenFrac
    val rules = Seq(rLen, rWordLen, rStop, rTtr, rTop)

    docs.select(
      col("doc_id"),
      n.cast("bigint").as("n_tokens"),
      rLen.as("r_len"),
      rWordLen.as("r_word_len"),
      rStop.as("r_stopwords"),
      rTtr.as("r_ttr"),
      rTop.as("r_top_token"),
      rules.map(_.cast("int")).reduce(_ + _).cast("bigint").as("n_passed"),
      rules.reduce((a: Column, b: Column) => a && b).as("pass"))
  }
}
