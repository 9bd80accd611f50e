package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", §A1.1 quality filtering): documents
  * dominated by a single word, a repeated bigram, or duplicated
  * trigrams are boilerplate/spam and get filtered before training.
  *
  * Per document:
  *   - `top_word_frac`    — occurrences of the most frequent token / tokens
  *   - `top_bigram_frac`  — occurrences of the most frequent bigram / bigram slots
  *   - `dup_trigram_frac` — trigram slots whose trigram occurs more than
  *     once / trigram slots
  *   - `repetitive`       — threshold flag over the ROUNDED fractions (so
  *     the boundary decision is identical across engines)
  *
  * Scale design (100 TB stance): one map-side union explodes 1/2/3-grams
  * tagged by size, then TWO keyed exchanges — (doc, n, gram) counts with
  * map-side partial aggregation, then a (doc)-keyed conditional rollup.
  * State per key is bounded by document length; no windows, no driver
  * data. The n-gram transforms guard `size < n` explicitly because Spark's
  * `sequence(1, 0)` counts DOWN (yielding [1,0]) rather than returning
  * empty.
  */
object Repetition {

  private def grams(ws: Column, n: Int): Column =
    if (n == 1) ws
    else when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  /** One row per input id: token counts and the three repetition
    * fractions (rounded to 4), plus the `repetitive` flag. */
  def signals(df: DataFrame, idCol: String, textCol: String,
      topWordMax: Double = 0.15, topBigramMax: Double = 0.10,
      dupTrigramMax: Double = 0.05): DataFrame = {
    val base = df.select(col(idCol), TextOps.tokens(col(textCol)).as("__ws"))
    val exploded = (1 to 3).map { n =>
      base.select(col(idCol), lit(n).as("gram_n"),
        explode(grams(col("__ws"), n)).as("gram"))
    }.reduce(_ union _)
    def when_(n: Int, v: Column): Column = when(col("gram_n") === n, v)
    val counted = exploded
      .groupBy(col(idCol), col("gram_n"), col("gram"))
      .agg(count(lit(1)).as("c"))
    val top = (n: Int) =>
      round(max(when_(n, col("c"))).cast("double") / sum(when_(n, col("c"))), 4)
    val scored = counted
      .groupBy(col(idCol))
      .agg(
        sum(when_(1, col("c"))).cast("bigint").as("n_tokens"),
        top(1).as("top_word_frac"),
        coalesce(top(2), lit(0.0)).as("top_bigram_frac"),
        coalesce(
          round(sum(when_(3, when(col("c") > 1, col("c")))).cast("double")
            / sum(when_(3, col("c"))), 4),
          lit(0.0)).as("dup_trigram_frac"))
    // "one row per input id" includes null/empty-text docs, whose
    // tokens explode to NOTHING and would silently vanish from the
    // aggregate — join back onto the id set and zero-fill, so such a
    // doc reports 0 tokens / 0 fractions / not repetitive instead of
    // going missing (a downstream filter join would otherwise treat it
    // as unmatched)
    base.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("top_word_frac"), lit(0.0)).as("top_word_frac"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"),
        coalesce(col("dup_trigram_frac"), lit(0.0)).as("dup_trigram_frac"))
      .withColumn("repetitive",
        col("top_word_frac") > topWordMax
          or col("top_bigram_frac") > topBigramMax
          or col("dup_trigram_frac") > dupTrigramMax)
  }
}
