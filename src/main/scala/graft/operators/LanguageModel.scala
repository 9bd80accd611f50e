package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Corpus-trained unigram language-model scoring — the cheap stand-in
  * for the KenLM perplexity filter every published pre-training corpus
  * pipeline runs (CCNet, Wenzek et al. 2020): documents whose average
  * token log-probability under the corpus unigram distribution is far
  * below typical are gibberish / format noise.
  *
  * Two passes over the tokens:
  *   1. train: global (word, count) aggregation — vocabulary-sized
  *      state, map-side partial agg, one exchange keyed by word;
  *   2. score: re-explode tokens, join word probabilities, average
  *      log p(w) per document.
  *
  * Scale design (100 TB stance): the probability table is
  * vocabulary-sized (≪ corpus); Spark broadcasts it when under the
  * threshold and falls back to a word-keyed shuffle join when a giant
  * vocabulary outgrows broadcast — both correct, neither collects
  * corpus-scale data to the driver. The grand-total denominator rides
  * in as a one-row broadcast cross join (the BM25 stats pattern,
  * operators/TextSearch.scala).
  */
object LanguageModel {

  /** One row per id: `n_tokens` and `avg_logprob` = mean over tokens of
    * ln(count(word)/total), rounded to 4. */
  def unigramLogprob(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("word"))
    val counts = tok.groupBy("word").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("total"))
    val probs = counts.crossJoin(broadcast(total))
      .select(col("word"), log(col("c").cast("double") / col("total")).as("logp"))
    tok.join(broadcast(probs), "word")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("bigint").as("n_tokens"),
        round(avg(col("logp")), 4).as("avg_logprob"))
  }
}
