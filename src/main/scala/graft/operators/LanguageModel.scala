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
    // NO broadcast hint on the vocabulary table: under the threshold the
    // optimizer broadcasts it anyway, and a web-scale vocabulary that
    // outgrows broadcast falls back to the word-keyed shuffle join the
    // class doc promises — a mandatory hint would force the driver to
    // materialize the whole vocab and OOM instead
    tok.join(probs, "word")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("bigint").as("n_tokens"),
        round(avg(col("logp")), 4).as("avg_logprob"))
  }

  /** Interpolated bigram scoring, the next LM rung up: per bigram
    * position, p = λ·c(prev,next)/c(prev,·) + (1−λ)·c(next)/T, averaged
    * as ln p per document over its bigram positions (documents shorter
    * than 2 tokens have no bigram positions and drop out, in both this
    * plan and the SQL oracle).
    *
    * Scale shape: the bigram table is corpus-derived but
    * VOCABULARY²-bounded, so the (prev,next)-keyed join is a plain
    * shuffle join (NOT force-broadcast like the unigram table — a
    * bigram vocabulary outgrows broadcast long before the unigram one);
    * context totals reuse the bigram aggregate (no third corpus pass).
    */
  def bigramLogprob(df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.75): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1), got $lambda")
    val base = df.select(col(idCol), TextOps.tokens(col(textCol)).as("__ws"))
    val g = base
      .filter(size(col("__ws")) >= 2)
      .select(col(idCol), col("__ws"),
        explode(sequence(lit(1), size(col("__ws")) - 1)).as("__i"))
      .select(col(idCol),
        element_at(col("__ws"), col("__i")).as("prev"),
        element_at(col("__ws"), col("__i") + 1).as("next"))
    val bc = g.groupBy("prev", "next").agg(count(lit(1)).as("cb"))
    val pc = bc.groupBy("prev").agg(sum("cb").as("cp"))
    val tok = df.select(explode(TextOps.tokens(col(textCol))).as("word"))
    val uc = tok.groupBy("word").agg(count(lit(1)).as("cu"))
    val total = uc.agg(sum("cu").as("t"))
    g.join(bc, Seq("prev", "next"))
      .join(pc, Seq("prev"))
      .join(uc.withColumnRenamed("word", "next"), Seq("next"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("bigint").as("n_bigrams"),
        round(avg(log(
          lit(lambda) * col("cb").cast("double") / col("cp")
            + lit(1 - lambda) * col("cu").cast("double") / col("t"))), 4)
          .as("avg_logprob"))
  }
}
