package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Corpus term statistics: TF-IDF feature extraction and vocabulary
  * coverage — the term-weighting stage between raw text and retrieval /
  * feature pipelines, and the coverage curve a tokenizer budget is
  * planned against.
  *
  * Reference surface: the reference exposes full-text search over PGlite
  * (SURVEY §2.4 X10); TF-IDF is the classical weighting behind that
  * ranking, made explicit here as a reusable feature operator.
  *
  * Scale design (100 TB stance):
  *  - term frequencies are ONE (doc, term) hash aggregate with map-side
  *    partial aggregation — the same keyed-exchange shape as TextSearch;
  *  - document frequencies reuse the (doc, term) aggregate (no second
  *    scan of the corpus) and aggregate it term-keyed: state per term is
  *    one long;
  *  - the corpus size N is a 1-row global aggregate, broadcast — never a
  *    driver-side collect in the data path;
  *  - per-document top-k uses a (doc)-PARTITIONED rank window, which
  *    Catalyst bounds via WindowGroupLimit — no global window anywhere;
  *  - vocabulary coverage takes top-V via orderBy().limit(V)
  *    (TakeOrderedAndProject: per-partition heaps + V-row driver merge),
  *    then ranks/cumulates ONLY the V survivors through the
  *    constant-partition [[BoundedRank]] window.
  */
object TfIdf {

  /** Top-`k` terms per document by `tf * ln(N / df)`, deterministic
    * tie-break on term. Scores are rounded to 4 decimals BEFORE ranking
    * so the selection boundary is engine-portable, mirroring the
    * repetition-flag convention (operators/Repetition.scala). */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df + N derive from the (doc,term) aggregate — one corpus scan total
    val dfCounts = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = tf.select(col(idCol)).distinct().agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(dfCounts, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf").cast("double") * log(col("n_docs").cast("double") / col("df")), 4))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast("bigint").as("rank"),
        col("term"), col("tf").cast("bigint").as("tf"), col("tfidf"))
  }

  /** Top-`v` vocabulary with cumulative corpus coverage: rank r's
    * `coverage` is the fraction of all token occurrences claimed by the
    * r most frequent words — the curve a subword/vocab budget is read
    * off. Deterministic tie-break on word. */
  def coverage(df: DataFrame, textCol: String, v: Int = 50): DataFrame = {
    val counts = df
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    val topV = counts
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(v)
    import org.apache.spark.sql.expressions.Window
    val zero = pmod(xxhash64(col("word")), lit(1L))
    val ord = Window.partitionBy(zero).orderBy(col("cnt").desc, col("word").asc)
    topV
      .withColumn("rank", row_number().over(ord).cast("bigint"))
      .withColumn("__cum", sum("cnt").over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("word"), col("cnt"),
        round(col("__cum").cast("double") / col("total"), 4).as("coverage"))
  }
}
