package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data-family scaling probe (round-9 verdict item #4): the
  * two round-9 keys with open scale questions are measured against
  * amplified corpora.
  *
  *  - `q_lm_bigram` (LanguageModel.bigramLogprob): the bigram table is
  *    the one deliberately PLAIN-shuffle join in the family (a bigram
  *    vocabulary outgrows broadcast long before a unigram one). The
  *    claimed bound is vocabulary² in the worst case but
  *    observed-bigrams in practice; this probe measures both axes:
  *    4× MORE TEXT over the SAME vocabulary (the bigram table should
  *    grow sublinearly — new text mostly repeats seen bigrams) and
  *    4× text with a 4× DISJOINT vocabulary (per-copy word suffixes —
  *    the adversarial axis: every copy mints new bigrams, the table
  *    grows ~linearly with text and the join cost must follow the
  *    table, not explode).
  *  - `q_pack_sequences` (CumSum.runningTotal): the distributed
  *    prefix-sum must scale with rows per partition, never collapse to
  *    a single-task window.
  *
  * Appends the "## Training family" section to SCALING.md output on
  * stdout (rows are pasted into SCALING.md by hand, same as the other
  * probes). Run: `sbt "runMain graft.tools.TrainingScaleProbe"`.
  */
object TrainingScaleProbe {

  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def timeMin(body: => Unit): Double = (1 to 3).map(_ => time(body)).min

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/root/repo/target/trainscale"
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs1 = Tables.documents(spark, sf)

    // 4x docs, same vocabulary (key-shifted copies)
    (0 until 4).map(i => docs1.withColumn("doc_id", col("doc_id") + i * 1000000L))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/docs4_samevocab")
    // 4x docs, 4x vocabulary: every copy suffixes every word, so copy
    // i's bigrams are disjoint from copy j's — the table-growth worst case
    (0 until 4).map(i =>
        docs1.select((col("doc_id") + i * 1000000L).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"$$1_$i").as("text")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/docs4_newvocab")

    def docs4same = spark.read.parquet(s"$out/docs4_samevocab")
    def docs4new = spark.read.parquet(s"$out/docs4_newvocab")

    def bigram(d: DataFrame): Long =
      graft.operators.LanguageModel.bigramLogprob(d, "doc_id", "text").count()
    def bigramTableRows(d: DataFrame): Long = d
      .select(col("doc_id"), graft.functions.TextOps.tokens(col("text")).as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__ws) - 1), i -> struct(__ws[i-1] AS p, __ws[i] AS n))")))
      .distinct().count()

    val b1 = timeMin { bigram(docs1) }
    val b4s = timeMin { bigram(docs4same) }
    val b4n = timeMin { bigram(docs4new) }
    val t1 = bigramTableRows(docs1)
    val t4s = bigramTableRows(docs4same)
    val t4n = bigramTableRows(docs4new)
    println(f"BIGRAM 1x: $b1%.2f s, distinct bigrams $t1")
    println(f"BIGRAM 4x same vocab: $b4s%.2f s (${b4s / b1}%.1fx), distinct bigrams $t4s (${t4s.toDouble / t1}%.1fx)")
    println(f"BIGRAM 4x new vocab: $b4n%.2f s (${b4n / b1}%.1fx), distinct bigrams $t4n (${t4n.toDouble / t1}%.1fx)")

    def pack(d: DataFrame): Long = {
      val scored = d.select(col("doc_id"),
        size(graft.functions.TextOps.tokens(col("text"))).cast("bigint").as("n_tokens"))
      graft.operators.CumSum
        .runningTotal(scored, "n_tokens", "cum_tokens", Seq(col("doc_id").asc))
        .count()
    }
    val p1 = timeMin { pack(docs1) }
    val p4 = timeMin { pack(docs4same) }
    println(f"PACK 1x: $p1%.2f s; 4x: $p4%.2f s (${p4 / p1}%.1fx)")

    // substring-span dedup: the span-keyed exchange, driving the SAME
    // pipeline as q_dedup_substring (Training.substringSpanStats) so
    // the measurement cannot drift from the key. Key-shifted copies
    // keep doc texts identical, so every span's distinct-doc count
    // multiplies by 4 — the exchange carries 4x rows over the SAME
    // distinct-span key space (the worst case for a hot reducer is a
    // single span, which this operator never joins quadratically).
    def substr(d: DataFrame): Long =
      graft.queries.Training.substringSpanStats(d).count()
    val s1 = timeMin { substr(docs1) }
    val s4 = timeMin { substr(docs4same) }
    println(f"SUBSTR 1x: $s1%.2f s; 4x: $s4%.2f s (${s4 / s1}%.1fx)")
    spark.stop()
  }
}
