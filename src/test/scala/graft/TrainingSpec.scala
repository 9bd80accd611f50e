package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Chunking, LanguageModel, Repetition}

/** Training-data preparation operators (queries/Training.scala):
  * chunk-coverage algebra, Gopher repetition boundaries, unigram LM
  * probabilities, and sequence-packing offsets — each against hand
  * computable fixtures, plus plan-shape checks on the real keys. */
class TrainingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("chunking covers every token: window 3 stride 2 over 5 tokens") {
    val out = Chunking.chunk(docs(1L -> "a b c d e"), "doc_id", "text",
      window = 3, stride = 2).orderBy("chunk_id").collect()
    assert(out.map(_.getAs[String]("chunk_text")).toSeq == Seq("a b c", "c d e"))
    assert(out.map(_.getAs[Long]("chunk_start")).toSeq == Seq(1L, 3L))
    assert(out.map(_.getAs[Long]("n_chunk_tokens")).toSeq == Seq(3L, 3L))
  }

  test("chunking: short document yields exactly one short chunk") {
    val out = Chunking.chunk(docs(1L -> "a b"), "doc_id", "text",
      window = 32, stride = 24).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("chunk_text") == "a b")
    assert(out.head.getAs[Long]("n_chunk_tokens") == 2L)
  }

  test("chunking: exact-fit stream emits no empty tail chunk") {
    // 7 tokens, window 3 stride 2: last chunk id ceil(4/2)=2 -> starts 1,3,5
    val out = Chunking.chunk(docs(1L -> "a b c d e f g"), "doc_id", "text",
      window = 3, stride = 2).orderBy("chunk_id").collect()
    assert(out.map(_.getAs[String]("chunk_text")).toSeq ==
      Seq("a b c", "c d e", "e f g"))
  }

  test("repetition signals on a degenerate and a diverse document") {
    // the diverse doc needs >=12 distinct words: top_word 1/12 <= 0.15
    // AND top_bigram 1/11 <= 0.10 (shorter all-distinct docs still trip
    // the bigram threshold — by design, Gopher thresholds assume real
    // document lengths)
    val out = Repetition.signals(
      docs(1L -> "x x x x", 2L -> "a b c d e f g h i j k l"), "doc_id", "text")
      .orderBy("doc_id").collect()
    val degen = out(0)
    assert(degen.getAs[Double]("top_word_frac") == 1.0)
    assert(degen.getAs[Double]("top_bigram_frac") == 1.0)
    assert(degen.getAs[Double]("dup_trigram_frac") == 1.0)
    assert(degen.getAs[Boolean]("repetitive"))
    val diverse = out(1)
    assert(diverse.getAs[Double]("top_word_frac") == round6(1.0 / 12))
    assert(diverse.getAs[Double]("dup_trigram_frac") == 0.0)
    assert(!diverse.getAs[Boolean]("repetitive"))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("repetition: two-token document has zero trigram fraction, not null") {
    val out = Repetition.signals(docs(1L -> "a b"), "doc_id", "text").collect()
    assert(out.head.getAs[Double]("dup_trigram_frac") == 0.0)
    assert(out.head.getAs[Double]("top_bigram_frac") == 1.0)
  }

  test("null text: repetition keeps the row zero-filled, chunking emits no chunk") {
    import org.apache.spark.sql.functions.col
    // tokens(NULL) explodes to nothing and size(split(NULL)) is -1 —
    // the doc must neither vanish from signals (one-row-per-id
    // contract) nor emit a spurious -1-token chunk. An EMPTY string is
    // different by the engine-wide split convention (shared with the
    // DuckDB oracles): "" splits to one empty token.
    val d = docs(1L -> "a a a", 2L -> null, 3L -> "")
    val sig = Repetition.signals(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(sig.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L),
      "every input id must appear in signals")
    assert(sig(1).getAs[Long]("n_tokens") == 0L)
    assert(!sig(1).getAs[Boolean]("repetitive"))
    assert(sig(2).getAs[Long]("n_tokens") == 1L,
      "empty text is ONE empty token under the split convention")
    val chunks = Chunking.chunk(d, "doc_id", "text", window = 2, stride = 2)
    assert(chunks.filter(col("doc_id") === 2L).count() == 0,
      "a null-text doc must produce no chunks")
    assert(chunks.filter(col("n_chunk_tokens") < 0).count() == 0,
      "no chunk may report a negative token count")
    assert(chunks.filter(col("doc_id") === 3L).count() == 1,
      "the empty-string doc chunks its single empty token")
  }

  test("unigram LM: probabilities match the corpus distribution") {
    val out = LanguageModel.unigramLogprob(
      docs(1L -> "a a", 2L -> "b"), "doc_id", "text")
      .orderBy("doc_id").collect()
    // corpus = {a:2, b:1}, total 3
    assert(out(0).getAs[Double]("avg_logprob") == round6(math.log(2.0 / 3)))
    assert(out(1).getAs[Double]("avg_logprob") == round6(math.log(1.0 / 3)))
    assert(out(0).getAs[Long]("n_tokens") == 2L)
  }

  test("sequence packing: spans and boundary flags at budget 256") {
    val rows = SparkEntry.queries("q_pack_sequences")(spark, sf).collect()
    // offsets tile the concatenated stream: each doc starts where the
    // previous ended, and seq ids are consistent with the running offset
    var expectedCum = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); expectedCum += n
      assert(r.getAs[Long]("cum_tokens") == expectedCum)
      val first = r.getAs[Long]("seq_first")
      val last = r.getAs[Long]("seq_last")
      assert(first == (expectedCum - n) / 256)
      assert(last == (expectedCum - 1) / 256)
      assert(r.getAs[Boolean]("crosses_boundary") == (last > first))
    }
  }

  test("tfidf: scores and ranks on a two-document fixture") {
    val out = operators.TfIdf.topTerms(
      docs(1L -> "a a b", 2L -> "b c"), "doc_id", "text", k = 3)
      .orderBy("doc_id", "rank").collect()
    // n_docs=2; df: a=1 b=2 c=1; idf: a=ln2, b=0, c=ln2
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"),
      r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Double]("tfidf"))).toSeq ==
      Seq((1L, 1L, "a", 2L, round4(2 * math.log(2))), (1L, 2L, "b", 1L, 0.0),
          (2L, 1L, "c", 1L, round4(math.log(2))), (2L, 2L, "b", 1L, 0.0)))
  }

  test("vocab coverage: cumulative fractions with count-then-word ordering") {
    val out = operators.TfIdf.coverage(
      docs(1L -> "a a b", 2L -> "b c"), "text", v = 50)
      .orderBy("rank").collect()
    // counts a:2 b:2 c:1, total 5; ties break on word
    assert(out.map(r => (r.getAs[Long]("rank"), r.getAs[String]("word"),
      r.getAs[Long]("cnt"), r.getAs[Double]("coverage"))).toSeq ==
      Seq((1L, "a", 2L, 0.4), (2L, "b", 2L, 0.8), (3L, "c", 1L, 1.0)))
  }

  test("bigram LM: interpolated probabilities on a hand-computed fixture") {
    val out = LanguageModel.bigramLogprob(
      docs(1L -> "a b", 2L -> "a b a", 3L -> "z"), "doc_id", "text")
      .orderBy("doc_id").collect()
    // corpus: unigrams a:3 b:2 z:1 T=6; bigrams (a,b):2 (b,a):1; cp a:2 b:1
    val pAB = 0.75 * 2.0 / 2 + 0.25 * 2.0 / 6
    val pBA = 0.75 * 1.0 / 1 + 0.25 * 3.0 / 6
    assert(out.length == 2, "single-token doc must drop out")
    assert(out(0).getAs[Long]("n_bigrams") == 1L)
    assert(out(0).getAs[Double]("avg_logprob") == round4(math.log(pAB)))
    assert(out(1).getAs[Long]("n_bigrams") == 2L)
    assert(out(1).getAs[Double]("avg_logprob") ==
      round4((math.log(pAB) + math.log(pBA)) / 2))
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("chunking key re-concatenates to the original corpus (stride = window)") {
    // non-overlapping chunking partitions the token stream exactly
    val src = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val rejoined = Chunking.chunk(src, "doc_id", "text", window = 32, stride = 32)
      .groupBy("doc_id")
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("chunk_id"), col("chunk_text"))))
        .getField("chunk_text")).as("rebuilt"))
    val diff = rejoined.join(src, "doc_id")
      .filter(col("rebuilt") =!= col("text")).count()
    assert(diff == 0L)
  }

  test("q_doc_chunks plan is shuffle-free up to the final presentation sort") {
    val df = graft.queries.Training.qDocChunks.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // exactly one exchange: the range partitioning of the final ORDER BY
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected map-side chunking, got:\n$plan")
  }
}
