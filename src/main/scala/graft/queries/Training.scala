package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Round-9 training-data preparation surface: sliding-window chunking,
  * Gopher repetition filters, unigram LM scoring, and GPT-style
  * sequence packing — the curation stages between the cleaned corpus
  * (queries/Extensions.scala) and the training loader. Every key here
  * is oracle-checked against the identical DuckDB formulation.
  */
object Training {

  /** Sliding-window chunking of documents into 32-token windows with
    * stride 24 (8-token overlap) — map-side only, no shuffle. */
  val qDocChunks = Q(
    "q_doc_chunks",
    """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |k AS (SELECT doc_id, ws,
      |        unnest(generate_series(0,
      |          greatest(CAST(ceil((len(ws) - 32) / 24.0) AS BIGINT), 0))) AS chunk_id
      |      FROM w)
      |SELECT doc_id, chunk_id,
      |  CAST(chunk_id*24 + 1 AS BIGINT) AS chunk_start,
      |  CAST(len(list_slice(ws, chunk_id*24+1, chunk_id*24+32)) AS BIGINT) AS n_chunk_tokens,
      |  array_to_string(list_slice(ws, chunk_id*24+1, chunk_id*24+32), ' ') AS chunk_text
      |FROM k ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    graft.operators.Chunking
      .chunk(Tables.documents(s, d), "doc_id", "text", window = 32, stride = 24)
      .orderBy("doc_id", "chunk_id")
  }

  /** Gopher-style repetition signals + threshold flag. The flag compares
    * ROUNDED fractions so the boundary decision is engine-portable. */
  val qTextRepetition = Q(
    "q_text_repetition",
    """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |g AS (
      |  SELECT doc_id, 1 AS gram_n, unnest(ws) AS gram FROM w
      |  UNION ALL
      |  SELECT doc_id, 2, unnest(list_transform(generate_series(1, len(ws)-1),
      |    i -> ws[i] || ' ' || ws[i+1])) FROM w
      |  UNION ALL
      |  SELECT doc_id, 3, unnest(list_transform(generate_series(1, len(ws)-2),
      |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) FROM w),
      |c AS (SELECT doc_id, gram_n, gram, count(*) AS c FROM g GROUP BY ALL),
      |r AS (SELECT doc_id,
      |  CAST(sum(c) FILTER (gram_n = 1) AS BIGINT) AS n_tokens,
      |  round(max(c) FILTER (gram_n = 1) * 1.0 / sum(c) FILTER (gram_n = 1), 4) AS top_word_frac,
      |  round(coalesce(max(c) FILTER (gram_n = 2) * 1.0
      |        / sum(c) FILTER (gram_n = 2), 0), 4) AS top_bigram_frac,
      |  round(coalesce(sum(CASE WHEN c > 1 THEN c END) FILTER (gram_n = 3) * 1.0
      |        / sum(c) FILTER (gram_n = 3), 0), 4) AS dup_trigram_frac
      |FROM c GROUP BY doc_id)
      |SELECT doc_id, n_tokens, top_word_frac, top_bigram_frac, dup_trigram_frac,
      |  (top_word_frac > 0.15 OR top_bigram_frac > 0.10
      |   OR dup_trigram_frac > 0.05) AS repetitive
      |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Repetition
      .signals(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Unigram LM average log-probability per document (the KenLM-filter
    * stand-in): corpus-trained word distribution, broadcast-joined back
    * onto the exploded tokens. */
  val qLmScore = Q(
    "q_lm_score",
    """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents),
      |c AS (SELECT word, count(*) AS c FROM t GROUP BY word),
      |n AS (SELECT sum(c) AS total FROM c)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  round(avg(ln(c / total)), 4) AS avg_logprob
      |FROM t JOIN c USING (word) CROSS JOIN n
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.LanguageModel
      .unigramLogprob(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** GPT-style sequence packing: concatenate every document's tokens in
    * doc_id order and cut the stream into fixed 256-token training
    * sequences; each document maps to the sequence ids its tokens span.
    * The global running offset is graft.operators.CumSum (range
    * partition + per-partition prefix sums) — never a single-task
    * global-ORDER window. */
  val qPackSequences = Q(
    "q_pack_sequences",
    """WITH t AS (SELECT doc_id,
      |             CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
      |           FROM documents),
      |c AS (SELECT doc_id, n_tokens,
      |             CAST(sum(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum_tokens
      |      FROM t)
      |SELECT doc_id, n_tokens, cum_tokens,
      |  CAST(floor((cum_tokens - n_tokens) / 256.0) AS BIGINT) AS seq_first,
      |  CAST(floor((cum_tokens - 1) / 256.0) AS BIGINT) AS seq_last,
      |  (floor((cum_tokens - 1) / 256.0)
      |   > floor((cum_tokens - n_tokens) / 256.0)) AS crosses_boundary
      |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
    val scored = Tables.documents(s, d)
      .select(col("doc_id"),
        size(graft.functions.TextOps.tokens(col("text"))).cast("bigint").as("n_tokens"))
    val seqFirst = floor((col("cum_tokens") - col("n_tokens")) / 256.0).cast("bigint")
    val seqLast = floor((col("cum_tokens") - 1) / 256.0).cast("bigint")
    graft.operators.CumSum
      .runningTotal(scored, "n_tokens", "cum_tokens", Seq(col("doc_id").asc))
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"),
        seqFirst.as("seq_first"), seqLast.as("seq_last"),
        (seqLast > seqFirst).as("crosses_boundary"))
      .orderBy("doc_id")
  }

  /** TF-IDF top-3 terms per document: one (doc,term) aggregate feeds
    * tf, df AND the doc count; scores round to 4 BEFORE the per-doc
    * rank so the selection boundary is engine-portable. */
  val qTfidf = Q(
    "q_tfidf",
    """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY ALL),
      |d AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
      |s AS (SELECT doc_id, term, tf,
      |        round(tf * ln(n_docs * 1.0 / df), 4) AS tfidf
      |      FROM tf JOIN d USING (term) CROSS JOIN n),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |        ORDER BY tfidf DESC, term) AS rank FROM s)
      |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
      |  CAST(tf AS BIGINT) AS tf, tfidf
      |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin) { (s, d) =>
    graft.operators.TfIdf
      .topTerms(Tables.documents(s, d), "doc_id", "text", k = 3)
      .orderBy("doc_id", "rank")
  }

  /** Vocabulary coverage curve (tokenizer-budget planning): top-50
    * words with the cumulative fraction of all token occurrences they
    * claim. Top-V via TakeOrderedAndProject; rank+cumsum only over the
    * 50 survivors (constant-partition window). */
  val qVocabCoverage = Q(
    "q_vocab_coverage",
    """WITH t AS (SELECT unnest(string_split(text,' ')) AS word FROM documents),
      |c AS (SELECT word, count(*) AS cnt FROM t GROUP BY word),
      |n AS (SELECT sum(cnt) AS total FROM c),
      |r AS (SELECT word, cnt,
      |        row_number() OVER (ORDER BY cnt DESC, word) AS rank,
      |        sum(cnt) OVER (ORDER BY cnt DESC, word
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |      FROM c)
      |SELECT CAST(rank AS BIGINT) AS rank, word, CAST(cnt AS BIGINT) AS cnt,
      |  round(cum * 1.0 / total, 4) AS coverage
      |FROM r CROSS JOIN n WHERE rank <= 50 ORDER BY rank""".stripMargin) { (s, d) =>
    graft.operators.TfIdf
      .coverage(Tables.documents(s, d), "text", v = 50)
      .orderBy("rank")
  }

  /** Interpolated bigram LM scoring (λ=0.75 bigram, 0.25 unigram
    * backoff) — the next rung above q_lm_score's unigram filter. */
  val qLmBigram = Q(
    "q_lm_bigram",
    """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |g AS (SELECT doc_id,
      |        unnest(list_transform(generate_series(1, len(ws)-1), i -> ws[i])) AS prev,
      |        unnest(list_transform(generate_series(1, len(ws)-1), i -> ws[i+1])) AS nxt
      |      FROM w WHERE len(ws) >= 2),
      |bc AS (SELECT prev, nxt, count(*) AS cb FROM g GROUP BY ALL),
      |pc AS (SELECT prev, sum(cb) AS cp FROM bc GROUP BY prev),
      |t AS (SELECT unnest(string_split(text,' ')) AS word FROM documents),
      |uc AS (SELECT word, count(*) AS cu FROM t GROUP BY word),
      |n AS (SELECT sum(cu) AS tot FROM uc)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  round(avg(ln(0.75 * cb / cp + 0.25 * cu / tot)), 4) AS avg_logprob
      |FROM g JOIN bc USING (prev, nxt) JOIN pc USING (prev)
      |  JOIN uc ON uc.word = g.nxt CROSS JOIN n
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.LanguageModel
      .bigramLogprob(Tables.documents(s, d), "doc_id", "text", lambda = 0.75)
      .orderBy("doc_id")
  }

  /** Exact substring-span dedup (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" signal, reshaped for
    * Spark): every 8-token window of every document, flagged when the
    * IDENTICAL window appears in at least one OTHER document — catches
    * shared boilerplate/quotation SPANS that whole-document Jaccard
    * (q_neardup) deliberately ignores. Per doc: window count, duplicated
    * window count, duplicated fraction (the filter signal).
    *
    * Scale shape: one explode (corpus token count × 1 row per window
    * start), one span-keyed exchange for the distinct-doc count, one
    * span-keyed join back. No suffix array, no sort — the hashed-span
    * exchange IS the suffix-array replacement at cluster scale. The
    * join key here is the span STRING for oracle parity; at 100 TB the
    * drop-in optimization is xxhash64(span) keys (the q_neardup
    * pattern) plus the df-cap broadcast anti-join for Zipf-head spans. */
  val qDedupSubstring = Q(
    "q_dedup_substring",
    """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |p AS (SELECT doc_id, ws, unnest(range(1, len(ws) - 6)) AS pos
      |      FROM w WHERE len(ws) >= 8),
      |spans AS (SELECT doc_id, pos,
      |            array_to_string(list_slice(ws, pos, pos + 7), ' ') AS span
      |          FROM p),
      |dup AS (SELECT span FROM spans GROUP BY span
      |        HAVING count(DISTINCT doc_id) >= 2)
      |SELECT s.doc_id,
      |  CAST(count(*) AS BIGINT) AS n_spans,
      |  CAST(sum(CASE WHEN d.span IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
      |  round(CAST(sum(CASE WHEN d.span IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |        / count(*), 4) AS dup_frac
      |FROM spans s LEFT JOIN dup d USING (span)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    substringSpanStats(Tables.documents(s, d)).orderBy("doc_id")
  }

  /** The q_dedup_substring pipeline as a reusable stage — also driven
    * by TrainingScaleProbe, so the SCALING.md row measures exactly this
    * shape (no drift between the key and its measurement). */
  private[graft] def substringSpanStats(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ws = graft.functions.TextOps.tokens(col("text"))
    val spans = docs
      .select(col("doc_id"), ws.as("__ws"))
      .filter(size(col("__ws")) >= 8)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("__ws")) - 7)).as("pos"), col("__ws"))
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", slice(col("__ws"), col("pos"), lit(8))).as("span"))
    val dup = spans.groupBy("span")
      .agg(countDistinct("doc_id").as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("span"), lit(1).as("__dup"))
    spans.join(dup, Seq("span"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("bigint").as("n_spans"),
        sum(coalesce(col("__dup"), lit(0))).cast("bigint").as("n_dup_spans"),
        round(sum(coalesce(col("__dup"), lit(0))).cast("double")
          / count(lit(1)), 4).as("dup_frac"))
  }

  /** Distributed quantile binning — curriculum/difficulty bucketing
    * without the single-task trap: exact quartile boundaries of the
    * type-token ratio are computed once (a 3-double aggregate), then
    * every document bins MAP-SIDE against the broadcast boundaries.
    * The naive formulation, `ntile(4) OVER (ORDER BY score)`, is an
    * unpartitioned window — one task sorts the corpus; this shape
    * scales as scan + broadcast + 4-row aggregate at any size. Both
    * engines interpolate quantiles identically (q_agg_percentile pins
    * that), and binning compares 4-decimal-rounded values on both
    * sides so a 1e-16 interpolation difference cannot flip a boundary
    * tie. */
  val qQualityBins = Q(
    "q_quality_bins",
    """WITH t AS (SELECT doc_id,
      |  round(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
      |        / len(string_split(text,' ')), 4) AS ttr FROM documents),
      |b AS (SELECT round(quantile_cont(ttr, 0.25), 4) AS b1,
      |             round(quantile_cont(ttr, 0.50), 4) AS b2,
      |             round(quantile_cont(ttr, 0.75), 4) AS b3 FROM t)
      |SELECT CAST(1 + CAST(ttr > b1 AS INT) + CAST(ttr > b2 AS INT)
      |            + CAST(ttr > b3 AS INT) AS BIGINT) AS bin,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       round(min(ttr), 4) AS min_ttr,
      |       round(max(ttr), 4) AS max_ttr
      |FROM t, b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val ws = graft.functions.TextOps.tokens(col("text"))
    val t = Tables.documents(s, d).select(col("doc_id"),
      round(size(array_distinct(ws)).cast("double") / size(ws), 4).as("ttr"))
    val b = t.agg(
      round(expr("percentile(ttr, 0.25)"), 4).as("b1"),
      round(expr("percentile(ttr, 0.50)"), 4).as("b2"),
      round(expr("percentile(ttr, 0.75)"), 4).as("b3"))
    t.crossJoin(broadcast(b))
      .select(col("ttr"),
        (lit(1) + (col("ttr") > col("b1")).cast("int")
          + (col("ttr") > col("b2")).cast("int")
          + (col("ttr") > col("b3")).cast("int")).cast("bigint").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        round(min("ttr"), 4).as("min_ttr"),
        round(max("ttr"), 4).as("max_ttr"))
      .orderBy("bin")
  }

  val all: Seq[Q] = Seq(qDocChunks, qTextRepetition, qLmScore, qPackSequences,
    qTfidf, qVocabCoverage, qLmBigram, qDedupSubstring, qQualityBins)
}
