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

  val all: Seq[Q] = Seq(qDocChunks, qTextRepetition, qLmScore, qPackSequences,
    qTfidf, qVocabCoverage, qLmBigram)
}
