package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked full-text search — the engine-native analogue of the Postgres
  * FTS surface the reference ships by delegation (its `executeSql` choke
  * point, `automated-data-catalog-&-etl/services/pgliteService.ts:36-49`,
  * exposes the full Postgres dialect including `to_tsvector`/`ts_rank`;
  * keyword search is the first query a catalog user runs against a
  * documents table).
  *
  * Formulation: BM25 (Robertson–Spärck Jones idf with the standard
  * +1 smoothing, k1/b length normalization) over whitespace tokens.
  * tf-idf is the k1→∞, b=0 degenerate case; BM25 is what Lucene /
  * Elasticsearch ship as the default ranking, and every factor is plain
  * SQL arithmetic, so a DuckDB oracle can recompute it exactly.
  *
  * Scale shape (the reason this is NOT a `text LIKE '%term%'` scan):
  *  - tokenize+filter runs map-side (explode → IN-set filter, codegen);
  *    only rows containing a query term survive — at most
  *    |terms| rows per doc enter the first shuffle;
  *  - term frequencies: one hash aggregate keyed (doc, term) with
  *    map-side partial combine; document length rides along in the same
  *    pass (no second join against a lengths table);
  *  - document frequencies: an aggregate over the tf rows — the result
  *    is |terms|-sized and BROADCAST back, so the per-doc scoring join
  *    never shuffles the corpus side;
  *  - corpus stats (N, avgdl) are one scalar row, broadcast via cross
  *    join;
  *  - final top-k is TakeOrderedAndProject (per-partition heap + k-row
  *    driver merge), never a global sort.
  * At 100 TB the only corpus-sized exchanges are the two hash
  * aggregates, both keyed by (doc, term) / doc with bounded per-key
  * cardinality — no skew pile-up, no all-pairs anything.
  */
object TextSearch {

  /** BM25 length-normalization defaults (the Lucene/ES defaults). */
  val K1 = 1.2
  val B = 0.75

  /** Top-`topK` documents for a bag-of-terms query, scored by BM25.
    *
    * Determinism contract (registry rules): the returned `score` is
    * rounded to 4 decimals and BOTH the cutoff and the rank are computed
    * on the rounded score with id tie-break, so Spark and a DuckDB
    * oracle rank identically even under last-ulp double drift.
    *
    * @param requireAll conjunctive match (Postgres `to_tsquery('a & b')`
    *   semantics): only documents containing EVERY distinct query term
    *   are scored — one extra count over the tf rows the OR path already
    *   aggregates, zero additional shuffles
    * @return (idCol, score, rnk) — rnk 1..topK, ordered by rnk
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], topK: Int = 20, requireAll: Boolean = false): DataFrame = {
    require(terms.nonEmpty, "bm25: empty term set")
    val ws = TextOps.tokens(col(textCol))
    // id, doc length, tokens — single projection feeding stats and tf.
    // Null text is dropped (not coalesced): Spark's size(split(NULL))
    // is -1 while SQL engines skip NULL in avg(), so a null row would
    // skew __n/__avgdl on one side only; "no text" means "not in the
    // corpus" for ranking purposes, and the oracle filters identically.
    val base = docs.filter(col(textCol).isNotNull).select(
      col(idCol).as("__id"),
      size(ws).cast("double").as("__dl"),
      ws.as("__ws"))
    // one scalar row: corpus size + average doc length
    val stats = base.agg(
      count(lit(1)).cast("double").as("__n"), avg("__dl").as("__avgdl"))
    // (doc, term) frequencies; dl tags along so no extra lengths join.
    // The IN-set filter runs before the aggregate: non-query tokens
    // never leave the map side.
    // materialized once: tf feeds both the df aggregate and the scoring
    // join — without this the whole tokenize+explode pipeline (the
    // dominant cost at corpus scale) runs twice; the checkpoint itself
    // is narrow (≤ |terms| rows per matching doc)
    val tf = base
      .select(col("__id"), col("__dl"), explode(col("__ws")).as("word"))
      .filter(col("word").isInCollection(terms))
      .groupBy("__id", "word")
      .agg(count(lit(1)).cast("double").as("tf"), first("__dl").as("dl"))
      .localCheckpoint(true)
    // document frequency per term — |terms| rows, broadcast
    val dfreq = tf.groupBy("word").agg(count(lit(1)).cast("double").as("df"))
    // arithmetic written in the same shape as the oracle SQL so both
    // engines evaluate identical IEEE expression trees (round(.,4)
    // absorbs any residual last-ulp drift)
    val idf = log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5))
    val contrib = idf * (col("tf") * (lit(K1) + 1)) /
      (col("tf") + lit(K1) * (lit(1.0) - B + lit(B) * col("dl") / col("__avgdl")))
    val scoredAll = tf
      .join(broadcast(dfreq), "word")
      .crossJoin(broadcast(stats))
      .groupBy("__id")
      .agg(round(sum(contrib), 4).as("score"),
        count(lit(1)).as("__nterms")) // distinct query terms present (tf is (doc,term) grain)
    val scored = (if (requireAll)
      scoredAll.filter(col("__nterms") === terms.distinct.size)
    else scoredAll).drop("__nterms")
    // rank on the ROUNDED score; limit first (heap top-k), then number
    // the k survivors — the single-partition window sees topK rows only
    scored
      .orderBy(col("score").desc, col("__id").asc).limit(topK)
      .withColumn("rnk", graft.functions.BoundedRank.rowNumberBounded(
        col("__id"), col("score").desc, col("__id").asc).cast("bigint"))
      .withColumnRenamed("__id", idCol)
      .orderBy("rnk")
  }

  /** Phrase search — Postgres `to_tsquery('a <-> b')` adjacency
    * semantics (pgliteService.ts:36-49 reaches it through the passthrough
    * dialect): rank documents containing the terms CONTIGUOUSLY in
    * order, scored by BM25 with the whole phrase as a single synthetic
    * term (tf = number of phrase occurrences, df = number of documents
    * with ≥1 occurrence — the standard Lucene PhraseQuery formulation).
    *
    * Adjacency without a positional self-join: each phrase-term token at
    * position p fans out map-side to the candidate ANCHOR positions it
    * could start from — (p - off) for every offset `off` the word
    * occupies in the phrase (repeated words fan to several). A phrase
    * occurrence starting at anchor a contributes all L distinct offsets
    * to group (doc, a), so `count(DISTINCT off) = L` identifies matches
    * in ONE hash aggregate with ≤L-sized per-key state. Scale shape:
    * only phrase-term tokens leave the map side (same pruning as bm25's
    * IN filter), the aggregate is (doc, anchor)-keyed with bounded
    * per-key cardinality, and df/stats are broadcast scalars — no
    * token-level self-join, no corpus-sized window, skew-immune.
    *
    * @return (idCol, score, rnk) — rnk 1..topK over round(score, 4)
    *   with id tie-break, same determinism contract as [[bm25]] */
  def phrase(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], topK: Int = 20): DataFrame = {
    require(terms.size >= 2, "phrase: need >= 2 terms (use bm25 for one)")
    phraseAt(docs, idCol, textCol, terms.zipWithIndex, topK)
  }

  /** Positional phrase with EXPLICIT offsets — the general form behind
    * [[phrase]] (consecutive offsets) and Postgres's distance operator
    * (`a <N> b` = offsets (a,0),(b,N), `pgliteService.ts:36-49`
    * passthrough dialect): a document matches where, for some anchor
    * position p, every (term, off) pair has `term` at token position
    * p + off. Same plan as [[phrase]] — the offsets just aren't
    * consecutive: map-side anchor fan-out, ONE (doc, anchor) aggregate
    * with ≤|pairs| per-key state, BM25 on the occurrence count. */
  def phraseAt(docs: DataFrame, idCol: String, textCol: String,
      termOffsets: Seq[(String, Int)], topK: Int = 20): DataFrame = {
    require(termOffsets.size >= 2, "phraseAt: need >= 2 (term, offset) pairs")
    require(termOffsets.map(_._2).distinct.size == termOffsets.size,
      "phraseAt: offsets must be distinct (one term per position)")
    val spark = docs.sparkSession
    val terms = termOffsets.map(_._1)
    val L = termOffsets.size
    val ws = TextOps.tokens(col(textCol))
    val base = docs.filter(col(textCol).isNotNull).select(
      col(idCol).as("__id"),
      size(ws).cast("double").as("__dl"),
      ws.as("__ws"))
    val stats = base.agg(
      count(lit(1)).cast("double").as("__n"), avg("__dl").as("__avgdl"))
    // phrase-sized (word → offset) table; a word at several offsets
    // yields several rows, so the broadcast join below IS the fan-out
    val offsets = spark.createDataFrame(termOffsets).toDF("word", "off")
    val cand = base
      .select(col("__id"), col("__dl"),
        posexplode(col("__ws")).as(Seq("pos", "word")))
      .filter(col("word").isInCollection(terms)) // map-side prune
      .join(broadcast(offsets), "word")
      .select(col("__id"), col("__dl"),
        (col("pos") - col("off")).as("anchor"), col("off"))
      .filter(col("anchor") >= 0)
    // one aggregate: a (doc, anchor) group holding ALL L offsets is a
    // phrase occurrence starting at that anchor
    val ptf = cand.groupBy("__id", "anchor")
      .agg(countDistinct("off").as("__c"), first("__dl").as("dl"))
      .filter(col("__c") === L)
      .groupBy("__id")
      .agg(count(lit(1)).cast("double").as("tf"), first("dl").as("dl"))
      .localCheckpoint(true) // feeds both the df count and the scoring
    val dfreq = ptf.agg(count(lit(1)).cast("double").as("df")) // scalar
    val idf = log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5))
    val contrib = idf * (col("tf") * (lit(K1) + 1)) /
      (col("tf") + lit(K1) * (lit(1.0) - B + lit(B) * col("dl") / col("__avgdl")))
    ptf.crossJoin(broadcast(dfreq))
      .crossJoin(broadcast(stats))
      .select(col("__id"), round(contrib, 4).as("score"))
      .orderBy(col("score").desc, col("__id").asc).limit(topK)
      .withColumn("rnk", graft.functions.BoundedRank.rowNumberBounded(
        col("__id"), col("score").desc, col("__id").asc).cast("bigint"))
      .withColumnRenamed("__id", idCol)
      .orderBy("rnk")
  }

  /** Batched BM25: one job scoring a whole batch of queries — the shape
    * a catalog serving real users runs (per-query jobs would re-tokenize
    * the corpus per query; here the corpus-side work is paid ONCE for
    * the batch).
    *
    * `queries` is (queryIdCol, termCol), one row per (query, term) —
    * batch-sized, broadcast twice (term filter + per-query fan-out).
    * Plan vs the single-query operator: identical corpus-side pipeline
    * (map-side term filter over the union of all terms → one (doc, term)
    * hash aggregate), then each query picks up its own terms' rows by a
    * broadcast equi-join on term, so per-query scores are grouped by
    * (query, doc) without any additional corpus shuffle. df/avgdl are
    * corpus-global, so every per-query ranking equals what [[bm25]]
    * returns for that query's terms (pinned in ExtensionsSpec).
    *
    * @return (queryIdCol, idCol, score, rnk) — rnk 1..topK per query
    */
  def bm25Batch(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String,
      topK: Int = 20): DataFrame = {
    val ws = TextOps.tokens(col(textCol))
    val base = docs.filter(col(textCol).isNotNull).select(
      col(idCol).as("__id"),
      size(ws).cast("double").as("__dl"),
      ws.as("__ws"))
    val stats = base.agg(
      count(lit(1)).cast("double").as("__n"), avg("__dl").as("__avgdl"))
    val batch = queries
      .select(col(queryIdCol).as("__qid"), col(termCol).as("word")).distinct()
    val termSet = batch.select("word").distinct()
    val tf = base
      .select(col("__id"), col("__dl"), explode(col("__ws")).as("word"))
      .join(broadcast(termSet), "word") // map-side semi filter on the batch vocabulary
      .groupBy("__id", "word")
      .agg(count(lit(1)).cast("double").as("tf"), first("__dl").as("dl"))
      .localCheckpoint(true)
    val dfreq = tf.groupBy("word").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5))
    val contrib = idf * (col("tf") * (lit(K1) + 1)) /
      (col("tf") + lit(K1) * (lit(1.0) - B + lit(B) * col("dl") / col("__avgdl")))
    val perQuery = Window.partitionBy("__qid")
      .orderBy(col("score").desc, col("__id").asc)
    tf.join(broadcast(dfreq), "word")
      .crossJoin(broadcast(stats))
      .join(broadcast(batch), "word") // fan (doc,term) rows out to the queries that asked
      .groupBy("__qid", "__id")
      .agg(round(sum(contrib), 4).as("score"))
      .withColumn("rnk", row_number().over(perQuery).cast("bigint"))
      .filter(col("rnk") <= topK)
      .withColumnRenamed("__qid", queryIdCol)
      .withColumnRenamed("__id", idCol)
      .orderBy(queryIdCol, "rnk")
  }
}
