package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Sliding-window document chunking — the context-window splitter every
  * training / RAG ingestion pipeline runs before embedding or packing:
  * each document's token stream becomes overlapping windows of `window`
  * tokens advancing by `stride` (overlap = window - stride).
  *
  * Chunk k covers 1-based token positions [k*stride+1, k*stride+window],
  * for k in 0..max(ceil((n-window)/stride), 0) — so every token is
  * covered, the final chunk may be short, and a document shorter than
  * `window` yields exactly one chunk.
  *
  * Scale design (100 TB stance): pure map-side — tokenize, explode a
  * `sequence` of chunk ids, `slice` the shared token array. No shuffle,
  * no window function, stays in whole-stage codegen; output size is
  * input tokens × (window/stride) amortized, emitted streaming per
  * input row (never materializing all chunks of a partition at once).
  *
  * Reference surface: the reference app truncates documents for display
  * only (App.tsx preview path); chunking is part of the extension
  * surface (SURVEY.md §2.4) the training-data pipeline needs.
  */
object Chunking {

  /** Adds one row per (document, chunk): `chunk_id` (0-based),
    * `chunk_start` (1-based token offset), `n_chunk_tokens`,
    * `chunk_text`. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      window: Int = 32, stride: Int = 24): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val ws = col("__ws")
    // last chunk id: ceil((n - window) / stride), floored at 0
    val lastChunk = greatest(
      ceil((size(ws) - window).cast("double") / stride).cast("bigint"), lit(0L))
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("__ws"))
      // a null/empty-text doc has NO chunks — without this filter the
      // lastChunk floor still emits one spurious row whose
      // n_chunk_tokens is size(NULL) = -1 and whose chunk_text is "",
      // poisoning downstream token accounting
      .filter(size(ws) > 0)
      .select(col(idCol), ws, explode(sequence(lit(0L), lastChunk)).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id"),
        (col("chunk_id") * stride + 1).cast("bigint").as("chunk_start"),
        slice(ws, (col("chunk_id") * stride + 1).cast("int"), lit(window)).as("__chunk"))
      .select(
        col(idCol), col("chunk_id"), col("chunk_start"),
        size(col("__chunk")).cast("bigint").as("n_chunk_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }
}
