package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009): fuse
  * any number of ranked candidate lists into one ranking by
  * score(d) = Σ_lists 1/(k0 + rank_list(d)), missing entries contribute
  * 0. The standard hybrid-retrieval combiner (lexical BM25 + vector
  * cosine being the canonical pair) — rank-based, so the lists' score
  * scales never need calibrating against each other.
  *
  * Scale shape: the inputs are already top-k lists (each bounded by its
  * own retrieval operator), so the fusion joins and ranks O(Σ topK)
  * rows — driver-trivial at any corpus size; the heavy lifting stays in
  * the upstream retrieval plans. The global rank window here is
  * single-partition BY DESIGN: its input is the fused candidate set,
  * never the corpus.
  */
object HybridSearch {

  /** @param lists (name, ranked DataFrame) pairs; each frame carries
    *   `idCol` and `rankCol` (rank 1 = best). Output: one row per fused
    *   candidate with per-list ranks as `rnk_<name>` (null when the list
    *   missed it), `rrf` rounded to 6, and the fused `rnk`. */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String, rankCol: String,
      k0: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val renamed = lists.map { case (n, df) =>
      df.select(col(idCol), col(rankCol).cast("bigint").as(s"rnk_$n"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    // ranks are small ints, so 1/(k0+r) is the same IEEE double on any
    // engine; ranking on the ROUNDED score with id tie-break keeps the
    // result hash-stable across engines and partitionings
    val rrf = round(
      lists.map { case (n, _) =>
        coalesce(lit(1.0) / (lit(k0) + col(s"rnk_$n")), lit(0.0))
      }.reduce(_ + _), 6)
    // the fused candidate set is bounded by the union of the input rank
    // lists (≤ Σ list sizes), so single-partition ranking is intended
    joined.withColumn("rrf", rrf)
      .withColumn("rnk", graft.functions.BoundedRank.rowNumberBounded(
        col(idCol), col("rrf").desc, col(idCol)).cast("bigint"))
      .filter(col("rnk") <= topK)
      .orderBy("rnk")
  }
}
