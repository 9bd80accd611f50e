package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the train/eval overlap check every
  * LLM training-data pipeline runs before shipping a corpus (the
  * n-gram-collision formulation popularized by the GPT-3/PaLM data
  * cards): a training document is CONTAMINATED when it shares at least
  * `minOverlap` distinct w-word shingles with any document of the
  * (small) evaluation set.
  *
  * Scale shape (100 TB corpus, benchmark-sized eval set): the eval
  * side's distinct shingles are benchmark-sized and BROADCAST, so the
  * corpus streams map-side through one broadcast hash join — no
  * corpus-side shuffle at all until the (corpus doc × eval doc)
  * overlap counts, whose input is only the matching shingle pairs
  * (collision-proportional, like the near-dup inverted index). Shingle
  * equality joins on xxhash64 of the shingle text — same trade as
  * near-dup: 64-bit collisions are ~10^-9 at 10^5 distinct shingles,
  * and the exact-text oracle agrees unless one actually occurs.
  */
object Decontamination {

  /** Per contaminated (corpus doc, eval doc) pair: the number of
    * shared distinct shingles.
    *
    * @param w           shingle width in words (8 is the usual
    *                    contamination gram; 3 matches near-dup)
    * @param minOverlap  pairs sharing fewer shingles are clean
    * @return (corpusIdCol, benchIdCol, n_shared); when both frames use
    *         the SAME id name (doc_id vs doc_id — nothing forbids it),
    *         the bench column comes back as `<benchId>_bench` so the
    *         result never carries an ambiguous duplicate column */
  def overlaps(corpus: DataFrame, corpusId: String, corpusText: String,
      bench: DataFrame, benchId: String, benchText: String,
      w: Int = 8, minOverlap: Int = 1): DataFrame = {
    val benchOut = if (benchId == corpusId) s"${benchId}_bench" else benchId
    val c = TextOps.shingleRows(corpus, corpusId, corpusText, w)
      .select(col(corpusId), xxhash64(col("shingle")).as("__s"))
    val b = TextOps.shingleRows(bench, benchId, benchText, w)
      .select(col(benchId).as("__bid"), xxhash64(col("shingle")).as("__s"))
    c.join(broadcast(b), "__s")
      .groupBy(col(corpusId), col("__bid"))
      .agg(count(lit(1)).cast("bigint").as("n_shared"))
      .filter(col("n_shared") >= minOverlap)
      .withColumnRenamed("__bid", benchOut)
  }

  /** The corpus minus everything [[overlaps]] flags — the decontaminated
    * training set. One broadcast-able anti-join on the flagged id set
    * (contamination is rare by construction, so the flagged side is
    * small even when the corpus is not). */
  def clean(corpus: DataFrame, corpusId: String, corpusText: String,
      bench: DataFrame, benchId: String, benchText: String,
      w: Int = 8, minOverlap: Int = 1): DataFrame = {
    val flagged = overlaps(corpus, corpusId, corpusText,
      bench, benchId, benchText, w, minOverlap)
      .select(col(corpusId)).distinct()
    corpus.join(flagged, Seq(corpusId), "left_anti")
  }
}
