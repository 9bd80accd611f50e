package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The length-band blocking primitive the whole fuzzy family shares
  * (q_fuzzy_match, q_entity_resolution, IncrementalEntityResolution):
  * all (a, b) pairs within Levenshtein `maxDist`, realized as a LOSSLESS
  * length-band EQUI-join — edit distance ≥ length difference, so each
  * left name anchors at its own length while each right name probes its
  * ±maxDist buckets via a (2·maxDist+1)-way explode; the quadratic is
  * banded and hash-partitioned by bucket instead of a nested-loop range
  * join, and levenshtein (codegen built-in) runs only inside bands.
  * One shared implementation so the band math cannot drift between the
  * keys (the DuckDB oracles and `q_gate_er_incremental`'s rebuild keep
  * their own derivations — those are deliberately independent). */
object FuzzyBlocking {

  /** (a, b, edit_dist) for every cross pair of `left.a` × `right.b`
    * with levenshtein ≤ maxDist (self-pairs included when the inputs
    * overlap — callers wanting canonical unordered pairs filter
    * `a < b`). */
  def bandedPairs(left: DataFrame, right: DataFrame,
      maxDist: Int): DataFrame = {
    val anchors = left.select(col("a"), length(col("a")).as("bucket"))
    val probes = right.select(col("b"),
      explode(sequence(length(col("b")) - maxDist,
        length(col("b")) + maxDist)).as("bucket"))
    anchors.join(probes, "bucket")
      .withColumn("edit_dist", levenshtein(col("a"), col("b")).cast("bigint"))
      .filter(col("edit_dist") <= maxDist)
      .select("a", "b", "edit_dist")
  }
}
