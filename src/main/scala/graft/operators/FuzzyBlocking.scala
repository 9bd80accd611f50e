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
    * `a < b`).
    *
    * SCALE DOMAIN: the band is the LENGTH, so this blocks well only
    * when lengths are spread. A uniform-length vocabulary (fixed-width
    * ids, codes) collapses into ONE band — the quadratic comes back
    * whole. That regime is [[segmentPairs]]'s domain. */
  def bandedPairs(left: DataFrame, right: DataFrame,
      maxDist: Int): DataFrame = {
    val anchors = left.select(col("a"), length(col("a")).as("bucket"))
    val probes = right.select(col("b"),
      explode(sequence(length(col("b")) - maxDist,
        length(col("b")) + maxDist)).as("bucket"))
    anchors.join(probes, "bucket")
      .withColumn("edit_dist", boundedDist(maxDist))
      .filter(col("edit_dist") >= 0L)
      .select("a", "b", "edit_dist")
  }

  /** The verify step's distance expression: Spark's THRESHOLD
    * levenshtein (3-arg, SPARK-44125) computes a banded O(maxDist·n)
    * DP instead of the full O(n²) table and returns −1 past the bound.
    * For qualifying pairs the returned value IS the true distance, so
    * the (a, b, edit_dist) contract (and every DuckDB oracle computing
    * plain `levenshtein(...) <= d`) is unchanged. Measured honestly:
    * at the registry's ~30-char part names the bench delta is inside
    * noise (candidate generation dominates the verify DP) — the win is
    * structural and matters for LONG strings (document titles,
    * addresses), where the full table is O(n²) per candidate. */
  private def boundedDist(maxDist: Int): org.apache.spark.sql.Column =
    levenshtein(col("a"), col("b"), maxDist).cast("bigint")

  /** [[bandedPairs]]'s answer for the uniform-length regime —
    * PIGEONHOLE SEGMENT blocking (the PassJoin family, Li/Deng/Feng
    * PVLDB'11): partition every left name into maxDist+1 disjoint
    * segments; if ed(a, b) ≤ maxDist then at most maxDist edits touch
    * a's segments, so AT LEAST ONE segment survives untouched and
    * appears in b verbatim, shifted by at most the net indel balance
    * before it (≤ maxDist). The join key is therefore
    * (segment id, anchor length, segment STRING) — content, not
    * length — and b probes each segment slot with its substrings at
    * the ≤ 2·maxDist+1 allowed positions for each of the 2·maxDist+1
    * compatible anchor lengths: a CONSTANT ≈ (d+1)·(2d+1)² fan-out
    * per probe row (75 at d=2) against a hash-partitioned equi-join,
    * independent of how lengths are distributed. Candidates dedupe on
    * (a, b) BEFORE the levenshtein verify (a pair can match on
    * several segments).
    *
    * Left names shorter than maxDist+1 characters cannot yield
    * maxDist+1 non-empty segments; they route through [[bandedPairs]]
    * against the whole right side — with ≤ maxDist-char names the
    * length band keeps that residual sub-quadratic in any real
    * vocabulary (document-scale name sets hold few 1–2-char names;
    * a vocabulary made ENTIRELY of them has ≤ |Σ|^d members).
    * Same contract as bandedPairs: (a, b, edit_dist), self-pairs
    * included. */
  def segmentPairs(left: DataFrame, right: DataFrame,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val k = maxDist + 1
    val shortLeft = left.filter(length(col("a")) < k)
    val longLeft = left.filter(length(col("a")) >= k)
    // index side: (seg_id, l, seg) per long left name. Segment i of a
    // length-l name: len_i = l DIV k + (1 if i < l MOD k), start_i =
    // i·(l DIV k) + min(i, l MOD k) — first (l MOD k) segments longer.
    val segs = longLeft
      .select(col("a"), length(col("a")).as("l"),
        explode(sequence(lit(0), lit(k - 1))).as("seg_id"))
      .withColumn("seg_len",
        expr(s"l DIV $k") + when(col("seg_id") < expr(s"l % $k"), 1)
          .otherwise(0))
      .withColumn("seg_start",
        col("seg_id") * expr(s"l DIV $k") +
          least(col("seg_id"), expr(s"l % $k")))
      .withColumn("seg",
        expr("substring(a, seg_start + 1, seg_len)"))
      .select(col("a"), col("l"), col("seg_id"), col("seg"))
    // probe side: for each compatible anchor length l' and segment
    // slot, every substring of b with that slot's length at positions
    // within ±maxDist of the slot's start (clipped to b's bounds)
    val probes = right
      .select(col("b"), length(col("b")).as("lb"),
        explode(sequence(length(col("b")) - maxDist,
          length(col("b")) + maxDist)).as("l"))
      .filter(col("l") >= k)
      .select(col("b"), col("lb"), col("l"),
        explode(sequence(lit(0), lit(k - 1))).as("seg_id"))
      .withColumn("seg_len",
        expr(s"l DIV $k") + when(col("seg_id") < expr(s"l % $k"), 1)
          .otherwise(0))
      .withColumn("seg_start",
        col("seg_id") * expr(s"l DIV $k") +
          least(col("seg_id"), expr(s"l % $k")))
      // position window clipped to b's bounds; an empty window (b too
      // short for this slot) must yield NO rows — Spark's sequence()
      // would otherwise count DOWNWARD from lo past hi
      .withColumn("__lo", greatest(col("seg_start") - maxDist, lit(0)))
      .withColumn("__hi",
        least(col("seg_start") + maxDist, col("lb") - col("seg_len")))
      .filter(col("__lo") <= col("__hi"))
      .select(col("b"), col("l"), col("seg_id"),
        explode(sequence(col("__lo"), col("__hi"))).as("p"),
        col("seg_len"))
      .withColumn("seg", expr("substring(b, p + 1, seg_len)"))
      .select(col("b"), col("l"), col("seg_id"), col("seg"))
    val longPairs = segs.join(probes, Seq("l", "seg_id", "seg"))
      .select("a", "b").distinct()
      .withColumn("edit_dist", boundedDist(maxDist))
      .filter(col("edit_dist") >= 0L)
    bandedPairs(shortLeft, right, maxDist).unionByName(longPairs)
  }

  /** Measured crossover (SegmentBlockingProbe, SCALING.md): banding's
    * lower constant wins small bands; segment blocking wins from a few
    * thousand names per band (already 8x at 5k, 150x at 20k, and the
    * only entrant at 100k). The threshold sits well below the measured
    * crossover's pain point on purpose — the cost of segment blocking
    * on a small band is a fraction of a second, while banding a big
    * one is quadratic. */
  val DefaultSegmentThreshold: Long = 2000L

  /** Auto-dispatching banded-vs-segment blocking: pick
    * [[segmentPairs]] when some left length's ±maxDist window holds
    * more than `segmentThreshold` RIGHT names (the population that
    * actually meets in a band join), else [[bandedPairs]]. Dispatch
    * metadata is two vocabulary-of-lengths aggregates (driver-read,
    * bounded by distinct lengths — tens of rows), the
    * `Funnel.runAuto` measured-crossover pattern; both formulations
    * return the identical pair set (PropertySpec-pinned), so dispatch
    * can only change the plan, never the answer.
    *
    * EAGER: the two dispatch aggregates run Spark jobs when this frame
    * is BUILT, not when it is first consumed (same stance as
    * `Funnel.runAuto`'s measured dispatch — the histogram read is the
    * price of picking the right plan). Null names are dropped here
    * (a null can never satisfy `levenshtein ≤ d`, and the histogram's
    * driver read would NPE on a null length), so callers need not
    * pre-filter. */
  def pairs(left: DataFrame, right: DataFrame, maxDist: Int,
      segmentThreshold: Long = DefaultSegmentThreshold): DataFrame = {
    val l = left.filter(col("a").isNotNull)
    val r = right.filter(col("b").isNotNull)
    val rightHist = r.groupBy(length(col("b")).as("l"))
      .agg(count(lit(1)).as("n"))
      .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
    val leftLens = l.select(length(col("a")).as("l")).distinct()
      .collect().map(_.getInt(0))
    val maxWindow = leftLens.foldLeft(0L) { (m, len) =>
      math.max(m,
        ((len - maxDist) to (len + maxDist)).map(rightHist.getOrElse(_, 0L)).sum)
    }
    if (maxWindow > segmentThreshold) segmentPairs(l, r, maxDist)
    else bandedPairs(l, r, maxDist)
  }
}
