package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns, built on
  * higher-order functions (zip_with / aggregate) so they run inside
  * codegen with no UDF serialization. All math is promoted to DOUBLE —
  * keeps results identical across engines and partitionings (the
  * per-element sequence is fixed, so summation order is deterministic).
  *
  * Scale notes: brute-force cosine top-k is O(|probes|·|corpus|·dim) —
  * fine when one side is small enough to broadcast; the IVF path
  * (graft.queries.Extensions q_ann_ivf) prunes the corpus side to the
  * probe's nearest coarse centroids, which is the 100 TB shape: corpus
  * bucketed by centroid id, probes shuffled only to their nprobe buckets.
  */
object VectorOps {

  private def d(c: Column): Column = c.cast("double")

  /** Σ aᵢ·bᵢ, computed left-to-right in doubles. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + d(v) * d(v)))

  /** Cosine similarity in doubles; 0 for zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane LSH bucket for cosine similarity: `planes` sign
    * bits, each from a deterministic pseudo-random hyperplane derived by
    * hashing (plane, dim) — no stored model needed, any executor can
    * recompute the same plane. */
  def rhpBucket(a: Column, planes: Int = 8): Column =
    (0 until planes).map { p =>
      // pseudo-random weight per (plane, dim): xxhash64 → [-0.5, 0.5)
      val proj = aggregate(
        zip_with(a, sequence(lit(0), size(a) - 1),
          (x, i) => d(x) * (pmod(xxhash64(lit(p), i), lit(1000000L)).cast("double") / 1e6 - 0.5)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** `tables` independent hash tables of `planes` sign bits each — the
    * standard LSH-ANN configuration: a true neighbor needs to collide in
    * just ONE table, so recall is 1-(1-p^planes)^tables instead of a
    * single table's p^planes (the recall lever is `tables`, the
    * candidate-set-size lever is `planes`). Returns the array of per-
    * table bucket ids; table t's ids are offset by t·2^planes so buckets
    * never collide across tables and one explode+equi-join serves all
    * tables at once. Planes are seeded per (table, plane), model-free:
    * any executor recomputes the same hyperplanes from the hash. */
  def rhpBuckets(a: Column, planes: Int, tables: Int): Column =
    array((0 until tables).map { t =>
      (0 until planes).map { p =>
        val proj = aggregate(
          zip_with(a, sequence(lit(0), size(a) - 1),
            (x, i) => d(x) * (pmod(xxhash64(lit(t * 1024 + p), i), lit(1000000L))
              .cast("double") / 1e6 - 0.5)),
          lit(0.0), (acc, v) => acc + v)
        when(proj > 0, lit(1L << p)).otherwise(0L)
      }.reduce(_ + _) + lit(t.toLong << planes)
    }: _*)
}
