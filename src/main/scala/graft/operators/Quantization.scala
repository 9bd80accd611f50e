package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the storage/IO lever for vector
  * search at corpus scale: a float32 embedding column shrinks 4× when
  * stored as (scale: float, q: array<tinyint>), which at the 100 TB
  * stance is the difference between an ANN scan that is IO-bound and
  * one that fits page cache. Symmetric per-vector quantization:
  * scale = max|x| / 127, q_i = round(x_i / scale) ∈ [-127, 127].
  *
  * Cosine similarity is SCALE-INVARIANT, so ranking by cosine over the
  * quantized integers approximates the float ranking with per-element
  * error ≤ scale/2 and needs NO dequantization in the search loop — the
  * quantized arrays feed the same fused cosine expression
  * (graft.functions.CosineSimilarityExpr) after a cast the optimizer
  * folds into the scan projection.
  *
  * Quantization is a build-time transform (runs once per index build,
  * not per query); the higher-order-function lambdas here are off the
  * search hot path by construction.
  */
object Quantization {

  /** (scale, q) struct for one embedding; the all-zero vector
    * quantizes to scale 0 with all-zero codes. */
  def int8(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x)))
    val scale = (maxAbs / lit(127.0f)).cast("float")
    struct(
      scale.as("scale"),
      when(maxAbs === 0f, transform(vec, _ => lit(0).cast("tinyint")))
        .otherwise(transform(vec, x => round(x / scale).cast("tinyint")))
        .as("q"))
  }

  /** Dequantized float vector (storage round-trip; error ≤ scale/2 per
    * element). */
  def dequantize(quantized: Column): Column =
    transform(quantized.getField("q"),
      q => (q.cast("float") * quantized.getField("scale")).cast("float"))

  /** Quantized codes as array<float> — the form the fused cosine
    * expression consumes; exact (every int8 is float-representable). */
  def codesAsFloat(quantized: Column): Column =
    transform(quantized.getField("q"), _.cast("float"))
}
