package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-mixture weighting — rebalance a multi-source corpus to TARGET
  * proportions (the "data mix" step of every pretraining pipeline: so
  * much web, so much code, so much reference text): given per-source
  * target weights, keep the LARGEST total corpus whose source shares
  * hit the targets without oversampling any source, then select rows
  * deterministically.
  *
  * The solve: with counts c_s and normalized weights w_s, the largest
  * feasible total is N = min_s(c_s / w_s); source s keeps fraction
  * w_s·N / c_s ≤ 1 (the binding source keeps everything, abundant
  * sources downsample). Selection is [[graft.functions.PortableHash]]
  * per-mille thresholds — a pure function of the key, so the mix is
  * re-runnable and join-stable, and a DuckDB oracle recomputes the
  * identical subset.
  *
  * Scale shape: the solve reads one catalog-sized count aggregate; the
  * application is a map-side filter (threshold CASE + mixer, codegen)
  * — no shuffle beyond the count. */
object MixtureWeighting {

  /** Per-source per-mille keep-thresholds (0..1000). `counts` from a
    * groupBy; `targets` need not be normalized. Sources absent from
    * `targets` are dropped entirely (threshold 0 by omission). */
  def solveThresholds(counts: Map[String, Long],
      targets: Map[String, Double]): Map[String, Long] = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "mixture targets must be positive")
    val wsum = targets.values.sum
    val norm = targets.view.mapValues(_ / wsum).toMap
    norm.keys.foreach(s => require(counts.getOrElse(s, 0L) > 0L,
      s"mixture target source '$s' has no rows"))
    val n = norm.map { case (s, w) => counts(s).toDouble / w }.min
    norm.map { case (s, w) =>
      // floor at per-mille granularity; identical IEEE expression order
      // as the oracle: min(1, w*N/c) * 1000. The 1e-9 epsilon (same as
      // temperatureSample) keeps the BINDING source at threshold 1000:
      // w*(c/w)/c re-rounds at every op and can land a few ulps under
      // 1.0, and without the epsilon the source the solve promises
      // keeps everything would floor to 999 and drop ~1 per mille
      s -> math.floor(
        math.min(1.0, w * n / counts(s).toDouble) * 1000 + 1e-9).toLong
    }
  }

  /** The rebalanced corpus: target sources filtered to their
    * thresholds, everything else dropped. */
  def sample(df: DataFrame, sourceCol: String, keyCol: String,
      targets: Map[String, Double]): DataFrame = {
    val counts = df.groupBy(sourceCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val thr = solveThresholds(counts, targets)
    applyThresholds(df, sourceCol, keyCol, thr)
  }

  /** Temperature-flattened mixture (the multilingual-pretraining
    * rebalance, e.g. mC4/XLM-R): sampling weight ∝ c_s^α with α ∈
    * [0, 1] — α=1 keeps natural proportions, α=0 equalizes sources.
    * Substituting w_s = c_s^α into the largest-feasible-total solve
    * collapses to a closed form with the normalizer cancelled:
    *
    *   keep_s = min(1, (c_min / c_s)^(1−α))
    *
    * so the smallest source keeps everything and abundant sources
    * downsample toward it. The per-mille floor adds a 1e-9 epsilon
    * because the oracle recomputes pow() in another engine's libm —
    * a last-ulp difference must not straddle the floor boundary. */
  def temperatureSample(df: DataFrame, sourceCol: String, keyCol: String,
      alpha: Double): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(sourceCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperature mixture over an empty corpus")
    val cmin = counts.values.min.toDouble
    val thr = counts.map { case (s, c) =>
      s -> math.floor(
        math.min(1.0, math.pow(cmin / c.toDouble, 1 - alpha)) * 1000 + 1e-9).toLong
    }
    applyThresholds(df, sourceCol, keyCol, thr)
  }

  private def applyThresholds(df: DataFrame, sourceCol: String,
      keyCol: String, thr: Map[String, Long]): DataFrame = {
    val thrCol = thr.toSeq.sortBy(_._1).foldLeft(lit(-1L)) {
      case (acc, (s, t)) => when(col(sourceCol) === s, lit(t)).otherwise(acc)
    }
    df.filter(graft.functions.PortableHash.permille(col(keyCol)) < thrCol)
  }
}
