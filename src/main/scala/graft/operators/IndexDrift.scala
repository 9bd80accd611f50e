package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Drift monitor for frozen-model incremental indexes (round-11 verdict
  * item #4). [[IncrementalEmbedDedup]]'s IVF-cell model is fit on the
  * FOUNDING batch and frozen by design (re-fitting would re-key every
  * stored row), so a corpus that drifts away from the founding geometry
  * silently decays recall: drifted vectors crowd into whatever cells
  * happen to be least-far, near-copies straddle cell boundaries the
  * founding model never saw, and the cell-pruned lookup stops meeting
  * them. Nothing in the ingest path fails — the decay is invisible
  * without a gauge.
  *
  * The gauge: the founding ingest persists the founding batch's
  * distance-to-assigned-centroid distribution (mean `d0`, population
  * stddev `sd0`) in the `_model` header. For any later batch, one
  * map-side aggregation computes the same statistic under the frozen
  * model and compares: a batch drawn from the founding geometry lands
  * within a few `sd0` of `d0` (the batch MEAN concentrates far tighter
  * than the per-row spread), while a drifted batch — vectors far from
  * every frozen centroid — shifts the mean by a large fraction of the
  * distance scale. Cost is one scan of the BATCH only (the model is a
  * driver-side literal; the stored index is never read), so the gauge
  * can run on every ingest at 100 TB.
  *
  * Fire rule: `batch_mean > d0 + max(3·sd0, slack)` — the 3·sd0 term
  * adapts to a founding corpus with genuinely wide spread, the absolute
  * `slack` floor keeps a near-zero-variance founding batch (e.g. all
  * duplicates) from firing on numeric noise.
  *
  * Scope note: the engine's OTHER frozen-state incremental index
  * ([[IncrementalNearDup]]'s MinHash band index) needs no drift gauge —
  * its partition function is content hashing, which is
  * distribution-free: band-collision recall depends only on pair
  * Jaccard similarity vs the band/row shape, not on where the corpus
  * sits in any space, so no amount of topic/language drift changes its
  * recall curve. Only learned-geometry indexes (IVF cells) decay.
  */
object IndexDrift {

  /** Mean cosine distance of `vecCol` to the assigned (nearest) frozen
    * centroid — the gauge statistic, one map-side pass over the batch. */
  def meanDistance(batch: DataFrame, vecCol: String, model: KMeans.Model): Double = {
    val row = batch.agg(avg(KMeans.distanceToAssigned(col(vecCol), model))).head()
    // an EMPTY batch has no distance distribution — surface that as an
    // explicit error, not the NULL-aggregate NPE it would otherwise be
    require(!row.isNullAt(0),
      "drift gauge needs a non-empty batch (empty batches have no " +
        "distance distribution to compare)")
    row.getDouble(0)
  }

  /** Gauge `batch` against the index at `indexDir`. Returns a one-row
    * report: (founding_mean, founding_std, batch_mean, drift_ratio,
    * rebuild_recommended). Errors (with a rebuild instruction) on an
    * index whose model predates the drift header — the founding
    * distribution is unrecoverable once later batches have landed.
    *
    * @param slack absolute drift floor — see the fire rule above. */
  def gauge(spark: SparkSession, indexDir: String, batch: DataFrame,
      vecCol: String, slack: Double = 0.05): DataFrame = {
    VectorExpressions.register(spark)
    val modelPath = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(indexDir), "_model")
    val (model, fp) = KMeans.loadWithFingerprint(spark, modelPath.toString)
    val fields = fp.toSeq.flatMap(_.split(";"))
    def field(key: String): Double = fields.collectFirst {
      case s if s.startsWith(key + "=") => s.stripPrefix(key + "=").toDouble
    }.getOrElse(sys.error(
      s"index at $indexDir has no founding $key= drift header — model " +
        "predates the drift gauge; rebuild the index to enable gauging"))
    val d0 = field("d0")
    val sd0 = field("sd0")
    val batchMean = meanDistance(batch, vecCol, model)
    val fires = batchMean > d0 + math.max(3 * sd0, slack)
    import spark.implicits._
    Seq((
      math.round(d0 * 10000) / 10000.0,
      math.round(sd0 * 10000) / 10000.0,
      math.round(batchMean * 10000) / 10000.0,
      math.round(batchMean / math.max(d0, 1e-12) * 10000) / 10000.0,
      fires))
      .toDF("founding_mean", "founding_std", "batch_mean", "drift_ratio",
        "rebuild_recommended")
  }
}
