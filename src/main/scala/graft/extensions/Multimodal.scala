package graft.extensions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2.4 X5 + builder brief): media
  * payloads ride as opaque `binary` columns with typed metadata beside
  * them; decode / feature-extraction runs as a partition-local typed
  * transformation (the Scala analogue of a vectorized Python UDF batch).
  *
  * The actual media codecs are NOT in this environment, so the decode
  * step is a pluggable seam ([[FeatureExtractor]]); the default
  * [[ByteHistogram]] is a deterministic, real computation over the raw
  * bytes, which keeps the Spark-side plumbing (schema, batching,
  * partition locality, feature shape) fully testable.
  *
  * Scale notes: feature extraction is embarrassingly parallel —
  * mapPartitions keeps per-record overhead amortized (one extractor
  * instance per partition, the batch shape a Pandas UDF would give);
  * binary payloads never shuffle (extract features first, then join the
  * small feature vectors).
  */
object Multimodal {

  /** One media record: id + raw payload bytes. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte])

  /** Extracted fixed-width feature vector. */
  case class MediaFeatures(doc_id: Long, features: Array[Double])

  /** The decode/extract seam. Implementations must be deterministic and
    * serializable (constructed on the driver, executed per partition). */
  trait FeatureExtractor extends Serializable {
    def dim: Int
    def extract(payload: Array[Byte]): Array[Double]
  }

  /** Default extractor: `bins`-bucket byte-value histogram, L1-normalized.
    * Stands in for image/audio decoders (absent in this container) while
    * exercising the real distribution path. */
  final class ByteHistogram(bins: Int = 8) extends FeatureExtractor {
    require(256 % bins == 0)
    val dim: Int = bins
    def extract(payload: Array[Byte]): Array[Double] = {
      val counts = new Array[Double](bins)
      var i = 0
      while (i < payload.length) {
        counts((payload(i) & 0xff) * bins / 256) += 1.0
        i += 1
      }
      val total = math.max(1.0, payload.length.toDouble)
      counts.map(_ / total)
    }
  }

  /** Distributed feature extraction: binary column in, feature vectors
    * out, one extractor instance per partition. */
  def extractFeatures(records: Dataset[MediaRecord],
      extractor: FeatureExtractor): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map(r => MediaFeatures(r.doc_id, extractor.extract(r.payload)))
    }
  }

  /** One sampled frame: parent id, frame index, frame bytes. */
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling for video/audio-shaped payloads: split the byte
    * stream into fixed-size frames and keep every `stride`-th one — the
    * 1-row→N-rows generator shape a real decoder would have (UDTF-style),
    * run partition-locally so payload bytes never shuffle before
    * down-sampling. A real codec plugs in by replacing the fixed-size
    * splitter; the sampling/fan-out plumbing is what's exercised here. */
  def sampleFrames(records: Dataset[MediaRecord], frameBytes: Int,
      stride: Int): Dataset[Frame] = {
    // fail on the DRIVER: stride=0 would otherwise surface as an
    // ArithmeticException inside executor tasks (i % stride), and
    // frameBytes<=0 as grouped()'s obscure failure, after the stage
    // has already launched
    require(frameBytes > 0 && stride > 0,
      s"sampleFrames needs frameBytes > 0 and stride > 0, " +
        s"got frameBytes=$frameBytes stride=$stride")
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        r.payload.grouped(frameBytes).zipWithIndex.collect {
          case (bytes, i) if i % stride == 0 => Frame(r.doc_id, i, bytes)
        }
      }
    }
  }

  /** Resize a feature vector to `targetDim` by averaging (downscale) or
    * linear interpolation (upscale) — the deterministic stand-in for an
    * image resize kernel, applied AFTER extraction so only small vectors
    * flow through the plan. */
  def resizeFeatures(features: Array[Double], targetDim: Int): Array[Double] = {
    val n = features.length
    // an empty input would average over zero elements (0.0/0 = NaN) and
    // silently poison every downstream dot product/sort — name it
    require(n > 0, "resizeFeatures: empty input vector (missing payload?)")
    require(targetDim > 0, s"resizeFeatures: targetDim must be > 0, got $targetDim")
    if (n == targetDim) features
    else Array.tabulate(targetDim) { i =>
      val lo = i.toDouble * n / targetDim
      val hi = (i + 1).toDouble * n / targetDim
      val from = lo.toInt
      val until = math.min(n, math.max(from + 1, math.ceil(hi).toInt))
      var s = 0.0
      var j = from
      while (j < until) { s += features(j); j += 1 }
      s / (until - from)
    }
  }

  /** documents.text as a stand-in binary payload (utf-8 bytes). */
  def documentPayloads(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }
}
