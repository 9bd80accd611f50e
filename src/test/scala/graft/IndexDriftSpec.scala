package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{IncrementalEmbedDedup, IndexDrift, KMeans}

/** The frozen-model drift gauge (operators/IndexDrift, round-11 verdict
  * item #4): founding ingest persists the distance distribution, an
  * aligned batch stays quiet, a planted-drift batch fires, and a legacy
  * index without the header errors with a rebuild instruction instead
  * of gauging garbage. */
class IndexDriftSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String): java.io.File = {
    val dir = new java.io.File(s"/root/repo/target/test_drift/$tag")
    LocalFs.rmrf(dir)
    dir
  }

  private lazy val e = {
    graft.functions.VectorExpressions.register(spark)
    Tables.embeddings(spark, sf).localCheckpoint(true)
  }
  private def founding = graft.queries.Gates.bundleCorpus(
    e.filter(col("vec_id") % 3 =!= 0), 0)
  private def held = e.filter(col("vec_id") % 3 === 0)

  test("founding ingest persists d0/sd0 in the model header") {
    val dir = freshDir("header")
    IncrementalEmbedDedup.ingest(spark, dir.getPath, founding,
      "vec_id", "embedding", k = 8)
    val (_, fp) = KMeans.loadWithFingerprint(
      spark, new java.io.File(dir, "_model").getPath)
    val fields = fp.get.split(";")
    assert(fields.exists(_.startsWith("m=")))
    val d0 = fields.collectFirst {
      case s if s.startsWith("d0=") => s.stripPrefix("d0=").toDouble }.get
    val sd0 = fields.collectFirst {
      case s if s.startsWith("sd0=") => s.stripPrefix("sd0=").toDouble }.get
    // bundle corpus: small distances, real spread
    assert(d0 > 0.0 && d0 < 0.5, s"d0=$d0")
    assert(sd0 > 0.0 && sd0 < 0.5, s"sd0=$sd0")
  }

  test("aligned batch does not fire; planted drift fires") {
    val dir = freshDir("fire")
    IncrementalEmbedDedup.ingest(spark, dir.getPath, founding,
      "vec_id", "embedding", k = 8)
    val quiet = IndexDrift.gauge(spark, dir.getPath,
      graft.queries.Gates.bundleCorpus(held, 0), "embedding").head()
    assert(!quiet.getAs[Boolean]("rebuild_recommended"),
      s"aligned batch cried wolf: $quiet")
    val loud = IndexDrift.gauge(spark, dir.getPath,
      graft.queries.Gates.bundleCorpus(held, 16), "embedding").head()
    assert(loud.getAs[Boolean]("rebuild_recommended"),
      s"drifted batch slept through: $loud")
    // the report's ratio orders the two batches correctly
    assert(loud.getAs[Double]("batch_mean") >
      quiet.getAs[Double]("batch_mean") + 0.3)
  }

  test("a pre-gauge index (no d0 header) errors with a rebuild instruction") {
    val dir = freshDir("legacy")
    dir.mkdirs()
    // hand-write a legacy model: m= only, no drift fields
    val model = KMeans.fit(founding, "vec_id", "embedding", k = 4, maxIter = 1)
    KMeans.save(spark, model,
      new java.io.File(dir, "_model").getPath, Some("m=2"))
    val err = intercept[RuntimeException] {
      IndexDrift.gauge(spark, dir.getPath, held, "embedding")
    }
    assert(err.getMessage.contains("rebuild"))
    // ...but the INGEST path still accepts the legacy m= header
    val pairs = IncrementalEmbedDedup.ingest(spark, dir.getPath,
      held.limit(10), "vec_id", "embedding")
    assert(pairs.columns.toSeq == Seq("new_id", "old_id", "cos"))
  }
}
