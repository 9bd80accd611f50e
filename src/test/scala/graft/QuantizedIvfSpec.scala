package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QuantizedIvf

/** Persisted quantized-IVF index invariants: build/load round-trip,
  * staleness self-healing, crash-garbage immunity, and serve == build
  * results through the query key. */
class QuantizedIvfSpec extends AnyFunSuite {
  import SparkTestSession._


  test("serve key == fit-per-run composed key; second load skips the build") {
    graft.functions.VectorExpressions.register(spark)
    val base = new java.io.File("/root/repo/target/ann_models/ivfq_k8_" +
      new java.io.File(sf).getName)
    LocalFs.rmrf(new java.io.File(base.getPath + ".codes"))
    new java.io.File(base.getPath + ".model").delete()
    def rows(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val build = rows("q_ann_ivf_quantized")
    val servedFirst = rows("q_ann_ivf_quantized_serve") // builds + commits
    assert(new java.io.File(base.getPath + ".codes/_fingerprint").exists(),
      "first serve run must commit the codes dir with its fingerprint marker")
    val servedAgain = rows("q_ann_ivf_quantized_serve") // pure load
    assert(servedFirst == build, "serve (build path) must equal the composed key")
    assert(servedAgain == build, "serve (load path) must equal the composed key")
  }

  test("stale artifacts self-heal: fingerprint mismatch forces a rebuild") {
    graft.functions.VectorExpressions.register(spark)
    val e = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("ivfq").toFile
    try {
      val basePath = dir.getPath + "/idx"
      val (m1, c1) = QuantizedIvf.loadOrBuild(e, "vec_id", "embedding", 4, 2, basePath)
      assert(c1.count() == e.count())
      // poison the codes fingerprint: next load must rebuild, not serve
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(basePath + ".codes/_fingerprint"), "stale")
      val (m2, c2) = QuantizedIvf.loadOrBuild(e, "vec_id", "embedding", 4, 2, basePath)
      assert(m2.centroids == m1.centroids, "deterministic rebuild, same corpus")
      assert(c2.count() == e.count())
      val healed = java.nio.file.Files.readString(
        java.nio.file.Paths.get(basePath + ".codes/_fingerprint"))
      assert(healed != "stale", "rebuild must recommit the true fingerprint")
      // different k under the same path: the pair is rebuilt for that k
      val (m3, _) = QuantizedIvf.loadOrBuild(e, "vec_id", "embedding", 2, 2, basePath)
      assert(m3.k == 2)
    } finally LocalFs.rmrf(dir)
  }

  test("crash garbage (tmp dirs, marker-less codes) never serves") {
    graft.functions.VectorExpressions.register(spark)
    val e = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("ivfq").toFile
    try {
      val basePath = dir.getPath + "/idx"
      // a torn build: codes parquet present but no fingerprint marker
      e.limit(3).select(col("vec_id"),
          graft.operators.Quantization.int8(col("embedding")).as("qe"))
        .withColumn("cell", lit(0))
        .write.parquet(basePath + ".codes")
      val (_, c) = QuantizedIvf.loadOrBuild(e, "vec_id", "embedding", 4, 2, basePath)
      assert(c.count() == e.count(),
        "marker-less codes dir is crash garbage and must be rebuilt over")
    } finally LocalFs.rmrf(dir)
  }
}
