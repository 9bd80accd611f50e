package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeans

/** Lloyd k-means invariants: recovery of separated clusters, assignment
  * consistency, determinism, and the k=1 degenerate case. */
class ClusteringSpec extends AnyFunSuite {
  import SparkTestSession._

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val n = math.min(a.size, b.size)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    (0 until n).foreach { i =>
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0) 0.0 else dot / d
  }

  // three well-separated direction bundles in 4d, 20 points each, plus
  // ids interleaved so the lowest-k init spans bundles
  private lazy val separated = {
    val base = Seq(
      Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f), Seq(0f, 0f, 1f, 0f))
    val rows = (0 until 60).map { i =>
      val b = base(i % 3)
      // small deterministic jitter that keeps each point nearest its base
      val jit = b.zipWithIndex.map { case (v, j) =>
        v + 0.05f * (((i * 7 + j * 3) % 5) - 2)
      }
      (i.toLong, jit)
    }
    spark.createDataFrame(rows).toDF("id", "vec")
  }

  test("k-means recovers well-separated direction clusters") {
    val model = KMeans.fit(separated, "id", "vec", k = 3, maxIter = 10)
    val assigned = separated
      .withColumn("c", KMeans.assignment(col("vec"), model))
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    // every bundle (i % 3) maps to exactly one cluster, and the three
    // bundles map to three distinct clusters
    val byBundle = assigned.groupBy(_._1 % 3).map { case (b, rs) =>
      b -> rs.map(_._2).distinct
    }
    byBundle.foreach { case (b, cs) =>
      assert(cs.size == 1, s"bundle $b split across clusters $cs")
    }
    assert(byBundle.values.flatten.toSet.size == 3)
  }

  test("assignment is argmax cosine against the model, ties to lowest id") {
    val model = KMeans.fit(separated, "id", "vec", k = 3, maxIter = 10)
    separated.withColumn("c", KMeans.assignment(col("vec"), model))
      .collect().foreach { r =>
        val v = r.getSeq[Float](1)
        val sims = model.centroids.map(c => cos(v, c))
        val expected = sims.indices.maxBy(i => (sims(i), -i))
        assert(r.getInt(2) == expected,
          s"id ${r.getLong(0)}: got ${r.getInt(2)}, expected $expected ($sims)")
      }
  }

  test("fit is deterministic across repeated runs and partitionings") {
    val a = KMeans.fit(separated, "id", "vec", k = 3, maxIter = 10)
    val b = KMeans.fit(separated.repartition(7), "id", "vec", k = 3, maxIter = 10)
    assert(a == b)
  }

  test("k=1 centroid is the element-wise mean") {
    val model = KMeans.fit(separated, "id", "vec", k = 1, maxIter = 3)
    val mean = separated
      .select(posexplode(col("vec")))
      .groupBy("pos").agg(avg(col("col").cast("double")).as("v"))
      .orderBy("pos").collect().map(_.getDouble(1))
    model.centroids.head.zip(mean).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-6, s"$got vs $want")
    }
  }

  test("training reduces cosine inertia vs the init model") {
    // unit-normalize first: Lloyd's arithmetic-mean update minimizes
    // EUCLIDEAN inertia, which matches cosine inertia only when inputs
    // sit on the unit sphere — on raw vectors a large-norm outlier can
    // legitimately rotate a centroid and raise sum(1-cos)
    val norm = sqrt(aggregate(col("embedding"), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val e = Tables.embeddings(spark, sf).limit(500)
      .withColumn("embedding",
        transform(col("embedding"), x => (x.cast("double") / norm).cast("float")))
      .localCheckpoint(true)
    val init = KMeans.Model(
      e.select(col("vec_id"), col("embedding")).orderBy("vec_id").limit(8)
        .collect().map(_.getSeq[Float](1).toSeq).toSeq)
    val trained = KMeans.fit(e, "vec_id", "embedding", k = 8, maxIter = 5)
    def inertia(m: KMeans.Model): Double =
      e.select(sum(KMeans.distanceToAssigned(col("embedding"), m)))
        .head.getDouble(0)
    assert(inertia(trained) <= inertia(init) + 1e-9)
  }

  test("model save/load round-trips bit-exact; loadOrFit serves without refitting") {
    val dir = new java.io.File("target/test_ann_models")
    dir.mkdirs()
    val path = new java.io.File(dir, "m1.model").getAbsolutePath
    new java.io.File(path).delete()
    val model = KMeans.fit(separated, "id", "vec", k = 3, maxIter = 10)
    KMeans.save(spark, model, path)
    val loaded = KMeans.load(spark, path)
    assert(loaded == model,
      "Float.toString shortest-round-trip repr must reload bit-identical centroids")
    // first serving run with no file: fits and commits (with fingerprint)
    val path2 = new java.io.File(dir, "m2.model").getAbsolutePath
    new java.io.File(path2).delete()
    val fitted = KMeans.loadOrFit(separated, "id", "vec", k = 3, maxIter = 10, path2)
    assert(fitted == model)
    assert(KMeans.load(spark, path2) == model, "first serve run commits the model")
    // matching corpus: serves the stored model WITHOUT refitting —
    // observed by the file staying byte-identical (no re-commit)
    val before = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path2))
    assert(KMeans.loadOrFit(separated, "id", "vec", k = 3, maxIter = 10, path2) == model)
    val after = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path2))
    assert(java.util.Arrays.equals(before, after),
      "a fingerprint-matched model must be served, not re-committed")
    // CHANGED corpus under the same path: the stored fingerprint
    // mismatches, loadOrFit self-heals by refitting — serving dead
    // centroids silently is the failure mode this prevents
    val shifted = separated.withColumn("vec",
      transform(col("vec"), x => x * lit(0.0f) + lit(1.0f)))
    val healed = KMeans.loadOrFit(shifted, "id", "vec", k = 3, maxIter = 10, path2)
    assert(healed != model, "stale model must be refit for the new corpus")
    assert(KMeans.load(spark, path2) == healed, "the refit model is committed")
    // changed k is staleness too
    val k4 = KMeans.loadOrFit(separated, "id", "vec", k = 4, maxIter = 10, path2)
    assert(k4.k == 4)
    // serving-shape results equal the fit-path results at a fixed model:
    // assignments from the loaded model match the fitting session's
    val viaFit = separated.withColumn("c", KMeans.assignment(col("vec"), model))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val viaServe = separated.withColumn("c", KMeans.assignment(col("vec"), loaded))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(viaServe == viaFit)
  }

  test("auto clustering dispatch: deep chain exceeds the label budget, star path recovers") {
    import spark.implicits._
    // a planted 60-hop chain: min-label needs ~59 rounds; auto's default
    // budget (8) cannot converge, so the dispatcher must fall back to
    // star contraction and STILL return exact component minima
    val n = 60
    val chain = (0L until n - 1L).map(i => (i, i + 1)).toDF("a", "b")
    val probeFails = intercept[IllegalStateException] {
      graft.operators.ConnectedComponents.run(chain, "a", "b", maxIter = 8).count()
    }
    assert(probeFails.getMessage.contains("did not converge"),
      "precondition: the chain must genuinely exceed min-label's budget")
    val labels = graft.operators.ConnectedComponents.auto(chain, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n)
    assert(labels.values.forall(_ == 0L), "one component, min id 0")
    // and a shallow graph stays on the min-label path (same answer,
    // no fallback needed — auto must not change the result either way)
    val shallow = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 30L)).toDF("a", "b")
    val viaAuto = graft.operators.ConnectedComponents.auto(shallow, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaRun = graft.operators.ConnectedComponents.run(shallow, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAuto == viaRun)
    assert(viaAuto(12L) == 10L && viaAuto(21L) == 20L && viaAuto(30L) == 30L)
  }

  test("int8 codes preserve IVF cell assignment (quantized index == float index)") {
    // q_ann_ivf_quantized assigns cells FROM the codes so the float
    // corpus is never needed at index-build time; that is sound only
    // while argmax-cosine survives the per-vector quantization epsilon.
    // Gate: on the real test corpus, >= 99% of vectors land in the same
    // cell from codes as from floats (borderline vectors MAY flip — a
    // flipped assignment is still a valid inverted-file, it just moves
    // one vector to its second-nearest cell).
    graft.functions.VectorExpressions.register(spark)
    val e = Tables.embeddings(spark, sf)
    val model = KMeans.fit(e, "vec_id", "embedding", k = 8, maxIter = 3)
    val codes = graft.operators.Quantization.codesAsFloat(
      graft.operators.Quantization.int8(col("embedding")))
    val agg = e.select(
        KMeans.assignment(col("embedding"), model).as("a"),
        KMeans.assignment(codes, model).as("b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("same"))
      .head()
    val (n, same) = (agg.getLong(0), agg.getLong(1))
    info(s"cell agreement: $same/$n")
    assert(n > 0 && same.toDouble / n >= 0.99,
      s"quantized cell assignment drifted: $same/$n agree")
  }
}
