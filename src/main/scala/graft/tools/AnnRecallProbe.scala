package graft.tools

import org.apache.spark.sql.functions._

/** Measurement harness behind the ANN recall gates (Gates.scala) and
  * the quantized-IVF SCALING.md rows: prints recall@3 vs exact brute
  * force for each ANN key plus the int8 cell-assignment agreement.
  * Usage: runMain graft.tools.AnnRecallProbe [sfDir] */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder("local[16]", "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // recall via the SAME computation the q_gate_* keys enforce
    val exact = graft.SparkEntry.queries("q_similarity_topk")(spark, d)
    val nProbes = exact.filter(col("rnk") <= 3).select(exact.columns(0))
      .distinct().count()
    for (n <- Seq("q_ann_ivf", "q_ann_ivf_quantized", "q_ann_quantized", "q_ann_lsh")) {
      val r = graft.queries.Gates.recallAtK(
        graft.SparkEntry.queries(n)(spark, d), exact, 3)
      println(f"RECALL $n recall@3 = $r%.3f over $nProbes probes")
    }
    graft.functions.VectorExpressions.register(spark)
    val e = graft.Tables.embeddings(spark, d)
    val model = graft.operators.KMeans.fit(e, "vec_id", "embedding", k = 8, maxIter = 3)
    val codes = graft.operators.Quantization.codesAsFloat(
      graft.operators.Quantization.int8(col("embedding")))
    val agg = e.select(
        graft.operators.KMeans.assignment(col("embedding"), model).as("a"),
        graft.operators.KMeans.assignment(codes, model).as("b"))
      .agg(count(lit(1)), sum(when(col("a") === col("b"), 1L).otherwise(0L))).head
    println(s"AGREEMENT cells ${agg.getLong(1)}/${agg.getLong(0)}")

    // ---- storage + search cost of the int8 index at 10x vectors ----
    // the quantization claim that matters at 100 TB: the SERVING index
    // (cell + codes) is ~4x smaller on disk than the float cells, so
    // the probe-side scan reads a quarter of the bytes for the same
    // candidate set
    val out = "/root/repo/target/quantscale"
    val e10 = (0 until 10).map(i =>
        e.select((col("vec_id") + i * 1000000L).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    e10.select(col("vec_id").as("cid"), col("embedding").as("ec"))
      .withColumn("cell", graft.operators.KMeans.assignment(col("ec"), model))
      .write.mode("overwrite").parquet(s"$out/cells_f32")
    e10.select(col("vec_id").as("cid"),
        graft.operators.Quantization.int8(col("embedding")).as("qe"))
      .withColumn("cell", graft.operators.KMeans.assignment(
        graft.operators.Quantization.codesAsFloat(col("qe")), model))
      .write.mode("overwrite").parquet(s"$out/cells_i8")
    def bytes(p: String): Long =
      Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length).sum
    val bF = bytes(s"$out/cells_f32"); val bI = bytes(s"$out/cells_i8")
    println(f"SIZE 10x cells: float32 ${bF / 1e6}%.1f MB, int8 ${bI / 1e6}%.1f MB (${bF.toDouble / bI}%.1fx shrink)")
    // same probe/rerank stage over each stored index (cells 0+1 probed)
    def search(cand: org.apache.spark.sql.DataFrame): Long = {
      val probe = e.filter(col("vec_id") === 100)
        .select(col("embedding").as("eq"))
      broadcast(probe).join(cand.filter(col("cell") < 2))
        .select(col("cid"),
          graft.functions.VectorExpressions.cosineFast(col("eq"), col("ec")).as("cos"))
        .orderBy(col("cos").desc).limit(3).count()
    }
    def timeMin(body: => Unit): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }.min
    val tF = timeMin { search(spark.read.parquet(s"$out/cells_f32")) }
    val tI = timeMin { search(spark.read.parquet(s"$out/cells_i8")
      .select(col("cid"),
        graft.operators.Quantization.codesAsFloat(col("qe")).as("ec"), col("cell"))) }
    println(f"SEARCH 10x probe: float32 $tF%.2f s, int8 $tI%.2f s")
    spark.stop()
  }
}
