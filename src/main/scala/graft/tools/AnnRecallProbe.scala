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
    def top3(name: String): Map[Long, Set[Long]] =
      graft.SparkEntry.queries(name)(spark, d).filter(col("rnk") <= 3)
        .collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = top3("q_similarity_topk")
    for (n <- Seq("q_ann_ivf", "q_ann_ivf_quantized", "q_ann_quantized", "q_ann_lsh")) {
      val ann = top3(n)
      val rs = exact.map { case (q, e) =>
        ann.getOrElse(q, Set.empty[Long]).count(e.contains).toDouble / e.size }
      println(f"RECALL $n recall@3 = ${rs.sum / rs.size}%.3f over ${exact.size} probes")
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
    spark.stop()
  }
}
