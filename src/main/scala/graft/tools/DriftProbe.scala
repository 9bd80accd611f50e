package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.KMeans
import org.apache.spark.sql.functions._

/** Round-12 fixture calibration for q_gate_index_drift: measures the
  * founding distance-to-centroid distribution of the test embeddings
  * and of candidate planted-drift transforms, so the gate's fire/no-fire
  * margin is chosen from data, not guessed. */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)
    val e = Tables.embeddings(spark, sfDir).localCheckpoint(true)
    // cluster-structured corpus (the geometry real embedding corpora
    // have): 8 direction bundles at axes base..base+7 plus jitter
    def bundles(df: org.apache.spark.sql.DataFrame, base: Int) =
      df.withColumn("embedding",
        transform(col("embedding"), (_, i) =>
          (when(i === lit(base) + pmod(col("vec_id"), lit(8)).cast("int"), lit(1.0d))
            .otherwise(lit(0.0d)) +
            (pmod(xxhash64(col("vec_id") * 131 + i), lit(1000)).cast("double")
              / 1000.0 - 0.5) * 0.2).cast("float")))
    val founding = bundles(e.filter(col("vec_id") % 3 =!= 0), 0)
    val model = KMeans.fit(founding, "vec_id", "embedding", k = 8, maxIter = 3)
    def stats(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val r = df.agg(
        avg(KMeans.distanceToAssigned(col("embedding"), model)).as("mean"),
        stddev_pop(KMeans.distanceToAssigned(col("embedding"), model)).as("sd"),
        min(KMeans.distanceToAssigned(col("embedding"), model)).as("min"),
        max(KMeans.distanceToAssigned(col("embedding"), model)).as("max")).head()
      println(f"$label%-28s mean=${r.getDouble(0)}%.4f sd=${r.getDouble(1)}%.4f " +
        f"min=${r.getDouble(2)}%.4f max=${r.getDouble(3)}%.4f")
    }
    stats(founding, "founding (bundles 0-7)")
    stats(bundles(e.filter(col("vec_id") % 3 === 0), 0), "aligned batch (bundles 0-7)")
    stats(bundles(e.filter(col("vec_id") % 3 === 0), 16), "drifted batch (bundles 16-23)")
    spark.stop()
  }
}
