package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Distributed Lloyd's k-means over an embedding column — the centroid
  * trainer behind IVF-style ANN (the reference's vector surface stops at
  * per-label grouping; a real inverted-file index wants learned cells).
  *
  * Scale shape (100 TB stance): the corpus NEVER moves.
  *  - assignment is map-side — the k centroids are a model-sized literal
  *    array baked into a codegen'd expression (k·dim floats, a few KB),
  *    so scoring is one fused cosine loop per centroid per row;
  *  - the update step ships only (cluster, position, partial sum/count)
  *    through one partially-aggregated shuffle — k·dim·partitions rows,
  *    independent of corpus size;
  *  - the driver holds k·dim doubles per round (the model), never rows.
  *
  * Cosine geometry (argmax cosine, mean recombination) to match the ANN
  * queries it feeds; ties break to the lowest cluster id. Deterministic:
  * seeded init takes the k lowest-id vectors' values, and per-cluster
  * means are summed in double precision — row-order differences stay
  * below the 1e-6 assignment epsilon on unit-scale embeddings.
  */
object KMeans {

  /** Driver-side model: `centroids(i)` is cluster i's center. */
  final case class Model(centroids: Seq[Seq[Float]]) {
    def k: Int = centroids.size
  }

  /** Map-side best-centroid struct `(cos, neg)`: argmax cosine against
    * the model, ties to the lowest cluster id (struct max compares cos
    * first, then the NEGATED index). The shared kernel — evaluate it
    * once per row and project both fields when cluster AND distance are
    * needed; [[assignment]]/[[distanceToAssigned]] are the
    * single-consumer conveniences. */
  def best(vec: Column, model: Model): Column =
    array_max(array(model.centroids.zipWithIndex.map { case (c, i) =>
      struct(
        VectorExpressions.cosineFast(vec, typedlit(c)).as("cos"),
        lit(-i).as("neg"))
    }: _*))

  /** Cluster id of the best centroid (see [[best]]). */
  def assignment(vec: Column, model: Model): Column =
    (-best(vec, model).getField("neg")).cast("int")

  /** Cosine distance (1 - cos) to the assigned centroid — the inertia
    * contribution (see [[best]]). */
  def distanceToAssigned(vec: Column, model: Model): Column =
    lit(1.0) - best(vec, model).getField("cos")

  /** Persist a trained model — the serving-shape artifact: fit ONCE
    * offline, assign/probe many times without re-running Lloyd rounds.
    * The model is k·dim floats (a few KB), so this is a driver-side
    * text write: one line per centroid, comma-separated `Float.toString`
    * values (shortest-round-trip repr, so load returns BIT-IDENTICAL
    * centroids and every downstream assignment matches the fitting
    * session exactly). Committed atomically (tmp + rename) so a reader
    * never observes a half-written model. */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "__tmp")
    val out = fs.create(tmp, true)
    try out.write(model.centroids
      .map(_.map(_.toString).mkString(",")).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"KMeans model commit failed at $path")
  }

  /** Load a [[save]]d model. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    Model(content.split("\n").toSeq.filter(_.nonEmpty)
      .map(_.split(",").toSeq.map(_.toFloat)))
  }

  /** The serving entry: load the model at `path` if one was committed,
    * otherwise fit on `df` and save — so the FIRST run of a serving job
    * pays training once and every later run is assign/probe only. A
    * loaded model is validated against the data's embedding dimension:
    * the fused cosine kernel evaluates over min(|a|, |b|) elements, so
    * a stale model from a different corpus would otherwise degrade
    * SILENTLY (truncated dot products) instead of failing loudly. */
  def loadOrFit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIter: Int, path: String): Model = {
    val spark = df.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val m = load(spark, path)
      val dim = df.select(size(col(vecCol))).head.getInt(0)
      require(m.centroids.forall(_.size == dim),
        s"persisted model at $path has dim ${m.centroids.map(_.size).distinct.mkString("/")} " +
          s"but the corpus embeds at dim $dim — stale model; delete it or " +
          "point serving at the corpus it was trained on")
      require(m.k == k,
        s"persisted model at $path has k=${m.k}, serving requested k=$k")
      m
    } else {
      val m = fit(df, idCol, vecCol, k, maxIter)
      save(spark, m, path)
      m
    }
  }

  /** Train on `df(vecCol)` (array<float>). Init = the k vectors with the
    * lowest `idCol` (deterministic, corpus-order-independent). Runs up to
    * `maxIter` update rounds, stopping early when no vector changes
    * cluster. Empty clusters keep their previous centroid.
    *
    * Requires [[VectorExpressions.register]] on the session (the callers
    * all register; `fit` re-registers defensively). */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIter: Int = 5): Model = {
    VectorExpressions.register(df.sparkSession)
    val init = df.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(k).collect()
      .map(_.getSeq[Float](1).toSeq).toSeq
    var model = Model(init)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val assigned = df.select(col(vecCol).as("__v"))
        .withColumn("__c", assignment(col("__v"), model))
      // element-wise mean per cluster: (cluster, pos) partial sums only
      val next = assigned
        .select(col("__c"), posexplode(col("__v")))
        .groupBy(col("__c"), col("pos"))
        .agg(avg(col("col").cast("double")).as("v"))
        .groupBy("__c")
        .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pv"))
        .select(col("__c"),
          expr("transform(pv, x -> CAST(x.v AS FLOAT))").as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).toSeq).toMap
      val updated = Model(model.centroids.indices.map(i =>
        next.getOrElse(i, model.centroids(i))))
      moved = updated != model
      model = updated
      iter += 1
    }
    model
  }
}
