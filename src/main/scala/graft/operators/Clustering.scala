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

  /** All k cells ranked nearest-first for `vec` — an array_sort over k
    * `struct(negcos, cell)` model entries, map-side per row (no window,
    * no join). The shared kernel behind IVF probe selection and top-m
    * multi-assignment (`slice(rankedCells(...), 1, m)`). */
  def rankedCells(vec: Column, model: Model): Column =
    array_sort(array(model.centroids.zipWithIndex.map {
      case (c, i) =>
        struct((lit(-1.0) * VectorExpressions.cosineFast(vec, typedlit(c)))
          .as("negcos"), lit(i).as("cell"))
    }: _*))

  /** Cosine distance (1 - cos) to the assigned centroid — the inertia
    * contribution (see [[best]]). */
  def distanceToAssigned(vec: Column, model: Model): Column =
    lit(1.0) - best(vec, model).getField("cos")

  /** Persist a trained model — the serving-shape artifact: fit ONCE
    * offline, assign/probe many times without re-running Lloyd rounds.
    * The model is k·dim floats (a few KB), so this is a driver-side
    * text write: optional `#`-prefixed header lines (the corpus
    * fingerprint [[loadOrFit]] staleness-checks against), then one line
    * per centroid, comma-separated `Float.toString` values
    * (shortest-round-trip repr, so load returns BIT-IDENTICAL centroids
    * and every downstream assignment matches the fitting session
    * exactly). Committed via a UNIQUE tmp file + rename, so two racing
    * savers can never interleave on a shared scratch name and commit a
    * truncated file; the delete-then-rename swap (Hadoop rename refuses
    * an existing destination) leaves a brief absent window — the model
    * path is single-writer, same contract as the SnapshotStore. */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String, fingerprint: Option[String] = None): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(
      path + "__tmp_" + java.util.UUID.randomUUID().toString)
    val out = fs.create(tmp, true)
    try out.write((fingerprint.map(f => s"#fp=$f").toSeq ++
      model.centroids.map(_.map(_.toString).mkString(",")))
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"KMeans model commit failed at $path")
  }

  /** Load a [[save]]d model (ignoring header lines). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model =
    loadWithFingerprint(spark, path)._1

  /** [[load]] plus the stored corpus fingerprint, if one was saved. */
  def loadWithFingerprint(spark: org.apache.spark.sql.SparkSession,
      path: String): (Model, Option[String]) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = content.split("\n").toSeq.filter(_.nonEmpty)
    val fp = lines.collectFirst { case l if l.startsWith("#fp=") => l.stripPrefix("#fp=") }
    (Model(lines.filterNot(_.startsWith("#"))
      .map(_.split(",").toSeq.map(_.toFloat))), fp)
  }

  /** Order-insensitive corpus fingerprint: row count + XOR of per-row
    * xxhash64(id, vector) — one narrow scan, catches id AND embedding
    * changes, partition-order invariant (XOR commutes), overflow-free. */
  def corpusFingerprint(df: DataFrame, idCol: String, vecCol: String): String = {
    val r = df.agg(count(lit(1)).as("n"),
      expr(s"bit_xor(xxhash64(`$idCol`, `$vecCol`))").as("x")).head
    s"${r.getLong(0)}:${r.getLong(1)}:k"
  }

  /** The serving entry: serve the model at `path` when it matches the
    * corpus, otherwise (re)fit and commit — so the FIRST serving run
    * pays training once, later runs are assign/probe only, and a STALE
    * model (regenerated corpus, different corpus under the same path,
    * changed k) is detected by the stored fingerprint and SELF-HEALS by
    * refitting instead of silently serving dead centroids (the fused
    * cosine kernel evaluates over min(|a|,|b|) elements, so even a
    * dim-mismatched model would otherwise degrade without an error). */
  def loadOrFit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIter: Int, path: String): Model = {
    val spark = df.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fp = corpusFingerprint(df, idCol, vecCol) + k.toString
    val stored: Option[Model] =
      if (!fs.exists(p)) None
      else loadWithFingerprint(spark, path) match {
        case (m, Some(storedFp)) if storedFp == fp && m.k == k => Some(m)
        case _ => None // no/mismatched fingerprint: stale — refit below
      }
    stored.getOrElse {
      val m = fit(df, idCol, vecCol, k, maxIter)
      save(spark, m, path, Some(fp))
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
