package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The persisted int8 inverted-file index — the serving artifact the
  * quantized-IVF composition produces when it runs as a real index
  * rather than an in-query build: the k·dim float centroid model
  * (KMeans.save format) plus one parquet of (id, (scale, codes), cell)
  * rows, 4× smaller than the float corpus. Build once per corpus
  * version; every later search loads the pair and goes straight to
  * probe/rerank — no Lloyd rounds, no re-quantization, no float corpus
  * read anywhere in the serving path.
  *
  * Staleness contract (same stance as KMeans.loadOrFit): both artifacts
  * carry the corpus fingerprint (row-count + order-insensitive xxhash
  * of (id, vector), k appended); a regenerated corpus, changed k, a
  * torn/unreadable marker, or a model/codes pair from different builds
  * is detected by fingerprint mismatch and self-heals by rebuilding.
  * Commit protocol: the codes dir is staged data-first/pointer-last
  * (parquet to a unique tmp dir, fingerprint marker written INTO the
  * tmp dir last, then a directory rename) — a crash mid-BUILD leaves
  * only tmp garbage. Like KMeans.save, REPLACING an existing pair is a
  * delete-then-rename swap (Hadoop rename refuses an existing
  * destination), which leaves a brief absent window between delete and
  * rename; the path is single-writer by contract, and a reader racing
  * that window fails fast and self-heals on its next loadOrBuild.
  */
object QuantizedIvf {

  private def fpPath(codesDir: String) = s"$codesDir/_fingerprint"

  /** Load the (model, codes) pair at `basePath` when both match the
    * corpus, else (re)build and commit. Returns the centroid model and
    * the codes frame (`idCol`, qe struct, cell). */
  def loadOrBuild(df: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIter: Int, basePath: String): (KMeans.Model, DataFrame) = {
    val spark = df.sparkSession
    val modelPath = basePath + ".model"
    val codesDir = basePath + ".codes"
    val fp = KMeans.corpusFingerprint(df, idCol, vecCol) + k.toString
    val hconf = spark.sparkContext.hadoopConfiguration
    val codesP = new org.apache.hadoop.fs.Path(codesDir)
    val fs = codesP.getFileSystem(hconf)
    val fresh: Option[(KMeans.Model, DataFrame)] =
      if (!fs.exists(codesP) || !fs.exists(new org.apache.hadoop.fs.Path(fpPath(codesDir))))
        None
      else {
        // an unreadable/corrupt marker (torn write, stale checksum
        // sidecar) is indistinguishable from absent — treat as stale
        // and rebuild rather than crash the serving path
        val storedCodesFp = scala.util.Try {
          val in = fs.open(new org.apache.hadoop.fs.Path(fpPath(codesDir)))
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        }.getOrElse("")
        val modelP = new org.apache.hadoop.fs.Path(modelPath)
        if (storedCodesFp != fp || !fs.exists(modelP)) None
        else KMeans.loadWithFingerprint(spark, modelPath) match {
          case (m, Some(modelFp)) if modelFp == fp && m.k == k =>
            Some((m, spark.read.parquet(codesDir)))
          case _ => None // model stale or from a different build: rebuild pair
        }
      }
    fresh.getOrElse {
      val model = KMeans.fit(df, idCol, vecCol, k, maxIter)
      KMeans.save(spark, model, modelPath, Some(fp))
      val codes = df.select(col(idCol),
          Quantization.int8(col(vecCol)).as("qe"))
        .withColumn("cell", KMeans.assignment(
          Quantization.codesAsFloat(col("qe")), model))
      val tmp = new org.apache.hadoop.fs.Path(
        codesDir + "__tmp_" + java.util.UUID.randomUUID().toString)
      codes.write.mode("overwrite").parquet(tmp.toString)
      val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_fingerprint"), true)
      try out.write(fp.getBytes("UTF-8")) finally out.close()
      if (fs.exists(codesP)) fs.delete(codesP, true)
      if (!fs.rename(tmp, codesP))
        throw new java.io.IOException(s"codes commit failed at $codesDir")
      (model, spark.read.parquet(codesDir))
    }
  }
}
