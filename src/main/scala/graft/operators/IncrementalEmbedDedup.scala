package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Incremental EMBEDDING near-duplicate detection — the vector-space
  * sibling of [[IncrementalNearDup]]: each arriving batch is checked
  * against everything ever indexed via a persisted IVF-cell index, so a
  * re-crawl near-copy is caught the day it arrives, not at the next
  * full-corpus q_dedup_embed_ann job.
  *
  * Index layout: parquet partitioned by `__cell=` (the row's IVF cell
  * under the FROZEN centroid model) — each row carries (vec_id,
  * embedding), stored once per its m nearest cells (m-fold, like the
  * band index stores one row per band). A lookup reads only the cells
  * the batch's rows rank into — at production k (thousands of cells,
  * sized corpus/target-cell) that is a batch-proportional slice of the
  * index, the same pruning economics as the band index's `__bkt`.
  *
  * Model protocol (the `_parts`-marker pattern, hardened per the
  * round-10 review): the centroid model IS the partition function, so
  * it is fit on the FIRST batch, committed to `_model` BEFORE any data
  * lands (a crash mid-append can never leave unmarked partitions), and
  * later ingests load it — stored params win, the caller's k is only a
  * seed for a brand-new index. `assignCells` rides in the model file's
  * fingerprint header: an unchecked m mismatch would store under fewer
  * cells than lookups probe (or vice versa) and silently drop matches.
  * Data partitions without `_model` mean a torn index → fail with a
  * rebuild instruction. Centroids FREEZE at first ingest by design —
  * re-fitting on a later batch would re-key every stored row; when the
  * corpus drifts far from the founding geometry, rebuild the index
  * (it is a candidate generator over derived state, rebuildable from
  * the corpus snapshot at any time, exactly like the band index).
  *
  * Same replay contract as the band index: appends are at-least-once
  * (a crash-replayed batch re-appends its cell rows; duplicate
  * candidates collapse in the lookup's `distinct()`), candidates whose
  * history side is a member of the CURRENT batch are anti-joined away,
  * and confirmation is an exact cosine ≥ threshold on the candidate
  * pair — false positives are structurally impossible; the
  * approximation is recall only (shared-cell candidates), gated in
  * q_gate_dedup_embed_incremental.
  *
  * Batch-INTERNAL near-dups are out of scope by design (the in-batch
  * job — q_dedup_embed_ann — owns those); this operator answers "is
  * this new vector a near-copy of anything in history".
  */
object IncrementalEmbedDedup {

  /** (vec_id, embedding, __cell) — one row per (batch row, assigned
    * cell), the rows both sides of the lookup join carry and the rows
    * the index stores. */
  def cellRows(batch: DataFrame, idCol: String, vecCol: String,
      model: KMeans.Model, assignCells: Int): DataFrame =
    batch.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .select(col("vec_id"), col("embedding"),
        explode(slice(KMeans.rankedCells(col("embedding"), model),
          1, assignCells)).as("cc"))
      .select(col("vec_id"), col("embedding"),
        col("cc.cell").cast("int").as("__cell"))

  /** Check `batch` against the index at `indexDir`, then add the batch
    * to the index. Returns confirmed (new_id, old_id, cos) pairs —
    * history-side ids under `old_id`; cos is the EXACT cosine,
    * threshold-filtered.
    *
    * @param k           cell count for the FIRST ingest's model fit
    *                    only; later ingests use the stored model.
    * @param assignCells cells each row stores under / probes — pinned
    *                    in the model file at first ingest, stored wins.
    */
  def ingest(spark: SparkSession, indexDir: String, batch: DataFrame,
      idCol: String, vecCol: String, k: Int = 8, assignCells: Int = 2,
      threshold: Double = 0.8): DataFrame = {
    // the NON-founding path never runs KMeans.fit (which registers the
    // fused kernel as a side effect) — register here so a fresh session
    // serving a stored model doesn't fail on an undefined vec_cosine
    VectorExpressions.register(spark)
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasIndex = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("__cell="))
    val modelPath = new org.apache.hadoop.fs.Path(p, "_model")
    val (model, effM) =
      if (fs.exists(modelPath)) {
        val (m, fp) = KMeans.loadWithFingerprint(spark, modelPath.toString)
        // header is `;`-separated key=value fields: m= (probe fan-out,
        // required) plus the founding drift distribution d0=/sd0=
        // ([[IndexDrift.gauge]] reads those; older two-field-less
        // indexes still load — only the gauge demands them)
        val storedM = fp.toSeq.flatMap(_.split(";")).collectFirst {
          case s if s.startsWith("m=") => s.stripPrefix("m=").toInt
        }.getOrElse(sys.error(
          s"embed-dedup index at $indexDir has a model without an m= " +
            "header — index predates/violates the format; rebuild it"))
        (m, storedM)
      } else if (hasIndex) {
        sys.error(s"embed-dedup index at $indexDir has data partitions but " +
          "no _model — index is torn; rebuild it from the corpus snapshot")
      } else {
        // brand-new index — but NOT if a torn vacuum renamed the real
        // one aside: founding here would silently restart history from
        // zero (and recover would later delete the only copy)
        IndexMaintenance.assertNotTornVacuum(fs, p)
        // fit on the founding batch, publish the model
        // (with m pinned in the header) BEFORE any data lands. An empty
        // founding batch would commit a zero-centroid model whose
        // rankedCells is the empty array — every later ingest would
        // assign no cells and silently match nothing, a dead index.
        require(batch.limit(1).count() > 0,
          s"founding batch for $indexDir is empty — cannot fit the cell " +
            "model; ingest the first non-empty batch to create the index")
        val fitted = KMeans.fit(batch, idCol, vecCol, k = k, maxIter = 3)
        // founding drift distribution (mean + population stddev of the
        // cosine distance to the assigned centroid) rides in the model
        // header: the centroids FREEZE by design, so this is the only
        // record of the geometry they were fit for — IndexDrift.gauge
        // compares every later batch against it and recommends a rebuild
        // before frozen-cell recall silently decays (round-11 verdict
        // item #4). stddev coalesced: a 1-row founding batch has no
        // spread, not a NULL header.
        val distStats = batch.agg(
          avg(KMeans.distanceToAssigned(col(vecCol), fitted)).as("d0"),
          coalesce(stddev_pop(
            KMeans.distanceToAssigned(col(vecCol), fitted)), lit(0.0)).as("sd0"))
          .head()
        KMeans.save(spark, fitted, modelPath.toString,
          Some(s"m=$assignCells;d0=${distStats.getDouble(0)};" +
            s"sd0=${distStats.getDouble(1)}"))
        (fitted, assignCells)
      }
    val rows = cellRows(batch, idCol, vecCol, model, effM)
      .localCheckpoint(true) // feeds the lookup join AND the append
    val touched = rows.select("__cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val out =
      if (!hasIndex) { // founding batch: zero pairs; id columns typed
        // like the BATCH's id so the first result unions cleanly with
        // every later one (string/UUID ids would otherwise clash)
        import org.apache.spark.sql.types._
        val idType = batch.schema(idCol).dataType
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("new_id", idType),
            StructField("old_id", idType), StructField("cos", DoubleType))))
      } else {
        val batchIds = batch.select(col(idCol).as("old_id")).distinct()
        lookup(spark, indexDir, rows, touched, threshold)
          .join(broadcast(batchIds), Seq("old_id"), "left_anti")
          .select("new_id", "old_id", "cos")
      }
    val confirmed = out.localCheckpoint(true) // pin results BEFORE the index grows
    rows.write.partitionBy("__cell").mode("append").parquet(indexDir)
    confirmed
  }

  /** The lookup join itself, un-checkpointed — the stored-index scan
    * must carry `__cell` PartitionFilters (only the batch's cells
    * read); candidates are one cell equi-join, confirmed by the exact
    * fused cosine. */
  private[graft] def lookup(spark: SparkSession, indexDir: String,
      batchCellRows: DataFrame, touched: Seq[Int],
      threshold: Double): DataFrame = {
    val stored = spark.read.parquet(indexDir)
      .filter(col("__cell").isin(touched: _*))
    val cos = VectorExpressions.cosineFast(col("n.embedding"), col("o.embedding"))
    batchCellRows.as("n").join(stored.as("o"),
        col("n.__cell") === col("o.__cell") &&
          col("n.vec_id") =!= col("o.vec_id"))
      // threshold on the UNROUNDED cosine (matching the exact and ANN
      // twins — rounding first would admit boundary pairs the exact
      // ground truth excludes and break the gate's subset contract);
      // round only the OUTPUT. distinct() on the raw double is safe:
      // a pair's meets evaluate the identical expression on identical
      // inputs, so the bits agree
      .select(col("n.vec_id").as("new_id"), col("o.vec_id").as("old_id"),
        cos.as("cos"))
      .distinct() // multi-cell meets + replayed index rows collapse here
      .filter(col("cos") >= threshold)
      .select(col("new_id"), col("old_id"), round(col("cos"), 4).as("cos"))
  }
}
