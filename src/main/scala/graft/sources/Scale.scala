package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-elimination and skew-mitigation primitives (builder brief:
  * "co-locate joins via bucketing, salting for skew"). These are the two
  * techniques that matter most at 100 TB and can't be expressed inside a
  * single query plan — they're storage-layout and key-engineering
  * decisions, so they live as library API.
  */
object Bucketing {

  /** Persist `df` bucketed (and sorted) by `keys` into the session
    * catalog. Two tables bucketed the same way join with ZERO shuffle —
    * the join degenerates to a per-bucket sort-merge (see
    * ScaleSpec "bucketed join plans without Exchange"). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // unqualified, simple names only: the leftover-dir cleanup below
    // joins the warehouse path with the CATALOG's directory name, and a
    // db-qualified or exotic name would make the two diverge silently
    require(table.matches("[A-Za-z0-9_]+"),
      s"writeBucketed needs a simple unqualified table name, got '$table'")
    // an in-memory catalog forgets tables across sessions but leaves the
    // warehouse directory behind — clear both so overwrite is idempotent
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // Hadoop Path handles relative/space-bearing warehouse dirs that
    // java.net.URI(...) rejects; the catalog lowercases the dir name
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket keys. The merge hint
    * keeps the planner on sort-merge — bucketing exists for the case
    * where neither side broadcasts, and a broadcast plan would silently
    * ignore the bucket layout ("Bucketed: false, disabled by query
    * planner"). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right), keys)
}

/** Salting for skewed join keys: a hot key that would pin one reducer is
  * split across `factor` sub-keys. The large (skewed) side gets a
  * deterministic per-row salt; the small side replicates each row
  * `factor` times. Semantically identical to the plain equi-join. AQE's
  * skew-join handles moderate skew automatically; salting is for the
  * pathological single-hot-key case AQE can't split (e.g. one key is 50%
  * of the data). */
object Salting {

  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      factor: Int = 8): DataFrame = {
    // the salt must be DETERMINISTIC per row content, never
    // monotonically_increasing_id: a retried/speculated map task
    // re-salts its rows differently than the outputs other reducers
    // already fetched, silently dropping/duplicating rows (the
    // SPARK-23207 class of bug). Hashing every column spreads a hot
    // key's distinct rows across salts; full duplicates co-locate,
    // which is correct (they'd land on one reducer anyway).
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(factor.toLong)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
