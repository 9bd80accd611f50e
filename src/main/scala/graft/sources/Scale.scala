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
    // an in-memory catalog forgets tables across sessions but leaves the
    // warehouse directory behind — clear both so overwrite is idempotent
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(loc)
    }
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
    val saltedLarge = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
