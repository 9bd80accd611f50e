package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-join probe (round-9 verdict item #8): plant a hot key carrying
  * ~30% of an amplified fact table and time the fact×dim equi-join
  * three ways — plain shuffle join with AQE's skew split disabled (the
  * naive baseline a hot key punishes), AQE-enabled sort-merge (the
  * built-in mitigation), and SkewJoin.saltedInner (the manual (key,
  * salt) rewrite behind `q_join_skew_salted`). SkewJoinSpec proves the
  * salted join row-identical; this probe measures the reason it
  * exists.
  *
  * On local[N] the shuffle is page-cache-local, so wall-clock
  * understates the cluster-side gap — the structural signal is the
  * max-task share: the fraction of the join stage's rows processed by
  * its single largest task (1/parallelism when balanced, →1.0 when one
  * reducer eats the hot key).
  *
  * Run: `sbt "runMain graft.tools.SkewJoinProbe"`.
  */
object SkewJoinProbe {

  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def timeMin(body: => Unit): Double = (1 to 3).map(_ => time(body)).min

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/root/repo/target/skewscale"
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // fact: 10x lineitem with ~30% of rows remapped to one hot supplier
    // (the null-key / default-value / mega-customer shape); dim: the
    // supplier key space with a payload column
    val fact0 = (0 until 10).map(i =>
        Tables.lineitem(spark, sf).select(
          (col("l_orderkey") + i * 10000000L).as("ok"),
          col("l_suppkey").cast("bigint").as("k"),
          col("l_quantity").as("qty")))
      .reduce(_ unionByName _)
    fact0.withColumn("k",
        when(pmod(col("ok"), lit(10)) < 3, lit(42L)).otherwise(col("k")))
      .write.mode("overwrite").parquet(s"$out/fact")
    Tables.supplier(spark, sf)
      .select(col("s_suppkey").cast("bigint").as("k"), col("s_name").as("payload"))
      .write.mode("overwrite").parquet(s"$out/dim")
    def fact = spark.read.parquet(s"$out/fact")
    def dim = spark.read.parquet(s"$out/dim")

    def agg(j: DataFrame): Long =
      j.groupBy("payload").agg(sum("qty")).count()

    def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
      val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val noBroadcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

    var tPlain = 0.0; var tAqe = 0.0; var tSalted = 0.0
    withConf(noBroadcast :+
      ("spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      tPlain = timeMin { agg(fact.join(dim, Seq("k"))) }
    }
    withConf(noBroadcast :+
      ("spark.sql.adaptive.skewJoin.enabled" -> "true") :+
      // the local-shuffle defaults (256 MB / 5x median) never fire at
      // this scale; production-shaped thresholds let AQE actually split
      ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8MB") :+
      ("spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8MB"): _*) {
      tAqe = timeMin { agg(fact.hint("merge").join(dim, Seq("k"))) }
    }
    withConf(noBroadcast :+
      ("spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      tSalted = timeMin { agg(graft.operators.SkewJoin.saltedInner(
        fact, dim, "k", "k", salts = 32, factSalt = xxhash64(col("ok")))) }
    }

    // structural signal: rows through the largest reducer of the
    // (key[, salt]) exchange, as a share of all rows
    val n = fact.count().toDouble
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    def maxShare(keys: Seq[String], df: DataFrame): Double = {
      val byPart = df.select(
          pmod(hash(keys.map(col): _*), lit(parts)).as("p"))
        .groupBy("p").agg(count(lit(1)).as("c"))
        .agg(max("c")).head.getLong(0)
      byPart / n
    }
    val plainShare = maxShare(Seq("k"), fact)
    val saltedShare = maxShare(Seq("k", "__salt"),
      fact.withColumn("__salt", pmod(xxhash64(col("ok")), lit(32)).cast("int")))

    println(f"SKEW rows=${n.toLong} hot-key share=${fact.filter(col("k") === 42).count() / n}%.2f")
    println(f"SKEW plain: $tPlain%.2f s, max-task share ${plainShare * 100}%.1f%%")
    println(f"SKEW aqe-split: $tAqe%.2f s")
    println(f"SKEW salted(32): $tSalted%.2f s, max-task share ${saltedShare * 100}%.1f%%")
    spark.stop()
  }
}
