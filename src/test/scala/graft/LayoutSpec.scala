package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder

/** Z-order layout: bit-level correctness of the Morton code and the
  * actual row-group pruning it buys on a 2-d box scan. */
class LayoutSpec extends AnyFunSuite {
  import SparkTestSession._

  private def mortonRef(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = xs.size
    for (i <- 0 until bits; c <- 0 until n)
      z |= ((xs(c) >> i) & 1L) << (i * n + c)
    z
  }

  test("zvalue matches the bit-interleave reference on random inputs") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong))
    val df = spark.createDataFrame(rows).toDF("x", "y")
      .withColumn("z", ZOrder.zvalue(Seq(col("x"), col("y")), 21))
    df.collect().foreach { r =>
      assert(r.getLong(2) == mortonRef(Seq(r.getLong(0), r.getLong(1)), 21))
    }
  }

  test("out-of-range inputs clamp to the range edge instead of aliasing") {
    val rows = Seq(
      (0L, 0L), (1L << 16, 5L), ((1L << 16) - 1, 5L), (-7L, 5L), (123L, 1L << 20))
    val got = spark.createDataFrame(rows).toDF("x", "y")
      .withColumn("z", ZOrder.zvalue(Seq(col("x"), col("y")), 16))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hi = (1L << 16) - 1
    def clamp(v: Long) = math.max(0L, math.min(v, hi))
    rows.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(Seq(clamp(x), clamp(y)), 16),
        s"($x, $y)")
    }
    // the aliasing failure this guards: 2^16 must NOT interleave like 0
    assert(got((1L << 16, 5L)) == got(((1L << 16) - 1, 5L)))
    assert(got((1L << 16, 5L)) != mortonRef(Seq(0L, 5L), 16))
  }

  test("zvalue SQL twin computes the identical code through spark.sql") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(100)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    spark.createDataFrame(rows).toDF("x", "y").createOrReplaceTempView("zt")
    val viaSql = spark.sql(
      s"SELECT x, y, ${ZOrder.zvalueSql(Seq("x", "y"), 16)} AS z FROM zt")
    viaSql.collect().foreach { r =>
      assert(r.getLong(2) == mortonRef(Seq(r.getLong(0), r.getLong(1)), 16))
    }
  }

  private def scannedRows(path: String, pred: org.apache.spark.sql.Column): Long = {
    val df = spark.read.parquet(path).filter(pred)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-order layout prunes a 2-d box scan that a 1-d sort cannot") {
    // controlled corpus: 200k uniform (x, y) points, written with small
    // row groups so each file carries many prunable groups
    val n = 200000
    val dim = 1 << 12
    val pts = spark.range(n.toLong)
      .select(
        pmod(xxhash64(col("id")), lit(dim.toLong)).as("x"),
        pmod(xxhash64(col("id"), lit(1)), lit(dim.toLong)).as("y"),
        col("id").as("payload"))
      .localCheckpoint(true)
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val rg = Map("parquet.block.size" -> (64 * 1024).toString)
    pts.orderBy("x") // 1-d layout: leading key only
      .coalesce(4).write.options(rg).mode("overwrite").parquet(s"$base/linear")
    ZOrder.layoutBy(pts, 12, "x", "y")
      .coalesce(4).write.options(rg).mode("overwrite").parquet(s"$base/zorder")
    // the 1-d layout is unbeatable on its leading column but cannot
    // prune on y AT ALL (every row group spans the full y range); the
    // z-layout prunes both. Measure both query shapes:
    val boxY = col("y").between(2000, 2200) // 5% of y, all of x
    val boxXY = col("x").between(1000, 1200) && col("y").between(2000, 2200)
    val zScanY = scannedRows(s"$base/zorder", boxY)
    val linScanY = scannedRows(s"$base/linear", boxY)
    val zScanXY = scannedRows(s"$base/zorder", boxXY)
    val linScanXY = scannedRows(s"$base/linear", boxXY)
    val hits = spark.read.parquet(s"$base/zorder").filter(boxY).count()
    assert(hits > 0, "empty box — test data broken")
    // y-selective: linear reads ~everything, z-order reads a strip
    assert(linScanY > (n * 9L) / 10,
      s"linear pruned a non-leading column?! scanned $linScanY of $n")
    assert(zScanY < linScanY / 3,
      s"z-order scanned $zScanY rows vs linear $linScanY (hits $hits)")
    // both-dims box: z-order stays within a small factor of the 1-d
    // sort's home game (the box straddles quad boundaries, so the
    // z-curve visits a few disjoint ranges)
    assert(zScanXY < n / 4,
      s"z-order box scan $zScanXY of $n — not clustering")
    assert(zScanXY <= linScanXY * 4,
      s"z-order box scan $zScanXY vs linear $linScanXY — locality lost")
  }

  test("incremental near-dup lookup prunes the band index to the batch's partitions") {
    import org.apache.spark.sql.functions._
    import graft.operators.IncrementalNearDup
    val dir = java.nio.file.Files.createTempDirectory("banddix").toFile
    try {
      val docs = Tables.documents(spark, sf)
      val history = docs.filter(col("doc_id") % 10 =!= 0)
      val batch = docs.filter(col("doc_id") % 10 === 0).limit(5)
      IncrementalNearDup.ingest(spark, dir.getPath, history, "doc_id", "text")
      val rows = IncrementalNearDup.bandRows(batch, "doc_id", "text", 16, 4)
        .withColumn("__bkt",
          pmod(xxhash64(col("band_idx"), col("band_hash")), lit(32)).cast("int"))
        .localCheckpoint(true)
      val touched = rows.select("__bkt").distinct().collect().map(_.getInt(0)).toSeq
      assert(touched.size < 32, "a 5-doc batch must not touch every index slice")
      val look = IncrementalNearDup.lookup(spark, dir.getPath, rows, touched, 16, 0.5)
      look.collect()
      // AQE nests the final plan inside the adaptive wrapper and its
      // query stages — unwrap recursively to reach the parquet scan
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def allNodes(p: SparkPlan): Seq[SparkPlan] =
        p.collect { case n => n }.flatMap {
          case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
          case q: QueryStageExec => allNodes(q.plan)
          case n => Seq(n)
        }
      val scans = allNodes(look.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "expected the stored-index parquet scan")
      scans.foreach { s =>
        assert(s.partitionFilters.exists(_.references.exists(_.name == "__bkt")),
          "the index scan must prune on the __bkt partition column:\n" + s)
        assert(s.relation.partitionSchema.fieldNames.contains("__bkt"))
      }
      // and the pruning is effective: files read < files on disk
      val filesOnDisk = Option(dir.listFiles()).getOrElse(Array.empty)
        .count(_.getName.startsWith("__bkt="))
      val partsRead = scans.map(_.selectedPartitions.partitionCount).sum
      assert(partsRead <= touched.size,
        s"read $partsRead index slices for a batch touching ${touched.size}")
      assert(partsRead < filesOnDisk,
        s"read $partsRead of $filesOnDisk slices — pruning ineffective")
    } finally LocalFs.rmrf(dir)
  }

  test("incremental embed dedup lookup prunes the cell index to the batch's cells") {
    import org.apache.spark.sql.functions._
    import graft.operators.{IncrementalEmbedDedup, KMeans}
    val dir = java.nio.file.Files.createTempDirectory("celldix").toFile
    try {
      graft.functions.VectorExpressions.register(spark)
      val base = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      IncrementalEmbedDedup.ingest(spark, dir.getPath, base,
        "vec_id", "embedding", k = 8, assignCells = 2)
      // a one-vector batch ranks into exactly its 2 nearest cells — the
      // lookup must read ONLY those slices of the 8-cell index
      val model = KMeans.load(spark, new java.io.File(dir, "_model").getPath)
      val batch = base.orderBy("vec_id").limit(1)
        .select((col("vec_id") + 30000000L).as("vec_id"), col("embedding"))
      val rows = IncrementalEmbedDedup.cellRows(
        batch, "vec_id", "embedding", model, 2).localCheckpoint(true)
      val touched = rows.select("__cell").distinct().collect().map(_.getInt(0)).toSeq
      assert(touched.size == 2, s"one vector must rank into 2 cells, got $touched")
      val look = IncrementalEmbedDedup.lookup(spark, dir.getPath, rows, touched, -1.0)
      look.collect()
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def allNodes(p: SparkPlan): Seq[SparkPlan] =
        p.collect { case n => n }.flatMap {
          case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
          case q: QueryStageExec => allNodes(q.plan)
          case n => Seq(n)
        }
      val scans = allNodes(look.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "expected the stored-index parquet scan")
      scans.foreach { s =>
        assert(s.partitionFilters.exists(_.references.exists(_.name == "__cell")),
          "the index scan must prune on the __cell partition column:\n" + s)
      }
      val cellsOnDisk = Option(dir.listFiles()).getOrElse(Array.empty)
        .count(_.getName.startsWith("__cell="))
      val partsRead = scans.map(_.selectedPartitions.partitionCount).sum
      assert(partsRead <= touched.size,
        s"read $partsRead index cells for a batch touching ${touched.size}")
      assert(partsRead < cellsOnDisk,
        s"read $partsRead of $cellsOnDisk cells — pruning ineffective")
    } finally LocalFs.rmrf(dir)
  }
}
