package graft.tools

import graft.{GraftSession, Tables}
import graft.catalog.Relations
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Catalog-family scaling probe for the two keys that now top the bench
  * (round-8 verdict task 7): composite-key discovery
  * (q_catalog_relations_composite — the deliberate TWO distinct-pair
  * scans of lineitem) and the knowledge-graph key's data-sized stage
  * (q_catalog_graph = melt-pruned exact discovery; its lineage half is
  * a fixed-size listener roundtrip independent of corpus scale).
  * Amplifies lineitem 10x by key-shifted copies and times both shapes
  * at 1x and 10x. Appends/replaces the "## Catalog family at 10x"
  * section of SCALING.md.
  * Run: `sbt "runMain graft.tools.CatalogScaleProbe"`.
  */
object CatalogScaleProbe {

  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def timeMin[T](body: => T): Double = (1 to 2).map(_ => time(body)).min

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/root/repo/target/catscale"
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- composite discovery: lineitem vs its l_linenumber<=2 head,
    // amplified 10x with the composite key structure preserved
    val li1 = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber")
    (0 until 10).map(i => li1.withColumn("l_orderkey", col("l_orderkey") + i * 10000000L))
      .reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$out/lineitem10")
    val li10 = spark.read.parquet(s"$out/lineitem10")
    val g = Seq("l_orderkey", "l_linenumber")
    def composite(li: DataFrame): Long = {
      val c = li.localCheckpoint(true)
      val n = Relations.discoverComposite(
        Seq("lineitem" -> c, "lineitem_head" -> c.filter(col("l_linenumber") <= 2)),
        Map("lineitem" -> Seq(g), "lineitem_head" -> Seq(g)),
        minContainment = 0.2).count()
      c.unpersist()
      n
    }

    // --- graph key's data-sized stage: melt-pruned exact discovery over
    // the driver tables with lineitem amplified (the other rel tables are
    // dimension-sized; lineitem dominates the melt)
    val base = (c: String) => c.replaceFirst("^[a-z]{1,2}_", "")
    val relTables = graft.queries.Catalog.relTables
    val recurring = relTables.flatMap { case (t, cols) => cols.map(c => (t, base(c))) }
      .groupBy(_._2).filter(_._2.map(_._1).distinct.size >= 2).keySet
    def trimmed(liOverride: Option[DataFrame]): Seq[(String, DataFrame)] =
      relTables.flatMap { case (t, cols) =>
        val keep = cols.filter(c => recurring(base(c)))
        if (keep.isEmpty) None
        else {
          val df = if (t == "lineitem") liOverride.getOrElse(
            Tables.load(spark, sf, t)) else Tables.load(spark, sf, t)
          Some(t -> df.select(keep.filter(df.columns.contains).map(col): _*))
        }
      }
    val liFull1 = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey")
    (0 until 10).map(i => Seq("l_orderkey", "l_partkey", "l_suppkey")
        .foldLeft(liFull1)((d, c) => d.withColumn(c, col(c) + i * 10000000L)))
      .reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$out/lineitem_ids10")
    val liIds10 = spark.read.parquet(s"$out/lineitem_ids10")
    def graphStage(li: Option[DataFrame]): Long =
      Relations.discover(trimmed(li)).count()

    composite(li1); graphStage(None) // warm-up off the 1x clock

    val c1 = timeMin(composite(li1)); val c10 = timeMin(composite(li10))
    val g1 = timeMin(graphStage(None)); val g10 = timeMin(graphStage(Some(liIds10)))

    val section = new StringBuilder
    section.append("\n## Catalog family at 10x (composite discovery + graph stage)\n\n")
    section.append("lineitem amplified 10x by key-shifted copies (6M rows); the other\n")
    section.append("rel tables stay 1x (dimension-sized — lineitem dominates the melt):\n\n")
    section.append("| operator | 1x sec | 10x sec | time ratio | vs linear |\n")
    section.append("|---|---|---|---|---|\n")
    section.append(f"| composite discovery (q_catalog_relations_composite) | $c1%.2f | $c10%.2f | ${c10 / c1}%.1fx | ${c10 / c1 / 10 * 100}%.0f%% |\n")
    section.append(f"| graph FK stage (q_catalog_graph, melt-pruned discover) | $g1%.2f | $g10%.2f | ${g10 / g1}%.1fx | ${g10 / g1 / 10 * 100}%.0f%% |\n")
    section.append("\nFinding: composite discovery's cost is the TWO distinct-pair scans\n")
    section.append("of lineitem (full + head subset) feeding one value-keyed exchange —\n")
    section.append("a deliberate shape: each group melts as one collision-safe\n")
    section.append("concatenated value, so the exchange carries distinct PAIRS (not\n")
    section.append("rows) and everything above it is catalog-sized. The graph key's\n")
    section.append("data-sized stage is the same single-melt discover the relations key\n")
    section.append("runs, pre-pruned to recurring base names; its lineage half is a\n")
    section.append("fixed-size listener roundtrip that does not scale with the corpus.\n")

    val path = java.nio.file.Paths.get("/root/repo/SCALING.md")
    val cur = java.nio.file.Files.readString(path)
    val marker = "\n## Catalog family at 10x"
    val bas = cur.indexOf(marker) match {
      case -1 => cur
      case i =>
        val rest = cur.indexOf("\n## ", i + marker.length)
        if (rest == -1) cur.substring(0, i) else cur.substring(0, i) + cur.substring(rest)
    }
    java.nio.file.Files.writeString(path, bas + section.toString)
    println(section.toString)
    spark.stop()
  }
}
