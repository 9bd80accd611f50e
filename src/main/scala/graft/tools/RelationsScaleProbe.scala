package graft.tools

import graft.{GraftSession, Tables}
import graft.catalog.Relations
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relationship-discovery scaling probe: amplifies every table 10× by
  * key-shifted copies (all id-like columns shift in lockstep, so the FK
  * structure — and therefore the verdict table — is preserved per copy),
  * then times the exact and sketch operators at 1× and 10×.
  *
  * Appends/replaces the "## Cross-dataset relationship discovery"
  * section of SCALING.md.
  * Run: `sbt "runMain graft.tools.RelationsScaleProbe"`.
  */
object RelationsScaleProbe {

  private def amplify(df: DataFrame, copies: Int, offset: Long): DataFrame = {
    val ids = Relations.idLikeColumns(df)
    (0 until copies).map { i =>
      ids.foldLeft(df)((d, c) => d.withColumn(c, col(c) + i * offset))
    }.reduce(_.unionByName(_))
  }

  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def timeMin[T](body: => T): Double = (1 to 2).map(_ => time(body)).min

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/root/repo/target/relscale"
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val tabs1 = names.map(n => n -> Tables.load(spark, sf, n))
    // materialize the 10x tables once (excluded from the timings)
    tabs1.foreach { case (n, df) =>
      amplify(df, 10, 10000000L).write.mode("overwrite").parquet(s"$out/$n")
    }
    val tabs10 = names.map(n => n -> spark.read.parquet(s"$out/$n"))

    def exact(tabs: Seq[(String, DataFrame)]): Long = Relations.discover(tabs).count()
    def sketch(tabs: Seq[(String, DataFrame)]): Long = Relations.sketchDiscover(tabs).count()
    exact(tabs1); sketch(tabs1) // warm-up: codegen + JIT off the 1x clock

    val e1 = timeMin(exact(tabs1)); val e10 = timeMin(exact(tabs10))
    val s1 = timeMin(sketch(tabs1)); val s10 = timeMin(sketch(tabs10))

    val section = new StringBuilder
    section.append("\n## Cross-dataset relationship discovery at 10x\n\n")
    section.append("All 10 tables amplified 10x by key-shifted copies (id columns\n")
    section.append("shift in lockstep, preserving the FK structure), so the melt is\n")
    section.append("10x rows and 10x distinct values:\n\n")
    section.append("| operator | 1x sec | 10x sec | time ratio | vs linear |\n")
    section.append("|---|---|---|---|---|\n")
    section.append(f"| exact containment (q_catalog_relations) | $e1%.2f | $e10%.2f | ${e10 / e1}%.1fx | ${e10 / e1 / 10 * 100}%.0f%% |\n")
    section.append(f"| KMV sketch (q_catalog_relations_sketch) | $s1%.2f | $s10%.2f | ${s10 / s1}%.1fx | ${s10 / s1 / 10 * 100}%.0f%% |\n")
    section.append("\nFinding: the exact operator's only data-sized stages (single-scan\n")
    section.append("melt + one value-keyed exchange) scale with the data; everything\n")
    section.append("above them is catalog-sized. The sketch's exchange is k-bounded\n")
    section.append("per column per map partition (bottom_k_distinct), so its cost is\n")
    section.append("dominated by the scan itself — the wide-catalog path.\n")

    val path = java.nio.file.Paths.get("/root/repo/SCALING.md")
    val cur = java.nio.file.Files.readString(path)
    val marker = "\n## Cross-dataset relationship discovery"
    val base = cur.indexOf(marker) match {
      case -1 => cur
      case i =>
        val rest = cur.indexOf("\n## ", i + marker.length)
        if (rest == -1) cur.substring(0, i) else cur.substring(0, i) + cur.substring(rest)
    }
    java.nio.file.Files.writeString(path, base + section.toString)
    println(section.toString)
    spark.stop()
  }
}
