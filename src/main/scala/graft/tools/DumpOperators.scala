package graft.tools

import graft.{GraftSession, SparkEntry}
import java.nio.file.{Files, Paths}

/** Regenerates OPERATORS.md: one row per registered query key with its
  * check class and output schema (resolved by analyzing each plan at
  * sf0.001). Run after registry changes:
  * `sbt "runMain graft.tools.DumpOperators"`. */
object DumpOperators {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# OPERATORS — registered query keys (generated)\n\n")
    sb.append(s"${SparkEntry.registry.size} keys; 'oracle' = DuckDB hash-compare, ")
    sb.append("'rows' = rows-only + unit tests.\nRegenerate: `sbt \"runMain ")
    sb.append("graft.tools.DumpOperators\"`.\n\n")
    sb.append("| key | check | output schema |\n|---|---|---|\n")
    SparkEntry.registry.sortBy(_.name).foreach { q =>
      val schema =
        try q.run(spark, sfDir).schema.map(f =>
          s"${f.name}:${f.dataType.simpleString}").mkString(", ")
        catch { case e: Throwable => s"ERROR ${e.getMessage.take(60)}" }
      val check = if (q.oracle.isDefined) "oracle" else "rows"
      sb.append(s"| `${q.name}` | $check | $schema |\n")
    }
    Files.writeString(Paths.get("/root/repo/OPERATORS.md"), sb.toString)
    println(s"wrote OPERATORS.md (${SparkEntry.registry.size} keys)")
    spark.stop()
  }
}
