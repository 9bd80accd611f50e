package graft.tools

import graft.GraftSession
import graft.operators.ConnectedComponents
import org.apache.spark.sql.DataFrame

/** Deep-graph clustering probe: min-label propagation (O(diameter)
  * rounds) vs large-star/small-star contraction (O(log n) rounds) on a
  * planted deep chain — the adversarial topology for label propagation
  * (every near-dup chain of incremental edits produces one).
  *
  * Appends/replaces the "## Deep-graph clustering" section of SCALING.md.
  * Run: `sbt "runMain graft.tools.DeepChainProbe"`.
  */
object DeepChainProbe {

  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = 96 // chain diameter 95: min-label needs ~a round per hop
    val chain: DataFrame = (0L until n.toLong).sliding(2)
      .map(p => (p(0), p(1))).toSeq.toDF("a", "b").localCheckpoint(true)

    // smallest converging round budget = the measured round count (both
    // algorithms throw on non-convergence). Star contraction: linear
    // probe from 2 (the answer is log-sized). Min-label: binary search —
    // a linear probe would cost Σi rounds ≈ diameter²/2 Spark jobs.
    def converges(run: Int => Long)(i: Int): Boolean =
      scala.util.Try(run(i)).isSuccess
    val starOk = converges(i =>
      ConnectedComponents.runStarContraction(chain, "a", "b", maxIter = i).count()) _
    val labelOk = converges(i =>
      ConnectedComponents.run(chain, "a", "b", maxIter = i).count()) _
    val starRounds = Iterator.from(2).find(starOk).get
    var (lo, hi) = (starRounds, n + 1) // converges at n+1 by construction
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (labelOk(mid)) hi = mid else lo = mid + 1
    }
    val labelRounds = lo

    // warm-up happened inside the round probes; time the converged runs
    val tLabel = time(ConnectedComponents.run(chain, "a", "b", maxIter = n).count())
    val tStar = time(
      ConnectedComponents.runStarContraction(chain, "a", "b", maxIter = 25).count())

    val section = new StringBuilder
    section.append("\n## Deep-graph clustering: min-label vs star contraction\n\n")
    section.append(s"Planted ${n}-node chain (diameter ${n - 1}) — the worst case for\n")
    section.append("label propagation; every round is a full shuffle-join over the\n")
    section.append("edge set, so ROUND COUNT is the cluster-scale cost (per-round\n")
    section.append("data is tiny here; at corpus scale each round is a corpus-sized\n")
    section.append("shuffle).\n\n")
    section.append("| algorithm | rounds to converge | wall sec (local) |\n")
    section.append("|---|---|---|\n")
    section.append(f"| min-label propagation (q_dedup_cluster path) | $labelRounds | $tLabel%.1f |\n")
    section.append(f"| star contraction (q_dedup_cluster_star path) | $starRounds | $tStar%.1f |\n")
    section.append(f"\nFinding: ${labelRounds}/${starRounds} = " +
      f"${labelRounds.toDouble / starRounds}%.0fx fewer rounds on the deep chain —\n")
    section.append("at 100 TB that is the difference between ~hundred sequential\n")
    section.append("corpus shuffles and ~" + starRounds + ". Near-dup clusters are usually\n")
    section.append("shallow (diameter ≤ a handful), where min-label's one join per\n")
    section.append("round beats star contraction's two — ship both, pick by the\n")
    section.append("expected chain depth (PropertySpec pins their equivalence).\n")

    val path = java.nio.file.Paths.get("/root/repo/SCALING.md")
    val cur = java.nio.file.Files.readString(path)
    val marker = "\n## Deep-graph clustering"
    val base = cur.indexOf(marker) match {
      case -1 => cur
      case i => // replace the existing section (it extends to the next "## " or EOF)
        val rest = cur.indexOf("\n## ", i + marker.length)
        if (rest == -1) cur.substring(0, i) else cur.substring(0, i) + cur.substring(rest)
    }
    java.nio.file.Files.writeString(path, base + section.toString)
    println(section.toString)
    spark.stop()
  }
}
