package graft.tools

import graft.GraftSession
import graft.operators.FuzzyBlocking
import org.apache.spark.sql.functions._

/** The uniform-length blocking hazard, measured (rows pasted into
  * SCALING.md): a fixed-width vocabulary (ids, codes) collapses
  * length-banding into ONE band — candidate pairs grow quadratically —
  * while pigeonhole segment blocking keys on segment CONTENT and stays
  * linear-ish in the vocabulary. Vocabulary: random fixed-length-12
  * lowercase names (seeded), 5% of them planted 1-substitution variants
  * of another name, so the true pair set is ~5% of n and any quadratic
  * blowup is pure candidate waste.
  *
  * Run: `sbt "runMain graft.tools.SegmentBlockingProbe"`. */
object SegmentBlockingProbe {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def timeMin(body: => Unit): Double = (1 to 3).map(_ => time(body)).min

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def vocab(n: Int): org.apache.spark.sql.DataFrame = {
      val rnd = new scala.util.Random(42)
      val base = Iterator.continually(
        (1 to 12).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
        .distinct.take(n).toVector
      val names = base ++ base.take(n / 20).map { s =>
        val i = rnd.nextInt(s.length)
        s.updated(i, if (s(i) == 'z') 'a' else (s(i) + 1).toChar)
      }
      names.distinct.toDF("n").localCheckpoint(true)
    }

    def pairCount(df: org.apache.spark.sql.DataFrame,
        f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
          Int) => org.apache.spark.sql.DataFrame): Long =
      f(df.select(col("n").as("a")), df.select(col("n").as("b")), 2)
        .filter(col("a") < col("b")).count()

    println(f"${"n"}%8s ${"banded_s"}%9s ${"segment_s"}%10s pairs")
    for (n <- Seq(5000, 10000, 20000)) {
      val v = vocab(n)
      val tB = timeMin(pairCount(v, FuzzyBlocking.bandedPairs))
      val tS = timeMin(pairCount(v, FuzzyBlocking.segmentPairs))
      val p = pairCount(v, FuzzyBlocking.segmentPairs)
      println(f"$n%8d $tB%9.2f $tS%10.2f $p")
    }
    // the regime banding cannot enter: segment blocking alone at 100k
    for (n <- Seq(100000)) {
      val v = vocab(n)
      val tS = timeMin(pairCount(v, FuzzyBlocking.segmentPairs))
      val p = pairCount(v, FuzzyBlocking.segmentPairs)
      println(f"$n%8d ${"skip"}%9s $tS%10.2f $p")
    }
    spark.stop()
  }
}
