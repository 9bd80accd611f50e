package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable contracts of the incremental ER store (distributed
  * union-find with lazy path compression): cascading merges forward old
  * roots instead of relabeling members, resolution follows chains,
  * replay is a content no-op, fold compacts chains to zero, and the
  * band-width pin refuses a mismatched ingest. The full-corpus parity
  * (incremental == rebuild on the real name vocabulary through a forced
  * cascade) is driver-pinned by `q_gate_er_incremental`. */
class IncrementalEntityResolutionSpec extends AnyFunSuite {
  import SparkTestSession._
  import operators.IncrementalEntityResolution._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_er").toString

  private def ing(dir: String, names: String*): Unit = {
    import spark.implicits._
    ingest(spark, dir, names.toDF("name"), "name")
  }

  private def res(dir: String): Map[String, String] =
    resolved(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  // planted chain: aaa—aab—abb—bbb (consecutive distance 1; aaa—bbb is
  // 3, aab—bbb and aaa—abb are 2) arriving in merge-cascading order
  test("cascading merges: roots forward, chains resolve, members never relabel") {
    val dir = freshDir()
    ing(dir, "abb", "bbb")                       // one pair -> root abb
    assert(res(dir) == Map("abb" -> "abb", "bbb" -> "abb"))
    assert(chainDepth(spark, dir) == 0, "no cross-batch merge yet")
    ing(dir, "aab")                              // merges in: new min aab
    assert(res(dir) == Map("aab" -> "aab", "abb" -> "aab", "bbb" -> "aab"))
    assert(chainDepth(spark, dir) == 1, "abb -> aab")
    ing(dir, "aaa")                              // cascades: new min aaa
    assert(res(dir) == Map("aaa" -> "aaa", "aab" -> "aaa",
      "abb" -> "aaa", "bbb" -> "aaa"))
    // bbb resolves through abb -> aab -> aaa: the 2-hop chain proves
    // the old cluster's member row was NEVER rewritten
    assert(chainDepth(spark, dir) == 2)
    // the ingest-time label rows are immutable history
    val raw = streaming.SnapshotStore
      .read(spark, s"$dir/labels").collect()
      .map(r => r.getString(r.fieldIndex("name")) ->
        r.getString(r.fieldIndex("root"))).toMap
    assert(raw("bbb") == "abb", "member label must keep its ingest-time root")
  }

  test("replaying a batch is a content no-op on labels, fwd, and resolution") {
    val dir = freshDir()
    ing(dir, "abb", "bbb")
    ing(dir, "aab")
    val before = res(dir)
    val fwdBefore = streaming.SnapshotStore.read(spark, s"$dir/fwd")
      .collect().map(_.toString).sorted.toSeq
    ing(dir, "aab") // replay (also models a genuine re-arrival)
    assert(res(dir) == before)
    val fwdAfter = streaming.SnapshotStore.read(spark, s"$dir/fwd")
      .collect().map(_.toString).sorted.toSeq
    assert(fwdAfter == fwdBefore)
  }

  test("fold compacts chains to zero and preserves resolution; life continues") {
    val dir = freshDir()
    ing(dir, "abb", "bbb")
    ing(dir, "aab")
    ing(dir, "aaa")
    val before = res(dir)
    fold(spark, dir)
    assert(chainDepth(spark, dir) == 0)
    assert(res(dir) == before)
    // post-fold arrival joins the compacted cluster
    ing(dir, "aax") // distance 1 from aaa
    assert(res(dir)("aax") == "aaa")
    // and a post-fold merge of two folded singletons still forwards
    ing(dir, "zzz")
    ing(dir, "zzy")
    assert(res(dir)("zzz") == "zzy" || res(dir)("zzz") == "zzz")
    assert(res(dir)("zzy") == res(dir)("zzz"),
      "post-fold merge must unify the pair")
  }

  test("autoFoldDepth: the ingest folds its own store past the chain budget") {
    val dir = freshDir()
    import spark.implicits._
    def ingAuto(names: String*): Unit =
      ingest(spark, dir, names.toDF("name"), "name", autoFoldDepth = Some(1))
    ingAuto("abb", "bbb")
    ingAuto("aab") // depth 1 — at budget, no fold
    assert(chainDepth(spark, dir) == 1, "at-budget chain must survive")
    ingAuto("aaa") // depth 2 — OVER budget, the ingest folds itself
    assert(chainDepth(spark, dir) == 0, "over-budget ingest must auto-fold")
    assert(res(dir) == Map("aaa" -> "aaa", "aab" -> "aaa",
      "abb" -> "aaa", "bbb" -> "aaa"), "resolution unchanged by auto-fold")
  }

  test("fold compacts the name index: replay-duplicated appends collapse") {
    val dir = freshDir()
    ing(dir, "abb", "bbb")
    ing(dir, "aab")
    ing(dir, "aab") // at-least-once replay appends duplicate index rows
    ing(dir, "aab")
    val idx = s"$dir/name_index"
    assert(spark.read.parquet(idx).count() == 5,
      "append-only index must hold one row per (batch, name) append")
    val before = res(dir)
    fold(spark, dir)
    assert(spark.read.parquet(idx).select("name").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("aab", "abb", "bbb"),
      "folded index = exactly the deduped labels key set")
    assert(res(dir) == before)
    // the compacted index still blocks: a new arrival matches history
    ing(dir, "aaa")
    assert(res(dir)("bbb") == "aaa")
  }

  test("a crashed index swap is recovered by the next ingest") {
    val dir = freshDir()
    ing(dir, "abb", "bbb")
    val before = res(dir)
    // simulate the one crash window where the live index dir is absent:
    // fold renamed live -> __fold_old and died before stage -> live
    // (stage holds a COMPLETE index — _SUCCESS was written by job commit)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val idx = new org.apache.hadoop.fs.Path(s"$dir/name_index")
    val stage = new org.apache.hadoop.fs.Path(s"$dir/name_index__fold_stage")
    assert(fs.rename(idx, stage), "fixture: move live index to stage")
    assert(fs.exists(new org.apache.hadoop.fs.Path(stage, "_SUCCESS")))
    ing(dir, "aab") // must recover the swap, then match against history
    assert(!fs.exists(stage) && fs.exists(idx))
    assert(res(dir) == Map("aab" -> "aab", "abb" -> "aab", "bbb" -> "aab"))
    assert(before("bbb") == "abb") // sanity: recovery really re-blocked
  }

  test("a singleton-only batch writes labels and matches nothing") {
    val dir = freshDir()
    ing(dir, "qqqqqqqq", "rrrrrrrrrrrr")
    assert(res(dir) == Map(
      "qqqqqqqq" -> "qqqqqqqq", "rrrrrrrrrrrr" -> "rrrrrrrrrrrr"))
  }

  test("band-width pin: a mismatched maxDist is refused loudly") {
    val dir = freshDir()
    ing(dir, "abc")
    import spark.implicits._
    val e = intercept[IllegalArgumentException](
      ingest(spark, dir, Seq("abd").toDF("name"), "name", maxDist = 3))
    assert(e.getMessage.contains("maxDist"))
  }
}
