package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every q_gate_* key must VERDICT true on the spec corpus: a gate that
  * fails here would surface as a driver-side hash mismatch at sf0.01 —
  * this spec localizes the failure to the contract (recall floor,
  * serve==fit equality, incremental==full pin) before it reaches the
  * oracle compare. */
class GatesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("GateMemo evicts entries for a superseded sfDir (bounded lifetime)") {
    import graft.queries.GateMemo
    var evals = 0
    def make(tag: String) = { evals += 1; spark.range(3).toDF(tag) }
    // distinct names so this test can never collide with real gate keys
    GateMemo.frame(spark, "/tmp/__memo_dirA", "memo_spec_x")(make("a"))
    GateMemo.frame(spark, "/tmp/__memo_dirA", "memo_spec_x")(make("a"))
    assert(evals == 1, "same (sfDir, name) must hit the memo")
    // first touch of a NEW sfDir evicts dirA's entries...
    GateMemo.frame(spark, "/tmp/__memo_dirB", "memo_spec_y")(make("b"))
    // ...so returning to dirA recomputes (and evicts dirB in turn)
    GateMemo.frame(spark, "/tmp/__memo_dirA", "memo_spec_x")(make("a"))
    assert(evals == 3, "switching sfDir must evict the previous dir's entries")
  }

  graft.queries.Gates.all.foreach { q =>
    test(s"${q.name} verdicts true at sf0.001") {
      // a gate is only worth anything if the DRIVER can see it fail:
      // its oracle must be the constant true-verdict row (a gate
      // registered Q.noOracle would pass locally but be invisible to
      // the hash compare — the spec-only-signal failure mode gates
      // exist to eliminate)
      assert(q.oracle.exists(_.contains("true AS passed")),
        s"${q.name} must carry the constant-verdict oracle")
      val rows = q.run(spark, sf).collect()
      assert(rows.length == 1, s"${q.name} must emit exactly one verdict row")
      assert(rows.head.getString(0) == q.name)
      assert(rows.head.getBoolean(1), s"${q.name} contract violated at $sf")
    }
  }
}
