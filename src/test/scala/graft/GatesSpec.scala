package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every q_gate_* key must VERDICT true on the spec corpus: a gate that
  * fails here would surface as a driver-side hash mismatch at sf0.01 —
  * this spec localizes the failure to the contract (recall floor,
  * serve==fit equality, incremental==full pin) before it reaches the
  * oracle compare. */
class GatesSpec extends AnyFunSuite {
  import SparkTestSession._

  graft.queries.Gates.all.foreach { q =>
    test(s"${q.name} verdicts true at sf0.001") {
      val rows = q.run(spark, sf).collect()
      assert(rows.length == 1, s"${q.name} must emit exactly one verdict row")
      assert(rows.head.getString(0) == q.name)
      assert(rows.head.getBoolean(1), s"${q.name} contract violated at $sf")
    }
  }
}
