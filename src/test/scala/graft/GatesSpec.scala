package graft

import org.scalatest.funsuite.AnyFunSuite

/** The q_gate_* keys exist to surface quality contracts to the DRIVER
  * (their oracle is the constant passed=true row) — this spec keeps the
  * same signal local: every gate must hold on the spec corpus, and the
  * verdict row must have the exact (gate, passed) shape the oracle
  * hashes. */
class GatesSpec extends AnyFunSuite {
  import SparkTestSession._

  for (q <- graft.queries.Gates.all) {
    test(s"${q.name} passes on the spec corpus") {
      val rows = q.run(spark, sf).collect()
      assert(rows.length == 1, s"gate must emit exactly one verdict row")
      val r = rows.head
      assert(r.getString(0) == q.name)
      assert(r.getBoolean(1), s"${q.name} verdict is FALSE — quality contract broken")
      assert(q.oracle.exists(_.contains("true AS passed")),
        "gate oracle must pin the constant passed=true row")
    }
  }
}
