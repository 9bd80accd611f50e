package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

/** Salted skew join (operators/SkewJoin.scala): result equivalence with
  * the plain join, actual fan-out of the hot key, guardrails, and the
  * registered key's plan shape. */
class SkewJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted inner join is row-identical to the plain join under skew") {
    import spark.implicits._
    // hot key 1 carries 90% of the fact side
    val fact = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (1L + i % 7, 1000L + i))).toDF("k", "payload")
    val dim = (1L to 8L).map(k => (k, s"d$k")).toDF("dk", "name")
    val salted = SkewJoin.saltedInner(fact, dim, "k", "dk", salts = 4,
      factSalt = xxhash64(col("payload")))
      .select("k", "payload", "dk", "name")
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("k", "payload", "dk", "name")
    assert(salted.orderBy("k", "payload").collect()
      .sameElements(plain.orderBy("k", "payload").collect()))
  }

  test("the hot key's rows actually spread over several salts") {
    import spark.implicits._
    val fact = (1 to 900).map(i => (1L, i.toLong)).toDF("k", "payload")
    val spread = fact
      .select(pmod(xxhash64(col("payload")), lit(4)).as("salt"))
      .distinct().count()
    assert(spread == 4L, s"900 hot rows should hit all 4 salts, got $spread")
  }

  test("guardrails: salt collision and degenerate salt count") {
    import spark.implicits._
    val fact = Seq((1L, 2L)).toDF("k", "__salt")
    val dim = Seq((1L, "d")).toDF("dk", "name")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedInner(fact, dim, "k", "dk", 4, xxhash64(col("k")))
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedInner(dim, dim, "dk", "dk", 0, xxhash64(col("dk")))
    }
    // salts = 1 degenerates to the plain join (single replica, salt 0)
    val one = SkewJoin.saltedInner(
      Seq((1L, 10L)).toDF("k", "v"), dim, "k", "dk", 1, xxhash64(col("v")))
    assert(one.count() == 1L)
  }

  test("q_join_skew_salted joins on (key, salt) with no cartesian product") {
    val plan = graft.queries.Relational.qJoinSkewSalted
      .run(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "salt must be part of the join key")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }

  test("a null salt expression keeps the fact row (row-for-row identity)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // salt from a NULLABLE column (xxhash64 would mask the null — it
    // hashes NULL to its seed — so salt on the raw column): pmod(null,
    // salts) is null and would match no replicated dim row — the row
    // must still join
    val fact = Seq((1L, Some(7L)), (1L, None)).toDF("k", "session")
    val dim = Seq((1L, "x")).toDF("dk", "dv")
    val out = SkewJoin.saltedInner(fact, dim, "k", "dk", 4, col("session"))
    assert(out.count() == 2L, "the null-session fact row must not be dropped")
  }
}
