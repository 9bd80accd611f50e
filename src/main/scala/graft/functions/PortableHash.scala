package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hash for selection operators
  * (sampling, splits, mixture weighting): a 31-bit multiply-xorshift
  * mixer whose every intermediate stays below 2^62, so the arithmetic
  * is exact signed-64 in Spark AND any ANSI SQL engine with plain
  * BIGINT math — a DuckDB oracle recomputes the identical value from
  * the identical expression tree. Bound: keys must stay < ~3.4e9
  * (2^63 / 2654435761); hash upstream for wider id spaces. */
object PortableHash {

  def column(c: Column): Column = {
    val h1 = pmod(c * lit(2654435761L), lit(2147483648L))
    val m1 = h1.bitwiseXOR(shiftright(h1, 15))
    val h2 = pmod(m1 * lit(1597334677L), lit(2147483648L))
    h2.bitwiseXOR(shiftright(h2, 13))
  }

  /** The mixer folded to [0, 1000) — per-mille selection buckets. */
  def permille(c: Column): Column = pmod(column(c), lit(1000L))
}
