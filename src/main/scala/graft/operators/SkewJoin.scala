package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew breaker for when one join key
  * carries a disproportionate share of the fact side (the classic
  * hot-customer / null-key / default-value skew). A plain shuffle join
  * sends every row of the hot key to ONE reducer; that task runs for
  * hours while the rest of the stage idles, and AQE's skew-join split
  * (which this library leaves enabled) only helps sort-merge joins
  * whose partitions it can split after the fact.
  *
  * Salting rewrites the join so the hot key fans out BEFORE the
  * shuffle: the dimension side is replicated `salts` times (one copy
  * per salt value), the fact side tags each row with a deterministic
  * salt from a row-identity hash, and the join key becomes
  * (key, salt) — every fact row still meets exactly one copy of its
  * dimension row, so the result is row-for-row identical to the
  * unsalted join, but the hot key's rows now spread over `salts`
  * reducers.
  *
  * Cost model: the dimension side grows `salts`×, so this is for
  * fact-×-dim joins where the dim side is small-ish but too big (or
  * too skewed downstream) to broadcast outright; `salts` trades
  * replication cost against the worst key's parallelism. Works for any
  * join the (key, salt) rewrite preserves: inner and left-semi/anti
  * out of the box; right/full outer would need salt-aware null
  * handling and is refused.
  */
object SkewJoin {

  /** Inner-join `fact` to `dim` on `factKey == dimKey`, salted `salts`
    * ways. `factSalt` must be a deterministic row-identity expression
    * over fact columns (e.g. a key hash) — it only needs to spread
    * rows, not be unique. */
  def saltedInner(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, salts: Int,
      factSalt: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "__salt column name collides with an input column")
    // int literals -> array<int>, so the exploded salt is already int
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // a NULL factSalt (e.g. a hash of a nullable column) would make the
    // salt NULL, match no replicated dim row, and silently DROP fact
    // rows the unsalted join keeps — coalesce to bucket 0 so every row
    // keeps exactly one salt and the row-for-row identity contract holds
    val saltedFact = fact.withColumn("__salt",
      pmod(coalesce(factSalt, lit(0L)), lit(salts)).cast("int"))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey)
          && saltedFact("__salt") === saltedDim("__salt"),
        "inner")
      .drop("__salt")
  }
}
