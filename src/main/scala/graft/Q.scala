package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine operator: a named DataFrame query over a
  * scale-factor directory, plus (when SQL-expressible with identical
  * semantics) the equivalent DuckDB oracle SQL the driver hash-compares
  * against (SURVEY.md §5.1).
  *
  * Determinism contract for every query (SURVEY.md §2 tail):
  *   - final op is ORDER BY on a unique key combination;
  *   - computed doubles rounded to 4 decimals on BOTH sides;
  *   - derived integer columns cast to BIGINT on BOTH sides (DuckDB
  *     promotes year()/len()/sum(int) to BIGINT/HUGEINT, Spark to INT);
  *   - `events.ts` (parquet ns, Spark truncates to micros) never output
  *     raw — always through date_trunc or epoch arithmetic.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Oracle-checked query. */
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  /** Rows-only-checked query (semantics not expressible in portable SQL:
    * engine-specific hashes, approximate results, file-format round-trips). */
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
