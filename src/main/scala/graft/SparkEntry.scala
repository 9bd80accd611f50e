package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every implemented operator's query key (SURVEY.md §2) from
  * the per-module registries. */
object SparkEntry {

  /** All registered operator queries, in SURVEY §2 order. */
  def registry: Seq[Q] =
    graft.queries.Relational.all ++
      graft.queries.Windows.all ++
      graft.queries.Functions.all ++
      graft.queries.TimeWindows.all ++
      graft.queries.EventAnalytics.all ++
      graft.queries.Commerce.all ++
      graft.queries.Graphs.all ++
      graft.queries.Catalog.all ++
      graft.queries.Analytics.all ++
      graft.queries.Extensions.all ++
      graft.queries.Training.all ++
      graft.queries.Gates.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped aggregate over lineitem (SURVEY §7 step 0). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
