package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-tier analytic SQL surface (still provenance-D, SURVEY §2.3):
  * pivot, statistical aggregates, percentiles, and recursive CTEs
  * (native in Spark 4.x — SURVEY §7 risk 5 applied to Spark 3.x only).
  */
object Analytics {

  /** PIVOT: status columns per priority. Oracle uses portable CASE
    * aggregation (identical semantics; DuckDB's PIVOT syntax differs). */
  val qPivot = Q(
    "q_pivot",
    """SELECT o_orderpriority,
      |       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 4) AS F,
      |       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 4) AS O,
      |       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 4) AS P
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum("o_totalprice"), 4))
      .orderBy("o_orderpriority")
  }

  /** Statistical aggregate family: corr / covariance / stddev / variance /
    * skewness-free portable subset (skewness normalization differs across
    * engines, so it stays out of the oracle set). */
  val qAggStats = Q(
    "q_agg_stats",
    """SELECT l_returnflag,
      |       round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
      |       round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
      |       round(stddev_samp(l_discount), 4) AS disc_stddev,
      |       round(var_samp(l_tax), 4) AS tax_var,
      |       round(min(l_quantity), 4) AS min_qty,
      |       round(max(l_quantity), 4) AS max_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(corr("l_quantity", "l_extendedprice"), 4).as("qty_price_corr"),
        round(covar_samp("l_quantity", "l_extendedprice"), 4).as("qty_price_covar"),
        round(stddev_samp(col("l_discount")), 4).as("disc_stddev"),
        round(var_samp(col("l_tax")), 4).as("tax_var"),
        round(min("l_quantity"), 4).as("min_qty"),
        round(max("l_quantity"), 4).as("max_qty"))
      .orderBy("l_returnflag")
  }

  /** Exact percentiles: continuous interpolation matches DuckDB
    * quantile_cont; the approximate twin (approx_percentile / HLL-style
    * sketches) is rows-only in q_agg_approx_percentile. */
  val qAggPercentile = Q(
    "q_agg_percentile",
    """SELECT o_orderstatus,
      |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
      .orderBy("o_orderstatus")
  }

  /** t-digest-style approximate percentiles — engine-specific sketch,
    * rows-only check; exact twin above is the oracle. */
  val qAggApproxPercentile = Q.noOracle("q_agg_approx_percentile") { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        round(expr("approx_percentile(o_totalprice, 0.5, 1000)"), 4).as("ap50"),
        round(expr("approx_percentile(o_totalprice, 0.9, 1000)"), 4).as("ap90"))
      .orderBy("o_orderstatus")
  }

  /** Recursive CTE — native `WITH RECURSIVE` through spark.sql (Spark
    * 4.x ships SPARK-24497; the reference's declared Postgres surface
    * includes recursion via its executeSql choke point,
    * pgliteService.ts:36-49). Query: reachable set + depth walking the
    * nationkey chain (src → src+1) from node 0. DuckDB's WITH RECURSIVE
    * is the oracle. [[Fixpoint.iterate]] remains the library API for
    * recursion that SQL can't express (custom convergence tests,
    * per-round checkpointing as in ConnectedComponents). */
  val qCteRecursive = Q(
    "q_cte_recursive",
    """WITH RECURSIVE reach(node, depth) AS (
      |  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS depth
      |  UNION ALL
      |  SELECT e.dst, r.depth + 1
      |  FROM reach r
      |  JOIN (SELECT n_nationkey AS src, n_nationkey + 1 AS dst
      |        FROM nation WHERE n_nationkey < 24) e
      |    ON e.src = r.node)
      |SELECT CAST(node AS BIGINT) AS node, CAST(depth AS BIGINT) AS depth
      |FROM reach ORDER BY node""".stripMargin) { (s, d) =>
    // each of the ~24 recursion steps re-executes the joined subquery;
    // checkpointing pins the (tiny) edge input in memory so the steps
    // replay a LogicalRDD instead of re-listing + re-reading parquet.
    // AQE is off for the recursion itself — re-optimizing 24 rows-sized
    // micro-steps costs ~20% (measured, PlanProbe) and buys nothing —
    // so the result is materialized eagerly under the restored-on-exit
    // setting (localCheckpoint preserves the ORDER BY for consumers).
    Tables.nation(s, d).localCheckpoint(true).createOrReplaceTempView("nation")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try s.sql(
      """WITH RECURSIVE reach(node, depth) AS (
        |  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS depth
        |  UNION ALL
        |  SELECT e.dst, r.depth + CAST(1 AS BIGINT)
        |  FROM reach r
        |  JOIN (SELECT CAST(n_nationkey AS BIGINT) AS src,
        |               CAST(n_nationkey + 1 AS BIGINT) AS dst
        |        FROM nation WHERE n_nationkey < 24) e
        |    ON e.src = r.node)
        |SELECT node, depth FROM reach ORDER BY node""".stripMargin)
      .localCheckpoint(true)
    finally s.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  /** UNPIVOT (wide→long): the inverse of q_pivot; also the reshape the
    * profiler's melt builds on. Oracle: portable UNION ALL. */
  val qUnpivot = Q(
    "q_unpivot",
    """SELECT o_orderkey, 'o_totalprice' AS metric, round(o_totalprice, 4) AS v FROM orders
      |UNION ALL
      |SELECT o_orderkey, 'o_custkey' AS metric, CAST(o_custkey AS DOUBLE) AS v FROM orders
      |ORDER BY o_orderkey, metric""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr("stack(2, 'o_totalprice', round(o_totalprice, 4), " +
          "'o_custkey', CAST(o_custkey AS DOUBLE)) AS (metric, v)"))
      .orderBy("o_orderkey", "metric")
  }

  /** Value histogram via explicit bucketing (portable: floor division —
    * width_bucket semantics differ across engines at the edges). */
  val qAggHistogram = Q(
    "q_agg_histogram",
    """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
      |       count(*) AS n,
      |       round(min(value), 4) AS lo, round(max(value), 4) AS hi
      |FROM events
      |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(floor(col("value") / 50.0).cast("bigint").as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min("value"), 4).as("lo"), round(max("value"), 4).as("hi"))
      .orderBy("bucket")
  }

  /** argmin/argmax aggregates. Ordering values are continuous doubles,
    * unique within each group in this data — deterministic; a production
    * user ties-breaks by composing the struct-max idiom instead. */
  val qAggArgmax = Q(
    "q_agg_argmax",
    """SELECT o_custkey,
      |       max_by(o_orderkey, o_totalprice) AS best_order,
      |       min_by(o_orderkey, o_totalprice) AS worst_order,
      |       round(max(o_totalprice), 4) AS best_price
      |FROM orders
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(
        max_by(col("o_orderkey"), col("o_totalprice")).as("best_order"),
        min_by(col("o_orderkey"), col("o_totalprice")).as("worst_order"),
        round(max("o_totalprice"), 4).as("best_price"))
      .orderBy("o_custkey")
  }

  /** Count-min sketch: sublinear-memory frequency estimation — the
    * at-scale substitute for exact per-key counts when the key space is
    * huge. The sketch aggregation is distributed (one pass, mergeable
    * buffers); the estimates read here are driver-side lookups on the
    * merged sketch. Deterministic (fixed seed) but engine-specific →
    * rows-only check; the unit test asserts the CMS overestimate
    * property against exact counts. */
  val qAggCountmin = Q.noOracle("q_agg_countmin") { (s, d) =>
    val cms = Tables.orders(s, d).stat
      .countMinSketch("o_custkey", eps = 0.001, confidence = 0.99, seed = 42)
    val keys = (1L to 10L).toSeq
    import s.implicits._
    keys.map(k => (k, cms.estimateCount(Long.box(k))))
      .toDF("o_custkey", "est_n")
      .orderBy("o_custkey")
  }

  /** approx_top_k (Spark 4 frequent-items sketch): heavy-hitter
    * estimation in sublinear memory. With maxItemsTracked ≥ the distinct
    * count the sketch degenerates to exact counts, which makes it
    * oracle-checkable here; at corpus scale the same call bounds memory
    * where an exact groupBy cannot. Output re-sorted (n DESC, item) for
    * a deterministic compare. */
  val qAggApproxTopk = Q(
    "q_agg_approxtopk",
    """SELECT o_orderpriority AS item, n, CAST(rnk AS BIGINT) AS rnk FROM (
      |  SELECT o_orderpriority, count(*) AS n,
      |         row_number() OVER (ORDER BY count(*) DESC, o_orderpriority) AS rnk
      |  FROM orders GROUP BY o_orderpriority) t
      |WHERE rnk <= 3 ORDER BY rnk""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .agg(expr("approx_top_k(o_orderpriority, 3, 100)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("n"))
      .withColumn("rnk", graft.functions.BoundedRank.rowNumberBounded(
        col("item"), col("n").desc, col("item")).cast("bigint"))
      .orderBy("rnk")
  }

  /** Z-order (Morton) layout key over (o_custkey, o_orderkey) — the
    * multi-dimensional clustering sort a 100 TB table is written in so
    * conjunctive range scans prune row groups on every dimension (see
    * graft.functions.ZOrder; pruning measured in LayoutSpec/SCALING.md).
    * The z-value is portable integer bit math — the oracle computes the
    * identical expression, so this layout key is hash-checked. */
  val qZorder = Q(
    "q_zorder",
    s"""SELECT o_orderkey, o_custkey,
       |  ${graft.functions.ZOrder.zvalueSql(Seq("o_custkey", "o_orderkey"), 24)} AS z
       |FROM orders
       |ORDER BY z, o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        graft.functions.ZOrder.zvalue(
          Seq(col("o_custkey"), col("o_orderkey")), 24).as("z"))
      .orderBy("z", "o_orderkey")
  }

  /** 2-D Pareto frontier (skyline): parts where no other part is
    * cheaper-or-equal AND larger-or-equal with one strict — the
    * "cheapest per capability" query. The naive formulation is an
    * all-pairs NOT EXISTS (|parts|² — the oracle keeps it, so the
    * frontier is independently derived); the Spark plan is the
    * O(n log n) monotone-frontier algorithm made distributed:
    * group to per-price max size (vocabulary-sized at any corpus),
    * then one [[graft.operators.CumMax]] exclusive running max over
    * price order (two narrow passes + ONE range exchange — never a
    * global-ORDER window, never a self-join), and a row survives iff
    * it holds its price's max size AND strictly beats everything
    * cheaper. Equal (price, size) ties all survive on both engines
    * (neither dominates the other). */
  val qSkyline = Q(
    "q_skyline",
    """WITH p AS (SELECT p_partkey, p_name, p_retailprice,
      |                  CAST(p_size AS BIGINT) AS p_size FROM part)
      |SELECT p_partkey, p_name, p_retailprice, p_size
      |FROM p a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM p b
      |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
      |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
      |ORDER BY p_retailprice, p_partkey""".stripMargin) { (s, d) =>
    val pp = Tables.part(s, d).select(col("p_partkey"), col("p_name"),
      col("p_retailprice"), col("p_size").cast("bigint").as("p_size"))
    val grouped = pp.groupBy("p_retailprice").agg(max("p_size").as("t"))
    val (withM, spent) = graft.operators.CumMax.runningMaxExclusive(
      grouped, "t", "m", Seq(col("p_retailprice")))
    // checkpoint hygiene (finish/spent pattern): the frontier is bounded
    // by the price vocabulary — materialize it, then free CumMax's
    // range-partitioned checkpoint instead of leaking it to the
    // ContextCleaner
    val res = pp.join(withM, "p_retailprice")
      .filter(col("p_size") === col("t") && col("p_size") > col("m"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
        col("p_size"))
      .orderBy("p_retailprice", "p_partkey")
      .localCheckpoint(true)
    GateMemo.unpersistCheckpoint(spent)
    res
  }

  val all: Seq[Q] =
    Seq(qPivot, qAggStats, qAggPercentile, qAggApproxPercentile,
      qCteRecursive, qUnpivot, qAggHistogram, qAggArgmax, qAggCountmin,
      qAggApproxTopk, qZorder, qSkyline)
}

/** Iterative fixpoint evaluation — the programmatic recursion API for
  * what SQL `WITH RECURSIVE` can't express (custom convergence tests,
  * per-round checkpoint/persist policy; see ConnectedComponents).
  * Accumulates `seed ∪ step(seed) ∪ step²(seed) ∪ …` until
  * a step yields no rows (or maxIterations).
  *
  * Scale notes: each step is one distributed join; the frontier is
  * localCheckpoint'd per iteration to cut the exponentially growing
  * lineage (the classic iterative-algorithm failure mode on Spark). */
object Fixpoint {
  def iterate(seed: DataFrame, step: DataFrame => DataFrame,
      maxIterations: Int): DataFrame = {
    var acc = seed
    var frontier = seed.localCheckpoint(true)
    var i = 0
    while (i < maxIterations && !frontier.isEmpty) {
      frontier = step(frontier).localCheckpoint(true)
      acc = acc.unionByName(frontier)
      i += 1
    }
    acc
  }
}
