package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator surface (SURVEY.md §2.3, provenance D): the SQL
  * capability the reference reaches by delegating every query string to an
  * embedded Postgres (`automated-data-catalog-&-etl/services/
  * pgliteService.ts:36-49`), re-expressed as native Spark DataFrame plans
  * so Catalyst/Tungsten own optimization and execution.
  *
  * Scale stance (100 TB): filters/projections sit directly on the parquet
  * scan (pushdown + pruning); dimension joins (`region`/`nation`/
  * `customer`/`supplier`/`part`) broadcast; fact-fact joins
  * (`lineitem`⋈`orders`) shuffle on the join key and are AQE-managed;
  * window functions partition by high-cardinality keys (customer, user)
  * so no single-partition global windows appear anywhere.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  // ---------------------------------------------------------------- projection / predicates

  val qProject = Q(
    "q_project",
    """SELECT l_orderkey, l_linenumber,
      |       round(l_extendedprice * (1 - l_discount), 4) AS revenue,
      |       upper(l_returnflag) AS flag
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, revenue, flag""".stripMargin) { (s, d) =>
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    // order by every output column for a total order (determinism rule).
    li(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
        upper(col("l_returnflag")).as("flag"))
      .orderBy("l_orderkey", "l_linenumber", "revenue", "flag")
  }

  val qFilterPred = Q(
    "q_filter_pred",
    """SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM orders
      |WHERE o_orderstatus IN ('F','O')
      |  AND o_totalprice BETWEEN 1000 AND 50000
      |  AND (o_orderpriority LIKE '1%' OR NOT o_orderstatus = 'F')
      |  AND o_orderdate IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    ord(s, d)
      .filter(
        col("o_orderstatus").isin("F", "O") &&
          col("o_totalprice").between(1000, 50000) &&
          (col("o_orderpriority").like("1%") || !(col("o_orderstatus") === "F")) &&
          col("o_orderdate").isNotNull)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val qCaseExpr = Q(
    "q_case_expr",
    """SELECT l_orderkey, l_linenumber,
      |       CASE WHEN l_quantity < 10 THEN 'low'
      |            WHEN l_quantity < 30 THEN 'mid'
      |            ELSE 'high' END AS band,
      |       coalesce(nullif(l_returnflag, 'N'), 'none') AS flag,
      |       round(greatest(l_discount, l_tax), 4) AS max_rate,
      |       round(least(l_discount, l_tax), 4) AS min_rate
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, band, flag, max_rate, min_rate""".stripMargin) { (s, d) =>
    li(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high").as("band"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag"),
        round(greatest(col("l_discount"), col("l_tax")), 4).as("max_rate"),
        round(least(col("l_discount"), col("l_tax")), 4).as("min_rate"))
      .orderBy("l_orderkey", "l_linenumber", "band", "flag", "max_rate", "min_rate")
  }

  // Dialect note: DuckDB CAST(double AS INT) rounds, Spark truncates —
  // floor() first on both sides so semantics agree (prices are positive).
  val qCast = Q(
    "q_cast",
    """SELECT o_orderkey,
      |       CAST(floor(o_totalprice) AS BIGINT) AS price_int,
      |       CAST(o_orderkey AS VARCHAR) AS key_str,
      |       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_day,
      |       TRY_CAST(o_orderpriority AS INTEGER) AS bad_int
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    ord(s, d)
      .select(
        col("o_orderkey"),
        floor(col("o_totalprice")).as("price_int"),
        col("o_orderkey").cast("string").as("key_str"),
        // DATE emitted as ISO string: engines disagree on date physical
        // repr in result sets; the string is hash-stable (SURVEY §7 risk 4)
        date_format(col("o_orderdate").cast("date"), "yyyy-MM-dd").as("order_day"),
        expr("TRY_CAST(o_orderpriority AS INT)").as("bad_int"))
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------- joins

  val qJoinInner = Q(
    "q_join_inner",
    """SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus, o.o_totalprice
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderstatus = 'F'
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin) { (s, d) =>
    val o = ord(s, d).filter(col("o_orderstatus") === "F")
    li(s, d).join(o, col("l_orderkey") === col("o_orderkey"), "inner")
      .select("l_orderkey", "l_linenumber", "o_orderstatus", "o_totalprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  val qJoinOuter = Q(
    "q_join_outer",
    """SELECT c.c_custkey, o.o_orderkey
      |FROM customer c FULL OUTER JOIN orders o
      |  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 150000
      |ORDER BY c.c_custkey NULLS FIRST, o.o_orderkey NULLS FIRST""".stripMargin) { (s, d) =>
    val c = cust(s, d)
    val o = ord(s, d)
    c.join(o, c("c_custkey") === o("o_custkey") && o("o_totalprice") > 150000, "full")
      .select(col("c_custkey"), col("o_orderkey"))
      .orderBy(col("c_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
  }

  /** Dimension-chain join: nation/region are fixed-size — broadcast both
    * so the customer scan never shuffles (BroadcastHashJoin at any SF). */
  val qJoinBroadcast = Q(
    "q_join_broadcast",
    """SELECT r.r_name, n.n_name,
      |       count(*) AS n_cust, round(avg(c.c_acctbal), 4) AS avg_bal
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name, n.n_name
      |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, d) =>
    cust(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_cust"), round(avg("c_acctbal"), 4).as("avg_bal"))
      .orderBy("r_name", "n_name")
  }

  /** Fact-fact join: force sort-merge (the strategy that survives when
    * neither side broadcasts at 100 TB); shuffle keyed on the join key. */
  val qJoinSortmerge = Q(
    "q_join_sortmerge",
    // money summed as integer CENTS (the q_cohort_ltv trick): a raw
    // double sum over ~150k rows per group wanders by whole ulps with
    // aggregation order — at sf0.1 the engines legitimately disagreed
    // past the 4dp rounding; cents sums are exact and the final single
    // divide of an exact integer is the same double everywhere
    """SELECT o.o_orderpriority, count(*) AS n_lines,
      |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
      |            AS DOUBLE) / 100.0 AS sum_price
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin) { (s, d) =>
    li(s, d).hint("merge")
      .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        (sum(round(col("l_extendedprice") * 100, 0).cast("bigint"))
          .cast("double") / 100.0).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** Skew-broken fact-×-dim join: same rows as a plain inner join (the
    * oracle IS the unsalted join) but the hot supplier keys fan out
    * over 8 salted reducers — the manual rewrite for when one key
    * dominates the fact side and the dim side is too big or too
    * reused to broadcast. Salt = deterministic row-identity hash, so
    * results are reproducible across runs and partitionings. */
  val qJoinSkewSalted = Q(
    "q_join_skew_salted",
    """SELECT s.s_nationkey, count(*) AS n_items,
      |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
      |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |GROUP BY s.s_nationkey
      |ORDER BY s.s_nationkey""".stripMargin) { (s, d) =>
    graft.operators.SkewJoin
      .saltedInner(li(s, d), Tables.supplier(s, d),
        "l_suppkey", "s_suppkey", salts = 8,
        factSalt = xxhash64(col("l_orderkey"), col("l_linenumber")))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy("s_nationkey")
  }

  val qJoinSemi = Q(
    "q_join_semi",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val o = ord(s, d).filter(col("o_totalprice") > 150000)
    cust(s, d).join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val qJoinAnti = Q(
    "q_join_anti",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val o = ord(s, d).filter(col("o_totalprice") > 150000)
    cust(s, d).join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Equi + range join (interval/overlap folded in, SURVEY §2.3): pairs of
    * events for the same user within 2 hours. The user_id equality keeps
    * the physical plan a hash/sort-merge join (scales: shuffle on
    * user_id), with the range predicate applied as a post-join filter —
    * never a nested-loop cross product. */
  val qJoinRange = Q(
    "q_join_range",
    """SELECT a.event_id AS eid_a, b.event_id AS eid_b, a.user_id
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 2 HOUR
      | AND a.event_type = 'signup' AND b.event_type = 'purchase'
      |ORDER BY eid_a, eid_b""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val a = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("eid_a"), col("user_id"), col("ts").as("ts_a"))
    val b = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("eid_b"), col("user_id").as("uid_b"), col("ts").as("ts_b"))
    a.join(b, col("user_id") === col("uid_b") &&
        col("ts_b") > col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr("INTERVAL 2 HOUR"))
      .select("eid_a", "eid_b", "user_id")
      .orderBy("eid_a", "eid_b")
  }

  val qJoinCross = Q(
    "q_join_cross",
    """SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
      |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, d) =>
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select("r_name", "n_name")
      .orderBy("r_name", "n_name")
  }

  /** As-of join (SURVEY §2.3, risk 3): for each `error` event, the most
    * recent strictly-prior `click` by the same user. Expressed as a
    * per-user ordered window with `last(..., ignoreNulls)` over
    * `ROWS UNBOUNDED PRECEDING .. 1 PRECEDING` — partitioned by user_id,
    * so it scales horizontally (no global sort, no nested loop). */
  val qJoinAsof = Q(
    "q_join_asof",
    """WITH w AS (
      |  SELECT event_id, user_id, event_type,
      |         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_event_id
      |  FROM events)
      |SELECT event_id, user_id, click_event_id
      |FROM w WHERE event_type = 'error'
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("click_event_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select("event_id", "user_id", "click_event_id")
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- aggregation

  /** TPC-H Q1 shape — the flagship (`SparkEntry.entry`). Partial (map-side)
    * aggregation + 2-phase hash agg come free from Catalyst; group key
    * cardinality is tiny so the shuffle is a few bytes regardless of SF. */
  val qAggGroup = Q(
    "q_agg_group",
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 4) AS sum_qty,
      |       round(sum(l_extendedprice), 4) AS sum_base,
      |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc,
      |       round(avg(l_quantity), 4) AS avg_qty,
      |       count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |HAVING count(*) > 0
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    li(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("n"))
      .filter(col("n") > 0)
      .orderBy("l_returnflag", "l_linestatus")
  }

  val qAggGlobal = Q(
    "q_agg_global",
    """SELECT count(*) AS n,
      |       round(sum(l_quantity), 4) AS sum_qty,
      |       round(min(l_extendedprice), 4) AS min_price,
      |       round(max(l_extendedprice), 4) AS max_price,
      |       round(avg(l_discount), 4) AS avg_disc
      |FROM lineitem""".stripMargin) { (s, d) =>
    li(s, d).agg(
      count(lit(1)).as("n"),
      round(sum("l_quantity"), 4).as("sum_qty"),
      round(min("l_extendedprice"), 4).as("min_price"),
      round(max("l_extendedprice"), 4).as("max_price"),
      round(avg("l_discount"), 4).as("avg_disc"))
  }

  val qAggDistinct = Q(
    "q_agg_distinct",
    """SELECT l_returnflag,
      |       count(DISTINCT l_suppkey) AS n_supp,
      |       round(sum(DISTINCT l_quantity), 4) AS sum_dq
      |FROM lineitem
      |GROUP BY l_returnflag
      |HAVING count(*) > 1
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    li(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        round(sum_distinct(col("l_quantity")), 4).as("sum_dq"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .drop("cnt")
      .orderBy("l_returnflag")
  }

  /** HLL sketch distinct — engine-specific estimate, so rows-only check
    * (SURVEY §2.3: no hash-oracle); the exact twin is q_agg_distinct.
    * Formulated as pre-distinct + plain count rather than mixing
    * approx_count_distinct with countDistinct in one agg: the mixed form
    * plans an Expand (row duplication per distinct-set) while this is
    * one partial-aggregated shuffle; the HLL estimate is identical on
    * deduplicated input (sketch registers ignore multiplicity). */
  val qAggApproxDistinct = Q.noOracle("q_agg_approx_distinct") { (s, d) =>
    li(s, d)
      .select("l_returnflag", "l_partkey")
      .distinct()
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count(lit(1)).as("exact_parts"))
      .orderBy("l_returnflag")
  }

  val qAggGroupingsets = Q(
    "q_agg_groupingsets",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |       round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    li(s, d).createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  val qAggRollup = Q(
    "q_agg_rollup",
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_extendedprice), 4) AS sum_price, count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    li(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_extendedprice"), 4).as("sum_price"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val qAggCube = Q(
    "q_agg_cube",
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    li(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 4).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** collect_set/collect_list (array_agg). Arrays sorted then joined to a
    * string so the hash compare is representation-stable across engines. */
  val qAggCollect = Q(
    "q_agg_collect",
    """SELECT o_custkey,
      |       array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
      |       count(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    ord(s, d)
      .groupBy("o_custkey")
      .agg(
        array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")
  }

  // ---------------------------------------------------------------- sort / limit / top-k

  val qSort = Q(
    "q_sort",
    """SELECT o_orderkey, o_orderpriority, o_totalprice
      |FROM orders
      |ORDER BY o_orderpriority DESC NULLS LAST, o_totalprice ASC, o_orderkey""".stripMargin) { (s, d) =>
    ord(s, d)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .orderBy(col("o_orderpriority").desc_nulls_last, col("o_totalprice").asc, col("o_orderkey").asc)
  }

  val qLimitOffset = Q(
    "q_limit_offset",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_orderkey LIMIT 100 OFFSET 50""".stripMargin) { (s, d) =>
    ord(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
      .offset(50)
      .limit(100)
  }

  /** Global top-k: orderBy + limit fuses into TakeOrderedAndProject —
    * per-partition top-k then a k-row merge on the driver; no full sort
    * and no full shuffle at any scale. */
  val qTopkGlobal = Q(
    "q_topk_global",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    ord(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
  }

  val qLimitPreview = Q(
    "q_limit_preview",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 10""".stripMargin) { (s, d) =>
    li(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")
      .limit(10)
  }

  // ---------------------------------------------------------------- set operations

  val qUnion = Q(
    "q_union",
    """SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION ALL
      |SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000
      |ORDER BY c_custkey, c_mktsegment""".stripMargin) { (s, d) =>
    val c = cust(s, d)
    c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey", "c_mktsegment")
      .unionByName(c.filter(col("c_acctbal") > 5000).select("c_custkey", "c_mktsegment"))
      .orderBy("c_custkey", "c_mktsegment")
  }

  val qIntersect = Q(
    "q_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val o = ord(s, d)
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
      .orderBy("o_custkey")
  }

  val qExcept = Q(
    "q_except",
    """SELECT c_custkey FROM customer
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    cust(s, d).select("c_custkey")
      .except(ord(s, d).select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- subqueries / CTE / SQL passthrough

  private def registerViews(s: SparkSession, d: String): Unit = {
    ord(s, d).createOrReplaceTempView("orders")
    cust(s, d).createOrReplaceTempView("customer")
    li(s, d).createOrReplaceTempView("lineitem")
  }

  /** Scalar + IN + correlated-EXISTS subqueries, Catalyst-decorrelated.
    * The same SQL text runs verbatim in DuckDB. */
  private val subquerySql =
    """SELECT o_orderkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      |ORDER BY o_orderkey""".stripMargin

  val qSubquery = Q("q_subquery", subquerySql) { (s, d) =>
    registerViews(s, d); s.sql(subquerySql)
  }

  private val cteSql =
    """WITH big_orders AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000),
      |cust_stats AS (
      |  SELECT o_custkey, count(*) AS n_big, round(sum(o_totalprice), 4) AS tot
      |  FROM big_orders GROUP BY o_custkey)
      |SELECT c.c_custkey, c.c_name, cs.n_big, cs.tot
      |FROM customer c JOIN cust_stats cs ON c.c_custkey = cs.o_custkey
      |ORDER BY c.c_custkey""".stripMargin

  val qCte = Q("q_cte", cteSql) { (s, d) =>
    registerViews(s, d); s.sql(cteSql)
  }

  /** The reference's arbitrary-SQL choke point (pgliteService.ts:36-49)
    * mapped to `spark.sql` over registered views. */
  private val passthroughSql =
    """SELECT o_orderstatus, count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  val qSqlPassthrough = Q("q_sql_passthrough", passthroughSql) { (s, d) =>
    registerViews(s, d); s.sql(passthroughSql)
  }

  /** Correlated LATERAL subquery with per-row ORDER BY + LIMIT (the SQL
    * form of per-group top-k); same SQL runs verbatim in DuckDB. */
  private val lateralSql =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |         WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |ORDER BY c_custkey, o_orderkey""".stripMargin

  val qLateral = Q("q_lateral", lateralSql) { (s, d) =>
    registerViews(s, d); s.sql(lateralSql)
  }

  val all: Seq[Q] = Seq(
    qProject, qFilterPred, qCaseExpr, qCast, qLateral,
    qJoinInner, qJoinOuter, qJoinBroadcast, qJoinSortmerge, qJoinSkewSalted, qJoinSemi,
    qJoinAnti, qJoinRange, qJoinCross, qJoinAsof,
    qAggGroup, qAggGlobal, qAggDistinct, qAggApproxDistinct,
    qAggGroupingsets, qAggRollup, qAggCube, qAggCollect,
    qSort, qLimitOffset, qTopkGlobal, qLimitPreview,
    qUnion, qIntersect, qExcept,
    qSubquery, qCte, qSqlPassthrough)
}
