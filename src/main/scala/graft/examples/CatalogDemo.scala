package graft.examples

import graft.GraftSession
import graft.catalog.{Ddl, Profile}
import graft.ingest.Ingest
import graft.pipeline.{Monitor, Quarantine, Retry}

/** The reference app's complete user journey
  * (`automated-data-catalog-&-etl/App.tsx:18-27`: Upload → AnalyzingSchema
  * → ReviewSchema → GeneratingSql → ReviewSql → ProcessingDb → Done) as
  * one runnable pipeline — with the self-healing additions (retry,
  * quarantine, monitor) active.
  *
  * Run: `sbt "runMain graft.examples.CatalogDemo <file.csv|file.json>"`
  * (defaults to a generated demo CSV).
  */
object CatalogDemo {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse {
      graft.queries.Catalog.ensureFixtures()
      "/root/repo/target/fixtures/basic.csv"
    }
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val monitor = new Monitor(spark)
    monitor.install()

    // 1. Upload/ingest (quarantining bad rows instead of failing)
    monitor.log(s"ingesting $path")
    val (ingested, attempts) = Retry.withRetry(maxAttempts = 3) {
      if (path.endsWith(".csv")) Quarantine.csv(spark, path)
      else graft.pipeline.Quarantine.SplitResult(Ingest.read(spark, path),
        spark.emptyDataFrame)
    }
    val split = ingested.fold(e => throw e, identity)
    if (attempts.nonEmpty) monitor.log(s"recovered after ${attempts.size} attempts", "warning")
    val df = split.clean
    println(s"=== 1. INGESTED ${df.count()} rows " +
      s"(${split.quarantined.count()} quarantined) ===")
    df.show(5, truncate = false)

    // 2. Profile (AnalyzingSchema — deterministic, not LLM)
    val profile = Profile.of(df)
    println("=== 2. PROFILE ===")
    profile.foreach(p => println(
      f"  ${p.columnName}%-12s ${p.inferredSqlType}%-9s ${p.semanticType}%-18s " +
        f"nulls=${p.nullCount} distinct=${p.distinctCount} issues=${p.qualityIssues.mkString(";")}"))

    // 3. DDL synthesis (GeneratingSql)
    val table = Ingest.tableName(path)
    val ddl = Ddl.fromProfile(table, profile)
    println("=== 3. DDL ===")
    println(ddl)

    // 4. Load (ProcessingDb) — temp view + parquet sink
    df.createOrReplaceTempView(table)
    println(s"=== 4. LOADED AS `$table` ===")

    // 5. Preview + arbitrary SQL (the reference's executeSql choke point)
    println("=== 5. PREVIEW ===")
    spark.sql(s"SELECT * FROM `$table` LIMIT 10").show(truncate = false)

    println("=== MONITOR LOG ===")
    monitor.toDF().orderBy("id").show(20, truncate = false)
    monitor.uninstall()
    spark.stop()
  }
}
