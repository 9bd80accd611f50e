package graft.tools

import graft.GraftSession
import graft.queries.Catalog
import graft.catalog.Profile

/** Round-12 diagnosis harness for the q_etl_* bench regression (VERDICT
  * round-11 "What's wrong" #1): times each stage of the transform keys
  * separately so the regression can be attributed, not guessed. */
object EtlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  ${(System.nanoTime() - t0) / 1e9}%7.3f  $label"); r
    }
    (1 to 3).foreach { rep =>
      println(s"rep $rep")
      val messy = t("messyOrders build+count") {
        val m = Catalog.messyOrders(spark, sfDir); m.count(); m }
      val prof = t("Profile.of(messy)")(Profile.of(messy))
      val sql = t("TransformGen.transformSql")(
        graft.catalog.TransformGen.transformSql("messy_orders", prof))
      messy.createOrReplaceTempView("messy_orders")
      t("execute generated SQL")(spark.sql(sql).count())
      t("full q_etl_transform key")(
        Catalog.qEtlTransform.run(spark, sfDir).count())
    }
    spark.stop()
  }
}
