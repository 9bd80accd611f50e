package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** AvroIO round-trip invariants: every mapped primitive (including the
  * date/timestamp logical types and nulls in every column) survives
  * write → read bit-exactly, and unmappable types are refused loudly. */
class AvroIOSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(name: String): String = {
    val f = new java.io.File(s"target/test_avro/$name")
    LocalFs.rmrf(f)
    f.getAbsolutePath
  }

  test("all mapped primitives round-trip, nulls included") {
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("ts", TimestampNTZType)))
    val rows = Seq(
      Row(1L, 2, 3.5, 4.5f, "five", true, Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2024-02-29").toLocalDate,
        java.time.LocalDateTime.parse("2024-02-29T12:34:56.789")),
      Row(null, null, null, null, null, null, null, null, null),
      Row(-9L, -8, -7.25, -6.125f, "", false, Array[Byte](),
        java.time.LocalDate.ofEpochDay(0),
        java.time.LocalDateTime.parse("1970-01-01T00:00:00")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
    val dir = freshDir("prims")
    graft.sources.AvroIO.write(df, dir)
    val back = graft.sources.AvroIO.read(spark, dir, schema)
    assert(back.schema == schema)
    val a = df.orderBy(col("l").asc_nulls_first).collect()
    val b = back.orderBy(col("l").asc_nulls_first).collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      (0 until schema.length).foreach { i =>
        (x.get(i), y.get(i)) match {
          case (p: Array[Byte], q: Array[Byte]) =>
            assert(java.util.Arrays.equals(p, q), s"col $i binary mismatch")
          case (p, q) => assert(p == q, s"col $i: $p != $q")
        }
      }
    }
  }

  test("round-trip preserves aggregates over a real table slice") {
    val slice = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice", "l_returnflag", "l_shipdate")
    val dir = freshDir("lineitem")
    graft.sources.AvroIO.write(slice, dir)
    val back = graft.sources.AvroIO.read(spark, dir, slice.schema)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum("l_orderkey"),
        round(sum("l_extendedprice"), 2),
        max("l_shipdate").cast("string")).head()
    assert(agg(back) == agg(slice))
  }

  test("a declared column the writer lacks reads as null (schema drift)") {
    // the staging contract's lenient read: the reader declares the
    // schema it expects; a column missing from the file resolves to
    // null via the by-name row assembly (no Avro reader schema is set —
    // the resolver costs 1.46x per record, BASELINE round-17 note)
    val written = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "a"), Row(2L, "b")), 1),
      written)
    val dir = freshDir("drift")
    graft.sources.AvroIO.write(df, dir)
    val declared = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("added_later", DoubleType)))
    val back = graft.sources.AvroIO.read(spark, dir, declared)
      .orderBy("k").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(back.forall(_.isNullAt(2)))
    // and the reader-schema builder still gives union fields a null
    // default, so any consumer that DOES declare it as a reader schema
    // resolves missing writer fields leniently too
    val f = graft.sources.AvroIO.toAvroSchema(declared).getField("added_later")
    assert(f.hasDefaultValue)
  }

  test("a writer type mismatching the declared type fails with a named field") {
    // round-17 advice: with no Avro reader schema there is no
    // resolution-time type promotion, so an int-written / long-declared
    // field must fail ONCE per file with a clear message instead of a
    // ClassCastException deep in a task
    val written = StructType(Seq(
      StructField("k", IntegerType), StructField("v", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1, "a")), 1), written)
    val dir = freshDir("typemismatch")
    graft.sources.AvroIO.write(df, dir)
    val declared = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val e = intercept[org.apache.spark.SparkException] {
      graft.sources.AvroIO.read(spark, dir, declared).collect()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg.contains("'k'") && msg.contains("INT"))
  }

  test("unmappable nested types are refused loudly") {
    val e = intercept[IllegalArgumentException] {
      graft.sources.AvroIO.toAvroSchema(StructType(Seq(
        StructField("arr", ArrayType(LongType)))))
    }
    assert(e.getMessage.contains("staging sink"))
  }
}
