package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container-file round-trip over the Hadoop mapreduce formats —
  * the row-oriented staging format next to the columnar parquet/ORC
  * sinks (reference STORE.md:2-3 declares a staging tier; S14 covers
  * ORC, this covers the row-major interchange format every ingestion
  * mesh still speaks). The environment ships avro-core + avro-mapred
  * but NOT the spark-avro connector, so this is the honest last-resort
  * tier of the operator preference order: RDD-level per-partition IO
  * against `AvroKeyInput/OutputFormat`, with the DataFrame/Row bridge
  * kept to exactly one narrow map on each side — no shuffle, no
  * driver-side data, schema shipped as JSON text (Avro `Schema` is not
  * serializable-stable across tasks).
  *
  * Type surface: the snapshot/staging primitives the engine's tables
  * use — BIGINT/INT, DOUBLE/FLOAT, STRING, BOOLEAN, BINARY, DATE
  * (Avro `int` + date logical type) and TIMESTAMP_NTZ/LTZ (Avro `long`
  * micros) — each nullable via the standard `[null, T]` union. Nested
  * types are out of scope for a STAGING sink (the columnar formats own
  * analytics-side nesting).
  */
object AvroIO {

  /** Spark field type → (Avro schema JSON fragment builder). */
  private def avroType(dt: DataType): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case StringType => Schema.create(Schema.Type.STRING)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      org.apache.avro.LogicalTypes.date()
        .addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType | TimestampNTZType =>
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case other => throw new IllegalArgumentException(
      s"AvroIO staging sink does not map $other — project it to a " +
        "primitive (columnar sinks own nested analytics types)")
  }

  /** The record schema for a Spark schema — every field nullable via
    * the `[null, T]` union (Spark nullability is advisory). */
  def toAvroSchema(schema: StructType, name: String = "graft_record"): Schema = {
    val fields = schema.fields.map { f =>
      val u = Schema.createUnion(
        List(Schema.create(Schema.Type.NULL), avroType(f.dataType)).asJava)
      // null default: when this schema is declared as the READER schema
      // (read() below), a writer file missing a declared column must
      // resolve to null — the lenient behavior the writer-schema
      // fallback had before the reader declaration (round-16 advice);
      // without the default, Avro schema resolution rejects the file
      new Schema.Field(f.name, u, null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    val rec = Schema.createRecord(name, null, "graft", false)
    rec.setFields(fields.toList.asJava)
    rec
  }

  /** Spark value → Avro value under the field's declared type. */
  private def toAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (d: java.time.LocalDate, DateType) => d.toEpochDay.toInt
    case (t: java.sql.Timestamp, _) =>
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    case (t: java.time.Instant, _) =>
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    case (t: java.time.LocalDateTime, _) =>
      t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
        t.getNano / 1000L
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (x, _) => x
  }

  /** Avro value → Spark row value under the target Spark type.
    * `java8` mirrors spark.sql.datetime.java8API.enabled — the
    * RowEncoder's EXTERNAL type for DATE/TIMESTAMP depends on it
    * (TIMESTAMP_NTZ is always LocalDateTime). */
  private def fromAvro(v: Any, dt: DataType, java8: Boolean): Any = (v, dt) match {
    case (null, _) => null
    case (i: Integer, DateType) =>
      val d = java.time.LocalDate.ofEpochDay(i.toLong)
      if (java8) d else java.sql.Date.valueOf(d)
    case (l: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(l, 1000000L), (Math.floorMod(l, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (l: java.lang.Long, TimestampType) =>
      val inst = java.time.Instant.ofEpochSecond(
        Math.floorDiv(l, 1000000L), Math.floorMod(l, 1000000L) * 1000L)
      if (java8) inst else java.sql.Timestamp.from(inst)
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (x, _) => x
  }

  /** Silence the per-task "Reader schema was not set" warning exactly
    * once per JVM (read() deliberately skips the reader-schema
    * declaration — see the note there). A lazy val rather than a call
    * per read(): Configurator.setLevel mutates global JVM log config,
    * so repeating it per read is both redundant and a wider mute than
    * intended (round-17 advice). */
  private lazy val silenceReaderSchemaWarning: Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      classOf[AvroKeyInputFormat[_]].getName,
      org.apache.logging.log4j.Level.ERROR)

  /** With no reader schema declared, Avro schema-resolution type
    * PROMOTION (int→long, float→double, …) never runs, so a writer
    * field whose type differs from the declared Spark type would reach
    * [[fromAvro]] raw and surface as a ClassCastException deep in a
    * task. Validate once per writer schema instead and fail with a
    * message naming the field (round-17 advice). Accepts a `[null, T]`
    * union or plain T on the writer side. */
  private def checkWriterType(name: String, writer: Schema,
      declared: DataType): Unit = {
    val w =
      if (writer.getType == Schema.Type.UNION)
        writer.getTypes.asScala.find(_.getType != Schema.Type.NULL)
          .getOrElse(writer)
      else writer
    val expect = avroType(declared)
    if (w.getType != expect.getType)
      throw new IllegalStateException(
        s"Avro staging read: field '$name' was written as ${w.getType} " +
          s"but is declared $declared (needs ${expect.getType}); no " +
          "reader-schema resolution runs here, so rewrite the file or " +
          "declare the writer's type")
  }

  /** Write `df` as an Avro container-file directory (one file per
    * partition, the standard hadoop layout). Row → GenericRecord is the
    * only map; no shuffle, no collect. */
  def write(df: DataFrame, path: String): Unit = {
    // overwrite semantics like every other sink here (.mode("overwrite")
    // on the parquet/ORC paths): Hadoop's checkOutputSpecs refuses a
    // pre-existing dir, which would make every RE-RUN of a caller fail
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val sparkSchema = df.schema
    val schemaJson = toAvroSchema(sparkSchema).toString
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    val fieldTypes = sparkSchema.fields.map(_.dataType)
    df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      rows.map { r =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fieldTypes.length) {
          rec.put(i, toAvro(r.get(i), fieldTypes(i))); i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Read an Avro container-file directory back under `sparkSchema`
    * (the staging contract: reader declares the schema it expects, the
    * Avro reader resolves names). GenericRecord → Row is the only map. */
  def read(spark: SparkSession, path: String, sparkSchema: StructType): DataFrame = {
    val fields = sparkSchema.fields.map(f => (f.name, f.dataType))
    val java8 = spark.conf
      .get("spark.sql.datetime.java8API.enabled", "false").toBoolean
    // Deliberately NOT declaring a reader schema: with one set, the
    // Avro record reader decodes every record through a
    // ResolvingDecoder even when reader == writer structurally — a
    // measured 1.46x on the whole round-trip key (2.27 s vs 1.56 s
    // min-of-4 at sf0.1/local[32]; the round-16 regression's cause).
    // The staging contract's lenient semantics survive without it:
    // the Row assembly below pulls fields BY NAME from the writer
    // record (GenericData.Record.get(name) returns null for a field
    // the writer lacks), so a missing declared column still reads as
    // null and extra writer columns are ignored. What is given up is
    // Avro-side type PROMOTION (int→long etc.) — out of scope for a
    // staging tier whose writer is [[write]] above. The per-task
    // "Reader schema was not set" warning is pointed at exactly this
    // fallback, so silence that one logger here (in-process executors
    // under local[*]; a real cluster sets the same logger level in its
    // log4j2 properties).
    silenceReaderSchemaWarning
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    val rows = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      job.getConfiguration)
      .mapPartitions { it =>
        // field positions resolved ONCE per writer schema, not per
        // record: by-name access is a hash lookup per field per record
        // (and Avro 1.12's Record.get(name) THROWS on a field the
        // writer lacks — the lenient null is decided here instead);
        // -1 marks a declared column absent from the file
        var cached: Schema = null
        var pos: Array[Int] = null
        it.map { case (k, _) =>
          val rec = k.datum()
          val rs = rec.getSchema
          if (rs ne cached) {
            cached = rs
            pos = fields.map { case (n, dt) =>
              val f = rs.getField(n)
              if (f == null) -1
              else { checkWriterType(n, f.schema(), dt); f.pos }
            }
          }
          val vals = new Array[Any](fields.length)
          var i = 0
          while (i < fields.length) {
            vals(i) =
              if (pos(i) < 0) null
              else fromAvro(rec.get(pos(i)), fields(i)._2, java8)
            i += 1
          }
          Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
