package graft.sources

import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._
import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericFixed, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.graftbridge.ConfBridge
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Avro container-file reader built on the classpath's Avro CORE library
 * (`org.apache.avro` — no spark-avro module ships with this build): the
 * interop format a migrating Hudi user hits first, because the
 * reference's DeltaStreamer source family is avro-headed (ref:
 * hudi-utilities sources/AvroDFSSource.java:38 — DFSPathSelector over
 * `.avro` files; AvroKafkaSource; AvroConvertor). Re-expressed
 * Spark-first: the driver reads ONE file header for the writer schema,
 * executors each open their own `DataFileReader` over hadoop `FsInput`
 * (any DFS the hadoop conf can reach), and rows land as a normal
 * DataFrame — so everything downstream (ingest, upsert, SQL) is engine-
 * standard.
 *
 * Supported schema subset (documented contract, fail-fast outside it):
 * record / array / map (string keys) / union-with-null, primitives,
 * enum→string, fixed→binary, logical types date, timestamp-millis/micros
 * and decimal(fixed/bytes). At 100 TB the read is one Spark task per
 * file (the inbox contract is many small-ish shipped files — the same
 * shape the reference's DFSPathSelector consumes).
 */
object AvroFiles {

  /** Avro → Spark type mapping over the supported subset. */
  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType
      else IntegerType
    case Schema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
        TimestampType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    // nullability is relaxed to nullable throughout (the way Spark's JSON
    // reader does): parquet round-trips re-relax element nullability
    // anyway, and a strict containsNull=false schema just turns the first
    // table conform into an un-castable plan
    case Schema.Type.RECORD => StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.name, sparkType(f.schema()))))
    case Schema.Type.ARRAY =>
      ArrayType(sparkType(nonNull(s.getElementType)), containsNull = true)
    case Schema.Type.MAP =>
      MapType(StringType, sparkType(nonNull(s.getValueType)), valueContainsNull = true)
    case Schema.Type.UNION => sparkType(nonNull(s))
    case t => throw new IllegalArgumentException(
      s"unsupported avro type $t in ${s.getFullName}")
  }

  /** The non-null branch of a `[null, T]` union (general unions are out of
    * the supported subset — fail fast with the offending schema). */
  private def nonNull(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else s.getTypes.asScala.filter(_.getType != Schema.Type.NULL).toList match {
      case one :: Nil => one
      case _ => throw new IllegalArgumentException(
        s"unsupported avro union (only [null, T]): $s")
    }

  /** Avro datum → Spark external row value (the shapes
    * SparkSession.createDataFrame accepts for each DataType). */
  private def convert(v: Any, s: Schema): Any = {
    if (v == null) return null
    val sch = nonNull(s)
    sch.getType match {
      case Schema.Type.STRING | Schema.Type.ENUM => v.toString
      case Schema.Type.BYTES => sch.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          val bytes = cloneBytes(v.asInstanceOf[ByteBuffer])
          new java.math.BigDecimal(new java.math.BigInteger(bytes), d.getScale)
        case _ => cloneBytes(v.asInstanceOf[ByteBuffer])
      }
      case Schema.Type.FIXED => sch.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          val bytes = v.asInstanceOf[GenericFixed].bytes()
          new java.math.BigDecimal(new java.math.BigInteger(bytes), d.getScale)
        case _ => v.asInstanceOf[GenericFixed].bytes().clone()
      }
      case Schema.Type.INT if sch.getLogicalType.isInstanceOf[LogicalTypes.Date] =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[Int].toLong))
      case Schema.Type.LONG => sch.getLogicalType match {
        case _: LogicalTypes.TimestampMillis =>
          new java.sql.Timestamp(v.asInstanceOf[Long])
        case _: LogicalTypes.TimestampMicros =>
          val micros = v.asInstanceOf[Long]
          val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
          ts
        case _ => v
      }
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(sch.getFields.asScala.toSeq.map(f =>
          convert(rec.get(f.pos()), f.schema())))
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(convert(_, sch.getElementType))
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map { case (k, mv) =>
          k.toString -> convert(mv, sch.getValueType)
        }.toMap
      case _ => v // boolean / int / float / double / plain long
    }
  }

  private def cloneBytes(bb: ByteBuffer): Array[Byte] = {
    val d = bb.duplicate()
    val out = new Array[Byte](d.remaining())
    d.get(out)
    out
  }

  /** Decode a BINARY column of raw avro datums (the Kafka wire shape —
    * no container header; ref: hudi-utilities sources/AvroKafkaSource.java
    * + AvroConvertor.fromAvroBinary + deser/KafkaAvroSchemaDeserializer,
    * which deserializes each record against a CONFIGURED source schema):
    * every row's `payloadCol` bytes are decoded against `schemaJson` (a
    * record schema in the supported subset) and the record's fields
    * REPLACE the payload column; every other envelope column (topic,
    * partition, offset, ts — whatever the source carried) passes through
    * unchanged, so the transform composes on a KafkaLikeSource /
    * ConfigDrivenIngest lane exactly like the Debezium/Maxwell
    * projections.
    *
    * Distributed: one GenericDatumReader per PARTITION (schema parse and
    * decoder are reused across the partition's rows), nothing driver-side.
    * A null payload yields null record fields (the envelope row survives);
    * corrupt bytes fail the task — the exactly-once ingest loop replays
    * the batch after the producer is fixed, data is never silently
    * dropped. */
  def decodeDatums(df: DataFrame, schemaJson: String,
      payloadCol: String = "value"): DataFrame = {
    val writer = new Schema.Parser().parse(schemaJson)
    require(writer.getType == Schema.Type.RECORD,
      s"avro payload schema must be a record, got $writer")
    val recType = sparkType(writer).asInstanceOf[StructType]
    val others = df.schema.fields.filter(_.name != payloadCol)
    require(others.length < df.schema.fields.length,
      s"payload column '$payloadCol' not found in ${df.schema.fieldNames.mkString(",")}")
    require(!others.exists(f => recType.fieldNames.contains(f.name)),
      s"decoded avro fields ${recType.fieldNames.mkString(",")} collide with " +
        s"envelope columns ${others.map(_.name).mkString(",")}")
    val outSchema = StructType(recType.fields ++ others)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val otherIdx = others.map(f => df.schema.fieldIndex(f.name))
    val spark = df.sparkSession
    val rows = df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson) // not serializable
      val reader = new GenericDatumReader[GenericRecord](schema)
      val factory = org.apache.avro.io.DecoderFactory.get()
      var decoder: org.apache.avro.io.BinaryDecoder = null
      val nulls = Seq.fill[Any](schema.getFields.size)(null)
      it.map { row =>
        val fields =
          if (row.isNullAt(payloadIdx)) nulls
          else {
            val bytes = row.getAs[Array[Byte]](payloadIdx)
            decoder = factory.binaryDecoder(bytes, decoder)
            val rec = reader.read(null, decoder)
            convert(rec, schema).asInstanceOf[Row].toSeq
          }
        Row.fromSeq(fields ++ otherIdx.map(row.get))
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Encode rows as raw avro datum bytes against `schemaJson` — the test
    * and tooling inverse of [[decodeDatums]] (what a Kafka producer's avro
    * serializer emits, sans registry framing). Column order and types must
    * match the schema's field order under [[sparkType]]. */
  def encodeDatum(schemaJson: String, values: Seq[Any]): Array[Byte] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    schema.getFields.asScala.zip(values).foreach { case (f, v) =>
      rec.put(f.pos(), toAvro(v, nonNull(f.schema())))
    }
    val out = new java.io.ByteArrayOutputStream()
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
    new org.apache.avro.generic.GenericDatumWriter[GenericRecord](schema)
      .write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** External Scala value → avro datum for the primitive/logical subset
    * the encoder needs (tests + tooling; not a hot path). */
  private def toAvro(v: Any, s: Schema): Any = v match {
    case null => null
    case ts: java.sql.Timestamp => s.getLogicalType match {
      case _: LogicalTypes.TimestampMicros =>
        ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L
      case _ => ts.getTime
    }
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case bd: java.math.BigDecimal =>
      ByteBuffer.wrap(bd.unscaledValue().toByteArray)
    case b: Array[Byte] => ByteBuffer.wrap(b)
    case other => other // string / int / long / float / double / boolean
  }

  /** The writer schema of one container file (driver-side header read). */
  def schemaOf(conf: Configuration, path: String): Schema = {
    val in = new FsInput(new HPath(path), conf)
    try {
      val r = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    } finally in.close()
  }

  /** Read avro container files as a DataFrame: one driver header read for
    * the schema, one Spark task per file. Files are decoded with the FIRST
    * file's schema as the reader schema — shipped batches are expected
    * schema-uniform (as in the reference's DFS inbox); a file written with
    * an older compatible schema resolves through standard avro schema
    * resolution. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "no avro files to read")
    val conf = spark.sparkContext.hadoopConfiguration
    val writerSchema = schemaOf(conf, paths.head)
    require(writerSchema.getType == Schema.Type.RECORD,
      s"top-level avro schema must be a record, got $writerSchema")
    val sparkSchema = sparkType(writerSchema).asInstanceOf[StructType]
    val schemaJson = writerSchema.toString
    val bconf = ConfBridge.broadcast(spark.sparkContext, conf)
    val rows = spark.sparkContext
      .parallelize(paths, math.max(1, math.min(paths.size, 32)))
      .flatMap { p =>
        val reader = new Schema.Parser().parse(schemaJson) // Schema is not serializable
        val in = new FsInput(new HPath(p), ConfBridge.value(bconf))
        val r = DataFileReader.openReader(in,
          new GenericDatumReader[GenericRecord](null, reader))
        // one streaming pass; the iterator closes its reader at the end so
        // a long inbox pull never accumulates open descriptors
        new Iterator[Row] {
          private var open = true
          def hasNext: Boolean = {
            val h = open && r.hasNext
            if (!h && open) { open = false; r.close(); in.close() }
            h
          }
          def next(): Row =
            convert(r.next(), reader).asInstanceOf[Row]
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
