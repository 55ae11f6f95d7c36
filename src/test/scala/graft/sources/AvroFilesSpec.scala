package graft.sources

import java.io.File
import java.nio.ByteBuffer
import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import graft.TestSpark
import graft.table._
import graft.streaming.{ContinuousIngest, DfsSource}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Avro container interop via the core avro library (ref: hudi-utilities
  * sources/AvroDFSSource.java — the reference's avro-headed DFS inbox). */
class AvroFilesSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("graft_avro_").toString

  private val schema: Schema = SchemaBuilder.record("Evt").fields()
    .requiredLong("id")
    .requiredString("name")
    .optionalDouble("score")
    .name("tags").`type`().array().items().stringType().noDefault()
    .name("attrs").`type`().map().values().longType().noDefault()
    .name("nested").`type`().record("Sub").fields()
      .requiredInt("a").optionalString("b").endRecord().noDefault()
    .name("ts").`type`(LogicalTs.micros).noDefault()
    .name("payload").`type`().bytesType().noDefault()
    .endRecord()

  private object LogicalTs {
    val micros: Schema = {
      val s = Schema.create(Schema.Type.LONG)
      org.apache.avro.LogicalTypes.timestampMicros().addToSchema(s)
    }
  }

  private def rec(id: Long, name: String, score: java.lang.Double): GenericRecord = {
    val r = new GenericData.Record(schema)
    r.put("id", id)
    r.put("name", name)
    r.put("score", score)
    r.put("tags", java.util.List.of(s"t$id", "x"))
    r.put("attrs", java.util.Map.of("k", java.lang.Long.valueOf(id)))
    val sub = new GenericData.Record(schema.getField("nested").schema())
    sub.put("a", id.toInt)
    sub.put("b", if (id % 2 == 0) null else s"b$id")
    r.put("nested", sub)
    r.put("ts", 1704067200000000L + id) // 2024-01-01 UTC in micros
    r.put("payload", ByteBuffer.wrap(Array[Byte](id.toByte, 1, 2)))
    r
  }

  private def writeAvro(path: String, rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(path))
    try rows.foreach(w.append) finally w.close()
  }

  test("container files read as a DataFrame: schema mapping + values") {
    val dir = tmp()
    writeAvro(s"$dir/f1.avro", (1L to 3L).map(i => rec(i, s"n$i", i * 0.5)))
    writeAvro(s"$dir/f2.avro", Seq(rec(4L, "n4", null)))
    val df = AvroFiles.read(spark, Seq(s"$dir/f1.avro", s"$dir/f2.avro"))
    assert(df.schema("id").dataType === LongType)
    assert(df.schema("score").dataType === DoubleType && df.schema("score").nullable)
    assert(df.schema("tags").dataType === ArrayType(StringType, containsNull = true))
    assert(df.schema("attrs").dataType === MapType(StringType, LongType, valueContainsNull = true))
    assert(df.schema("nested").dataType.isInstanceOf[StructType])
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.schema("payload").dataType === BinaryType)
    val rows = df.collect().sortBy(_.getAs[Long]("id"))
    assert(rows.length === 4)
    assert(rows(0).getAs[String]("name") === "n1")
    assert(rows(0).getAs[Seq[String]]("tags") === Seq("t1", "x"))
    assert(rows(0).getAs[Map[String, Long]]("attrs") === Map("k" -> 1L))
    assert(rows(0).getAs[org.apache.spark.sql.Row]("nested").getAs[Int]("a") === 1)
    assert(rows(3).isNullAt(rows(3).fieldIndex("score")))
    assert(rows(1).getAs[org.apache.spark.sql.Row]("nested")
      .isNullAt(1), "even ids carry null b")
    assert(rows(0).getAs[java.sql.Timestamp]("ts").toInstant.toString
      === "2024-01-01T00:00:00.000001Z")
    assert(rows(0).getAs[Array[Byte]]("payload").toSeq === Seq[Byte](1, 1, 2))
    GraftTable.drop(dir)
  }

  test("avro DFS inbox -> ingest loop: exactly-once across pulls and restart") {
    val inbox = tmp(); val tdir = tmp()
    val t = GraftTable.create(spark, tdir, TableConfig("avro_t", CopyOnWrite,
      keyFields = Seq("id"), precombineField = Some("score")))
    writeAvro(s"$inbox/0001.avro", (1L to 5L).map(i => rec(i, s"n$i", 1.0)))
    writeAvro(s"$inbox/0002.avro", (6L to 8L).map(i => rec(i, s"n$i", 1.0)))
    val src = new DfsSource(spark, inbox, format = "avro", maxFilesPerPull = 1)
    val ci = new ContinuousIngest(t, src.forTable(t), operation = "upsert",
      compactEvery = 0)
    try assert(ci.drain() === 2) finally ci.close() // one commit per file
    assert(t.snapshot().count() === 8)
    assert(ContinuousIngest.lastCheckpointFor(t, "dfs") === Some("0002.avro"))
    // restart with one new file: only it is ingested (name watermark)
    writeAvro(s"$inbox/0003.avro", Seq(rec(9L, "n9", 2.0), rec(5L, "n5b", 9.0)))
    val ci2 = new ContinuousIngest(t,
      new DfsSource(spark, inbox, format = "avro").forTable(t),
      operation = "upsert", compactEvery = 0)
    try assert(ci2.drain() === 1) finally ci2.close()
    val snap = t.snapshot()
    assert(snap.count() === 9)
    import spark.implicits._
    assert(snap.filter(org.apache.spark.sql.functions.col("id") === 5L)
      .select("name").as[String].collect().toSeq === Seq("n5b"))
    GraftTable.drop(inbox); GraftTable.drop(tdir)
  }
}
