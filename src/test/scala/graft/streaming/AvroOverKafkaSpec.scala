package graft.streaming

import java.nio.file.Files
import scala.collection.mutable.ArrayBuffer
import graft.TestSpark
import graft.sources.AvroFiles
import graft.table.{GraftTable, MergeOnRead, TableConfig}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Avro-over-Kafka, composed the way the reference builds it (ref:
  * hudi-utilities sources/AvroKafkaSource.java — a Kafka source whose
  * records deserialize against a configured source schema via
  * KafkaAvroSchemaDeserializer / AvroConvertor): [[KafkaLikeSource]] pulls
  * bounded offset ranges of (value: binary) envelopes and
  * [[AvroFiles.decodeDatums]] decodes them as a ContinuousIngest
  * transform — closing the source matrix's last gap (json/parquet/csv/
  * orc/avro-DFS/jdbc/sql/incr/cloud-events/kafka-json/kafka-avro). */
class AvroOverKafkaSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val schemaJson =
    """{"type":"record","name":"cust","fields":[
      |{"name":"id","type":"long"},
      |{"name":"v","type":["null","string"],"default":null},
      |{"name":"amt_cents","type":"long"}]}""".stripMargin

  private def tmp(): String = Files.createTempDirectory("graft_avrok_").toString

  /** Two-partition fake broker of raw avro datum bytes (what a producer's
    * binary avro serializer emits), append-only. */
  private class Broker {
    val parts: Map[Int, ArrayBuffer[Array[Byte]]] =
      Map(0 -> ArrayBuffer.empty, 1 -> ArrayBuffer.empty)
    def add(p: Int, values: Any*): Unit =
      parts(p) += AvroFiles.encodeDatum(schemaJson, values)
    def puller: OffsetRangePuller = new OffsetRangePuller {
      def latestOffsets(): Map[Int, Long] =
        parts.map { case (p, b) => p -> b.size.toLong }
      def earliestOffsets(): Map[Int, Long] = parts.map { case (p, _) => p -> 0L }
      def fetch(ranges: Map[Int, (Long, Long)]): DataFrame =
        ranges.toSeq.sortBy(_._1)
          .flatMap { case (p, (from, until)) =>
            parts(p).slice(from.toInt, until.toInt).map(b => (b, p)) }
          .toDF("value", "kafka_partition")
    }
  }

  private def loop(t: GraftTable, b: Broker, maxPerPull: Long) = {
    val src = new KafkaLikeSource(b.puller, maxEventsPerPull = maxPerPull,
      topic = Some("avro.customers"))
    new ContinuousIngest(t, src.forTable(t),
      transforms = Seq(df => AvroFiles.decodeDatums(df, schemaJson)
        .drop("kafka_partition")),
      operation = "upsert", compactEvery = 0)
  }

  test("decodeDatums: record fields replace the payload, envelope columns pass through") {
    val bytes = AvroFiles.encodeDatum(schemaJson, Seq(7L, "x", 120L))
    val df = Seq((bytes, "t1", 42L)).toDF("value", "topic", "offset")
    val out = AvroFiles.decodeDatums(df, schemaJson)
    assert(out.columns.toSeq === Seq("id", "v", "amt_cents", "topic", "offset"))
    val r = out.collect()(0)
    assert((r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
      r.getLong(4)) === ((7L, "x", 120L, "t1", 42L)))
    // null union branch decodes to null; null payload keeps the envelope row
    val mixed = Seq(
      (AvroFiles.encodeDatum(schemaJson, Seq(8L, null, 5L)), "t1", 43L),
      (null.asInstanceOf[Array[Byte]], "t1", 44L)).toDF("value", "topic", "offset")
    val rows = AvroFiles.decodeDatums(mixed, schemaJson)
      .orderBy("offset").collect()
    assert(rows(0).getLong(0) === 8L && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).getLong(4) === 44L)
    // colliding envelope column names are rejected loudly
    val e = intercept[IllegalArgumentException](AvroFiles.decodeDatums(
      Seq((bytes, 1L)).toDF("value", "id"), schemaJson))
    assert(e.getMessage.contains("collide"))
  }

  test("exactly-once avro decode over bounded Kafka pulls, across restart") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("avrok", MergeOnRead,
      keyFields = Seq("id")))
    val b = new Broker
    b.add(0, 1L, "a", 100L)
    b.add(0, 2L, "b", 200L)
    b.add(1, 3L, null, 300L)
    // maxPerPull 2 forces multiple bounded pulls to drain 3 events
    val ci = loop(t, b, maxPerPull = 2)
    try assert(ci.drain() >= 2) finally ci.close()
    assert(t.snapshot().select("id", "v", "amt_cents")
      .as[(Long, Option[String], Long)].collect().sortBy(_._1).toSeq ===
      Seq((1L, Some("a"), 100L), (2L, Some("b"), 200L), (3L, None, 300L)))

    // RESTART from a fresh instance: the kafka: offset map resumes exactly
    val t2 = GraftTable.load(spark, dir)
    val ci2 = loop(t2, b, maxPerPull = 10)
    try assert(ci2.drain() === 0) finally ci2.close()

    // post-restart events upsert through the same lane
    b.add(1, 2L, "b2", 250L)
    val ci3 = loop(t2, b, maxPerPull = 10)
    try assert(ci3.drain() === 1) finally ci3.close()
    assert(t2.snapshot().filter($"id" === 2L).select("v", "amt_cents")
      .as[(String, Long)].collect().toSeq === Seq(("b2", 250L)))
    val ck = ContinuousIngest.lastCheckpointFor(t2, KafkaLikeSource.Kind)
    assert(ck.exists(_.startsWith("avro.customers,")), ck)
    GraftTable.drop(dir)
  }
}
