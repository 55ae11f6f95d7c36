package graft.streaming

import java.nio.file.Files
import scala.collection.mutable.ArrayBuffer
import graft.TestSpark
import graft.table.{DebeziumIngest, DbzImg, EventTimeOrdered, GraftTable,
  MergeOnRead, TableConfig}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Debezium-over-Kafka, composed the way the reference BUILDS it
  * (hudi-utilities sources/debezium/DebeziumSource.java is a Kafka source
  * subclass whose processDataset applies the envelope mapping):
  * [[KafkaLikeSource]] pulls bounded offset ranges of envelope records,
  * [[DebeziumIngest.project]] decodes them as a ContinuousIngest
  * transform, and the `kafka:` offset-map checkpoint in each commit makes
  * the whole pipeline exactly-once across restarts. */
class DebeziumOverKafkaSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_dbzk_").toString

  /** Two-partition fake broker of Debezium envelopes, append-only. */
  private class Broker {
    val parts: Map[Int, ArrayBuffer[(String, Option[DbzImg], Option[DbzImg], Long)]] =
      Map(0 -> ArrayBuffer.empty, 1 -> ArrayBuffer.empty)
    def puller: OffsetRangePuller = new OffsetRangePuller {
      def latestOffsets(): Map[Int, Long] =
        parts.map { case (p, b) => p -> b.size.toLong }
      def earliestOffsets(): Map[Int, Long] = parts.map { case (p, _) => p -> 0L }
      def fetch(ranges: Map[Int, (Long, Long)]): DataFrame =
        ranges.toSeq.sortBy(_._1)
          .flatMap { case (p, (from, until)) =>
            parts(p).slice(from.toInt, until.toInt) }
          .toDF("op", "before", "after", "lsn")
    }
  }

  private def mkTable(dir: String): GraftTable =
    GraftTable.create(spark, dir, TableConfig("dbzk", MergeOnRead,
      keyFields = Seq("id"), precombineField = Some("lsn"),
      payload = EventTimeOrdered))

  private def loop(t: GraftTable, b: Broker, maxPerPull: Long) = {
    DebeziumIngest.requireDebeziumTable(t, "lsn")
    val src = new KafkaLikeSource(b.puller, maxEventsPerPull = maxPerPull,
      topic = Some("dbz.inventory.customers"))
    new ContinuousIngest(t, src.forTable(t),
      transforms = Seq(df => DebeziumIngest.project(df)),
      operation = "upsert", compactEvery = 0)
  }

  test("exactly-once Debezium decode over bounded Kafka pulls, across restart") {
    val dir = tmp()
    val t = mkTable(dir)
    val b = new Broker
    b.parts(0) ++= Seq(
      ("c", None, Some(DbzImg(1, "v1")), 1L),
      ("u", Some(DbzImg(1, "v1")), Some(DbzImg(1, "v2")), 2L))
    b.parts(1) += (("c", None, Some(DbzImg(2, "w1")), 5L))
    // maxPerPull 2 forces multiple bounded pulls to drain 3 events
    val ci = loop(t, b, maxPerPull = 2)
    try assert(ci.drain() >= 2) finally ci.close()
    assert(t.snapshot().select("id", "v").as[(Long, String)].collect()
      .sorted.toSeq === Seq((1L, "v2"), (2L, "w1")))

    // RESTART: fresh table instance + fresh loop resume from the committed
    // offset map — a drained broker yields zero new commits
    val t2 = GraftTable.load(spark, dir)
    val ci2 = loop(t2, b, maxPerPull = 10)
    try assert(ci2.drain() === 0) finally ci2.close()

    // new events after the restart: an out-of-order stale delete (lsn 3 <
    // stored lsn for k1? no — k1 stored at lsn 2, delete at lsn 3 WINS;
    // k2's stale update at lsn 4 < 5 LOSES)
    b.parts(0) += (("d", Some(DbzImg(1, "v2")), None, 3L))
    b.parts(1) += (("u", Some(DbzImg(2, "w1")), Some(DbzImg(2, "w0")), 4L))
    val ci3 = loop(t2, b, maxPerPull = 10)
    try assert(ci3.drain() === 1) finally ci3.close()
    assert(t2.snapshot().select("id", "v", "lsn").as[(Long, String, Long)]
      .collect().sorted.toSeq === Seq((2L, "w1", 5L)),
      "delete must apply; the stale update must lose to the stored lsn-5 row")

    // the checkpoint is the kafka offset map for BOTH partitions
    val ck = ContinuousIngest.lastCheckpointFor(t2, KafkaLikeSource.Kind)
    assert(ck.exists(_.startsWith("dbz.inventory.customers,")), ck)
    GraftTable.drop(dir)
  }

  test("maxwell-over-kafka: JSON envelopes decode via projectMaxwell, exactly-once") {
    import org.apache.spark.sql.types._
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("mxk", MergeOnRead,
      keyFields = Seq("id")))
    val msgs = ArrayBuffer(
      """{"database":"shop","table":"customers","type":"insert","ts":1,"data":{"id":1,"v":"a"}}""",
      """{"database":"shop","table":"customers","type":"insert","ts":2,"data":{"id":2,"v":"c"}}""",
      """{"database":"shop","table":"orders","type":"insert","ts":3,"data":{"id":9,"v":"x"}}""",
      """{"database":"shop","table":"customers","type":"table-alter","ts":4,"data":null}""")
    val puller = new OffsetRangePuller {
      def latestOffsets(): Map[Int, Long] = Map(0 -> msgs.size.toLong)
      def earliestOffsets(): Map[Int, Long] = Map(0 -> 0L)
      def fetch(ranges: Map[Int, (Long, Long)]): DataFrame = {
        val (from, until) = ranges(0)
        msgs.slice(from.toInt, until.toInt).toSeq.toDF("value")
      }
    }
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    def loopM(tt: GraftTable) = new ContinuousIngest(tt,
      new KafkaLikeSource(puller, maxEventsPerPull = 3,
        topic = Some("maxwell")).forTable(tt),
      transforms = Seq(df => DebeziumIngest.projectMaxwell(df, schema,
        tableRegex = "customers", precombineType = "non_timestamp")),
      operation = "upsert", compactEvery = 0)
    val ci = loopM(t)
    try assert(ci.drain() === 2) finally ci.close() // 3-cap forces 2 pulls
    assert(t.snapshot().select("id", "v").as[(Long, String)].collect()
      .sorted.toSeq === Seq((1L, "a"), (2L, "c")),
      "other tables and DDL rows are filtered, not applied")

    // restart, then an update and a delete arrive
    msgs += """{"database":"shop","table":"customers","type":"update","ts":5,"data":{"id":1,"v":"b"}}"""
    msgs += """{"database":"shop","table":"customers","type":"delete","ts":6,"data":{"id":2,"v":"c"}}"""
    val t2 = GraftTable.load(spark, dir)
    val ci2 = loopM(t2)
    try assert(ci2.drain() === 1) finally ci2.close()
    assert(t2.snapshot().select("id", "v").as[(Long, String)].collect()
      .sorted.toSeq === Seq((1L, "b")))
    GraftTable.drop(dir)
  }

  test("an unknown op fails the batch instead of writing garbage") {
    val dir = tmp()
    val t = mkTable(dir)
    val b = new Broker
    b.parts(0) += (("x", None, Some(DbzImg(9, "bad")), 1L))
    val ci = loop(t, b, maxPerPull = 10)
    val e = intercept[Exception] { try ci.drain() finally ci.close() }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(t0 => Option(t0.getMessage).toSeq ++ msgs(t0.getCause))
    assert(msgs(e).exists(_.contains("unknown Debezium op")), e.toString)
    assert(t.snapshot().count() === 0)
    GraftTable.drop(dir)
  }
}
