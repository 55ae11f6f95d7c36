package graft.table

import java.net.{InetSocketAddress, ServerSocket}
import java.nio.file.Files
import scala.collection.mutable
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** In-memory recording producer for the message-bus callback (the
  * Kafka-producer stand-in; instantiated by class name, records are
  * observable through the companion). */
class RecordingBusProducer extends MessageBusProducer {
  override def send(topic: String, key: String, payload: String): Unit =
    RecordingBusProducer.records.synchronized {
      RecordingBusProducer.records += ((topic, key, payload))
    }
}
object RecordingBusProducer {
  val records: mutable.Buffer[(String, String, String)] = mutable.Buffer()
}

/** Network commit callbacks + push metrics reporters against in-JVM
  * localhost servers (ref: HoodieWriteCommitHttpCallbackClient,
  * MetricsGraphiteReporter — external SYSTEMS stay out, the protocols
  * don't). */
class CallbacksReportersSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_cb_").toString

  test("HttpCommitCallback POSTs the commit JSON with the api-key header") {
    val received = mutable.Buffer[(String, String)]() // (key header, body)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/cb", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val body = new String(x.getRequestBody.readAllBytes(), "UTF-8")
        received.synchronized {
          received += ((x.getRequestHeaders.getFirst("GRAFT-CALLBACK-KEY"), body))
        }
        x.sendResponseHeaders(200, -1)
        x.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val dir = tmp()
      // through the write door, like a user would configure it
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.format("graft")
        .option("graft.table.name", "cb_t")
        .option("graft.recordkey.field", "id")
        .option("graft.operation", "bulk_insert")
        .option("graft.commit.callback.class",
          "graft.table.HttpCommitCallback")
        .option("graft.commit.callback.http.url", s"http://127.0.0.1:$port/cb")
        .option("graft.commit.callback.http.api.key", "sekrit")
        .mode("overwrite").save(dir)
      assert(received.size === 1)
      val (key, body) = received.head
      assert(key === "sekrit")
      assert(body.contains("\"operation\":\"bulk_insert\"") ||
        body.contains("\"operation\" : \"bulk_insert\""), body)
      assert(body.contains("\"rows\":2") || body.contains("\"rows\" : 2"), body)
      // a failing endpoint PROPAGATES (the engine's callback contract)
      val e = intercept[Exception] {
        Seq((3L, "c")).toDF("id", "v")
          .write.format("graft")
          .option("graft.operation", "upsert")
          .option("graft.commit.callback.class",
            "graft.table.HttpCommitCallback")
          .option("graft.commit.callback.http.url",
            s"http://127.0.0.1:$port/nope")
          .mode("append").save(dir)
      }
      assert(String.valueOf(e.getMessage).contains("404") ||
        Option(e.getCause).exists(c => String.valueOf(c.getMessage).contains("404")),
        e.toString)
      GraftTable.drop(dir)
    } finally server.stop(0)
  }

  test("Graphite reporter pushes one plaintext line per commit counter") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("gr_t", CopyOnWrite,
      keyFields = Seq("id")))
    t.bulkInsert(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    t.upsert(Seq((2L, "B")).toDF("id", "v"))

    val lines = mutable.Buffer[String]()
    val ss = new ServerSocket(0)
    val acceptor = new Thread(() => {
      val sock = ss.accept()
      val src = scala.io.Source.fromInputStream(sock.getInputStream, "UTF-8")
      try lines.synchronized { lines ++= src.getLines() }
      finally { src.close(); sock.close() }
    })
    acceptor.start()
    val n = Metrics.report(t,
      new GraphiteMetricsReporter("127.0.0.1", ss.getLocalPort))
    acceptor.join(30000)
    ss.close()
    assert(n === lines.size)
    // two data commits x three counters (no durationMs through this path)
    assert(lines.count(_.startsWith("graft.gr_t.commit.totalRecordsWritten ")) === 2)
    val fmt = """^graft\.gr_t\.commit\.[A-Za-z]+ -?\d+ \d{9,}$""".r
    lines.foreach(l => assert(fmt.matches(l), s"bad graphite line: $l"))
    val recs = lines.filter(_.startsWith("graft.gr_t.commit.totalRecordsWritten "))
      .map(_.split(' ')(1).toLong)
    // bulk insert wrote 3 rows; the COW upsert rewrote its whole group
    assert(recs.size === 2 && recs.forall(_ >= 1) && recs.max === 3)
    GraftTable.drop(dir)
  }

  test("MessageBusCommitCallback publishes commit JSON keyed by table name") {
    RecordingBusProducer.records.synchronized(RecordingBusProducer.records.clear())
    val dir = tmp()
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.format("graft")
      .option("graft.table.name", "bus_t")
      .option("graft.recordkey.field", "id")
      .option("graft.operation", "bulk_insert")
      .option("graft.commit.callback.class", "graft.table.MessageBusCommitCallback")
      .option("graft.commit.callback.bus.topic", "lake.commits")
      .option("graft.commit.callback.bus.producer.class",
        "graft.table.RecordingBusProducer")
      .mode("overwrite").save(dir)
    val recs = RecordingBusProducer.records.synchronized(
      RecordingBusProducer.records.toList)
    assert(recs.size === 1)
    val (topic, key, payload) = recs.head
    assert(topic === "lake.commits")
    // keyed by the table's directory name (partition-ordered per table on
    // a shared commits topic, the reference's Kafka callback posture)
    assert(key === java.nio.file.Paths.get(dir).getFileName.toString)
    assert(payload.contains("\"operation\":\"bulk_insert\"") ||
      payload.contains("\"operation\" : \"bulk_insert\""), payload)
    assert(payload.contains("\"rows\":3") || payload.contains("\"rows\" : 3"), payload)
    // missing producer config propagates (callback contract)
    val e = intercept[Exception] {
      Seq((4L, "d")).toDF("id", "v")
        .write.format("graft")
        .option("graft.operation", "upsert")
        .option("graft.commit.callback.class",
          "graft.table.MessageBusCommitCallback")
        .option("graft.commit.callback.bus.topic", "lake.commits")
        .mode("append").save(dir)
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => String.valueOf(t.getMessage).contains("producer.class")),
      e.toString)
    GraftTable.drop(dir)
  }

  test("instantEpochSeconds is lenient to collision-minted non-calendar instants") {
    // calendar instant parses exactly
    assert(Metrics.instantEpochSeconds("20240101000000000") === 1704067200L)
    // the allocator's collision path is BigInt+1: …115959999 + 1 overflows
    // the seconds field (…115960 = sec 60); leniency must carry, not throw,
    // and ORDER must be preserved across the overflow boundary
    val before = Metrics.instantEpochSeconds("20240101115959999")
    val after = Metrics.instantEpochSeconds("20240101115960000")
    assert(after === before + 1, s"$before vs $after")
    // minute/hour/day overflow all carry: 236060 = 23:60:60 → next day 00:01:00
    assert(Metrics.instantEpochSeconds("20240101236060000") ===
      Metrics.instantEpochSeconds("20240102000100000"))
    // day past month end carries into the next month
    assert(Metrics.instantEpochSeconds("20240132000000000") ===
      Metrics.instantEpochSeconds("20240201000000000"))
    // month overflow carries into the next year (clamping to 12 would map
    // the lexicographically LARGER …1301… BELOW …1231… — an inversion)
    assert(Metrics.instantEpochSeconds("20241301000000000") ===
      Metrics.instantEpochSeconds("20250101000000000"))
    assert(Metrics.instantEpochSeconds("20241301000000000") >
      Metrics.instantEpochSeconds("20241231000000000"))
    // junk degrades to 0 instead of sinking the report
    assert(Metrics.instantEpochSeconds("bogus") === 0L)
    assert(Metrics.instantEpochSeconds("2024") === 0L)
  }
}
