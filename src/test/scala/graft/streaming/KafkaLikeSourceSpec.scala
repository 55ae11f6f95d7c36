package graft.streaming

import java.nio.file.Files
import scala.collection.mutable
import graft.TestSpark
import graft.table._
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** In-memory fake broker: per-partition append-only record logs with a
  * movable earliest offset (retention). Real Kafka stays excluded as an
  * external system (ref: hudi-utilities KafkaOffsetGen tests use a mock
  * cluster the same way). */
class FakeBroker {
  private val logs = mutable.Map[Int, mutable.Buffer[(Long, String)]]()
  private val earliest = mutable.Map[Int, Long]()
  var fetches = 0

  def append(p: Int, vs: String*): Unit = {
    val log = logs.getOrElseUpdate(p, { earliest(p) = 0L; mutable.Buffer() })
    val base = earliest(p) + log.size
    vs.zipWithIndex.foreach { case (v, i) => log += ((base + i, v)) }
  }

  /** Retention: drop records below `off` in partition `p`. */
  def truncate(p: Int, off: Long): Unit = {
    logs(p) = logs(p).filter(_._1 >= off)
    earliest(p) = math.max(earliest(p), off)
  }

  def puller: OffsetRangePuller = new OffsetRangePuller {
    def earliestOffsets(): Map[Int, Long] = earliest.toMap
    def latestOffsets(): Map[Int, Long] =
      logs.map { case (p, l) => p -> (earliest(p) + l.size) }.toMap
    def fetch(ranges: Map[Int, (Long, Long)]): DataFrame = {
      fetches += 1
      val rows = ranges.toSeq.sortBy(_._1).flatMap { case (p, (from, until)) =>
        logs(p).filter { case (o, _) => o >= from && o < until }
          .map { case (o, v) => (p, o, v) }
      }
      import TestSpark.spark.implicits._
      rows.toDF("part", "off", "v")
    }
  }
}

class KafkaLikeSourceSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("graft_kafka_").toString

  private def table(dir: String) = GraftTable.create(spark, dir,
    TableConfig("kafka_t", CopyOnWrite, keyFields = Seq("part", "off")))

  test("offset codec round-trips and sorts by partition") {
    val m = Map(3 -> 17L, 0 -> 2L, 11 -> 5L)
    val enc = KafkaLikeSource.encodeOffsets(m)
    assert(enc === "0:2,3:17,11:5")
    assert(KafkaLikeSource.decodeOffsets(enc) === m)
    assert(KafkaLikeSource.decodeOffsets("") === Map.empty)
  }

  test("bounded pulls distribute proportionally to lag and stay exactly-once") {
    val b = new FakeBroker
    b.append(0, (1 to 30).map(i => s"a$i"): _*)
    b.append(1, (1 to 10).map(i => s"b$i"): _*)
    val src = new KafkaLikeSource(b.puller, maxEventsPerPull = 8)
    // proportional: 30:10 lag at cap 8 -> 6 + 2
    val r1 = src.nextRanges(Map.empty)
    assert(r1 === Map(0 -> (0L, 6L), 1 -> (0L, 2L)))
    // full consume loop: every record exactly once, every pull bounded
    var committed = Map.empty[Int, Long]
    val seen = mutable.Buffer[(Int, Long)]()
    var pulls = 0
    var done = false
    while (!done) src.pull(committed) match {
      case None => done = true
      case Some((m, df)) =>
        pulls += 1
        val rows = df.collect().map(r => (r.getInt(0), r.getLong(1)))
        assert(rows.length <= 8)
        seen ++= rows
        committed = m
    }
    assert(pulls === 5) // 40 records at <=8/pull
    assert(seen.size === 40)
    assert(seen.distinct.size === 40, "a record was delivered twice")
    assert(committed === Map(0 -> 30L, 1 -> 10L))
    assert(src.pull(committed).isEmpty, "dry broker must report dry")
  }

  test("retention clamp: earliest past the committed offset skips, never rereads") {
    val b = new FakeBroker
    b.append(0, "x1", "x2", "x3", "x4")
    val src = new KafkaLikeSource(b.puller)
    val Some((c1, d1)) = src.pull(Map.empty)
    assert(d1.count() === 4 && c1 === Map(0 -> 4L))
    b.append(0, "x5", "x6")
    b.truncate(0, 5) // retention ate x5 too
    val Some((c2, d2)) = src.pull(c1)
    assert(d2.collect().map(_.getString(2)).toSeq === Seq("x6"))
    assert(c2 === Map(0 -> 6L))
  }

  test("ingest loop: exactly-once across restart with partition-count growth") {
    val dir = tmp()
    val t = table(dir)
    val b = new FakeBroker
    b.append(0, "p0-1", "p0-2", "p0-3")
    b.append(1, "p1-1", "p1-2")
    val src = new KafkaLikeSource(b.puller, maxEventsPerPull = 2)
    val ci1 = new ContinuousIngest(t, src.forTable(t),
      operation = "insert", compactEvery = 0)
    try assert(ci1.drain() === 3) finally ci1.close() // 5 records at 2/pull
    assert(t.snapshot().count() === 5)
    assert(ContinuousIngest.lastCheckpointFor(t, "kafka") === Some("0:3,1:2"))
    // broker grows a partition + new records on an old one; a RESTARTED
    // source (fresh instance, offsets only from the table) must deliver
    // exactly the new records — partition 2 from offset 0, no re-reads
    b.append(2, "p2-1", "p2-2", "p2-3")
    b.append(0, "p0-4")
    val src2 = new KafkaLikeSource(b.puller, maxEventsPerPull = 10)
    val ci2 = new ContinuousIngest(t, src2.forTable(t),
      operation = "insert", compactEvery = 0)
    try assert(ci2.drain() === 1) finally ci2.close()
    val snap = t.snapshot()
    assert(snap.count() === 9)
    assert(snap.select("part", "off").distinct().count() === 9, "re-delivered record")
    assert(ContinuousIngest.lastCheckpointFor(t, "kafka") === Some("0:4,1:2,2:3"))
    // checkpoint survives archival like every other source kind
    t.archive(keepLast = 1)
    val ci3 = new ContinuousIngest(t, src2.forTable(t),
      operation = "insert", compactEvery = 0)
    try assert(ci3.drain() === 0, "archived offsets lost -> re-ingest") finally ci3.close()
    GraftTable.drop(dir)
  }

  test("legacy prefix-free checkpoint: pre-namespacing kinds only") {
    val dir = tmp()
    val t = table(dir)
    import spark.implicits._
    // simulate a pre-namespacing ingest commit: bare watermark value
    t.writeBatch(Seq((0, 0L, "old")).toDF("part", "off", "v"), "insert",
      extra = Map("checkpoint" -> "inbox/file_0007.json"))
    // kinds that existed before namespacing adopt it...
    assert(ContinuousIngest.lastCheckpointFor(t, "dfs")
      === Some("inbox/file_0007.json"))
    // ...a post-namespacing kind (kafka) must NOT: the bare value is some
    // FOREIGN source's resume token, not a p:o offset map — adopting it
    // would crash decodeOffsets or silently skip/re-read data
    assert(ContinuousIngest.lastCheckpointFor(t, "kafka") === None)
    // a namespaced kafka commit is found normally; dfs keeps its legacy view
    t.writeBatch(Seq((0, 1L, "new")).toDF("part", "off", "v"), "insert",
      extra = Map("checkpoint" -> "kafka:0:2"))
    assert(ContinuousIngest.lastCheckpointFor(t, "kafka") === Some("0:2"))
    assert(ContinuousIngest.lastCheckpointFor(t, "dfs")
      === Some("inbox/file_0007.json"))
    GraftTable.drop(dir)
  }

  test("proportional allocation survives huge lag x huge cap (no overflow)") {
    val huge = new OffsetRangePuller {
      def earliestOffsets(): Map[Int, Long] = Map(0 -> 0L, 1 -> 0L)
      def latestOffsets(): Map[Int, Long] =
        Map(0 -> 2_000_000_000_000L, 1 -> 1_000_000_000_000L)
      def fetch(ranges: Map[Int, (Long, Long)]): DataFrame =
        throw new AssertionError("fetch not expected")
    }
    val cap = 1_500_000_000_000L
    val src = new KafkaLikeSource(huge, maxEventsPerPull = cap)
    val takes = src.nextRanges(Map.empty)
      .map { case (p, (f, u)) => p -> (u - f) }
    assert(takes.values.forall(_ > 0), s"negative/zero take: $takes")
    assert(takes.values.sum === cap)
    assert(takes === Map(0 -> 1_000_000_000_000L, 1 -> 500_000_000_000L))
  }

  test("decodeOffsets rejects a string that is not an offset map") {
    intercept[IllegalArgumentException](
      KafkaLikeSource.decodeOffsets("somefile.json"))
    intercept[IllegalArgumentException](
      KafkaLikeSource.decodeOffsets("2024-01-01 12:00:00"))
  }
}
