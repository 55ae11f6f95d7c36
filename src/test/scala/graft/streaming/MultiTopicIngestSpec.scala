package graft.streaming

import java.nio.file.Files
import graft.TestSpark
import graft.table._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fork's headline composition: N kafka-shaped topics into N Graft
  * tables in ONE loop (ref: HoodieMuiltiTableFlinkStreamer /
  * HoodieFlinkStreamerWithApollo), exactly-once per (topic, table). */
class MultiTopicIngestSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_mti_").toString

  private def table(dir: String, name: String,
      keys: Seq[String] = Seq("part", "off")) =
    GraftTable.create(spark, dir, TableConfig(name, CopyOnWrite,
      keyFields = keys))

  test("two topics -> two tables in one loop; exactly-once across restart with one topic lagging") {
    val (dirA, dirB) = (tmp(), tmp())
    val tA = table(dirA, "mti_a")
    val tB = table(dirB, "mti_b")
    val bA = new FakeBroker; val bB = new FakeBroker
    bA.append(0, (1 to 4).map(i => s"a$i"): _*)
    bB.append(0, (1 to 9).map(i => s"b$i"): _*)
    bB.append(1, (1 to 9).map(i => s"B$i"): _*)
    // topic B lags: its pulls are capped at 4/pull, topic A drains in one
    val mt = new MultiTopicIngest(Seq(
      IngestLane(tA, new KafkaLikeSource(bA.puller, 10, Some("ta")).forTable(tA),
        operation = "insert"),
      IngestLane(tB, new KafkaLikeSource(bB.puller, 4, Some("tb")).forTable(tB),
        operation = "insert")))
    try {
      assert(mt.sweep() === 2) // both lanes ingest on the first sweep
      assert(mt.sweep() === 1) // A is dry, B still catching up
      assert(mt.drainAll() >= 2) // B finishes without A re-ingesting
    } finally mt.close()
    assert(tA.snapshot().count() === 4)
    assert(tB.snapshot().count() === 18)
    // per-(topic,table) checkpoints: each table carries ITS topic's map
    assert(ContinuousIngest.lastCheckpointFor(tA, "kafka") === Some("ta,0:4"))
    assert(ContinuousIngest.lastCheckpointFor(tB, "kafka") === Some("tb,0:9,1:9"))

    // restart: fresh sources + loop, new records on both topics; each lane
    // must deliver exactly the new records from its own offsets
    bA.append(0, "a5", "a6")
    bB.append(1, "B10")
    val mt2 = new MultiTopicIngest(Seq(
      IngestLane(tA, new KafkaLikeSource(bA.puller, 10, Some("ta")).forTable(tA),
        operation = "insert"),
      IngestLane(tB, new KafkaLikeSource(bB.puller, 4, Some("tb")).forTable(tB),
        operation = "insert")))
    try assert(mt2.drainAll() === 2) finally mt2.close()
    val snapA = tA.snapshot(); val snapB = tB.snapshot()
    assert(snapA.count() === 6 &&
      snapA.select("part", "off").distinct().count() === 6, "topic A re-read")
    assert(snapB.count() === 19 &&
      snapB.select("part", "off").distinct().count() === 19, "topic B re-read")
    GraftTable.drop(dirA); GraftTable.drop(dirB)
  }

  test("parallel sweep: a blocked lane does not delay a sibling lane's commit; exactly-once across restart") {
    val (dirA, dirB) = (tmp(), tmp())
    val tA = table(dirA, "mti_slow")
    val tB = table(dirB, "mti_fast")
    val bA = new FakeBroker; val bB = new FakeBroker
    bA.append(0, "a1"); bB.append(0, "b1")
    // lane A's pull blocks on a gate the TEST releases only after
    // observing lane B's commit — the sequential sweep (which steps A
    // first) would deadlock here, so the assertion IS the concurrency
    val aGate = new java.util.concurrent.CountDownLatch(1)
    val aStarted = new java.util.concurrent.CountDownLatch(1)
    val srcA = new KafkaLikeSource(bA.puller, 10, Some("slow")).forTable(tA)
    val gatedA: () => Option[(String, org.apache.spark.sql.DataFrame)] = () => {
      aStarted.countDown()
      aGate.await(60, java.util.concurrent.TimeUnit.SECONDS)
      srcA()
    }
    def fastLane() =
      IngestLane(tB, new KafkaLikeSource(bB.puller, 10, Some("fast")).forTable(tB),
        operation = "insert")
    val mt = new MultiTopicIngest(Seq(
      IngestLane(tA, gatedA, operation = "insert"), fastLane()),
      parallelism = 2)
    val sweepResult = new java.util.concurrent.atomic.AtomicInteger(-1)
    val sweeper = new Thread(() => sweepResult.set(mt.sweep()), "test-sweeper")
    try {
      sweeper.start()
      assert(aStarted.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "slow lane never started")
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var committed = false
      while (!committed && System.nanoTime() < deadline) {
        committed = tB.snapshot().count() == 1
        if (!committed) Thread.sleep(100)
      }
      assert(committed, "fast lane's commit waited on the blocked slow lane")
    } finally {
      aGate.countDown()
      sweeper.join(120000)
      mt.close()
    }
    assert(sweepResult.get() === 2) // both lanes ingested in the one sweep
    assert(tA.snapshot().count() === 1)
    // restart with fresh sources under concurrent sweeps: each lane
    // resumes from its own table's offsets, exactly-once
    bA.append(0, "a2"); bB.append(0, "b2", "b3")
    val mt2 = new MultiTopicIngest(Seq(
      IngestLane(tA, new KafkaLikeSource(bA.puller, 10, Some("slow")).forTable(tA),
        operation = "insert"), fastLane()),
      parallelism = 2)
    try assert(mt2.drainAll() === 2) finally mt2.close()
    val snapA = tA.snapshot(); val snapB = tB.snapshot()
    assert(snapA.count() === 2 &&
      snapA.select("part", "off").distinct().count() === 2, "slow lane re-read")
    assert(snapB.count() === 3 &&
      snapB.select("part", "off").distinct().count() === 3, "fast lane re-read")
    GraftTable.drop(dirA); GraftTable.drop(dirB)
  }

  test("parallel sweep: a failing lane surfaces only after siblings finish their step") {
    val (dirA, dirB) = (tmp(), tmp())
    val tA = table(dirA, "mti_fail")
    val tB = table(dirB, "mti_ok")
    val bB = new FakeBroker
    bB.append(0, "b1")
    val failing: () => Option[(String, org.apache.spark.sql.DataFrame)] =
      () => throw new RuntimeException("lane boom")
    val mt = new MultiTopicIngest(Seq(
      IngestLane(tA, failing, operation = "insert"),
      IngestLane(tB, new KafkaLikeSource(bB.puller, 10, Some("ok")).forTable(tB),
        operation = "insert")),
      parallelism = 2)
    try {
      val e = intercept[RuntimeException](mt.sweep())
      assert(e.getMessage === "lane boom")
      // the sibling's commit landed despite the failure
      assert(tB.snapshot().count() === 1)
    } finally mt.close()
    GraftTable.drop(dirA); GraftTable.drop(dirB)
  }

  test("two topics feed ONE table: per-topic offset maps never cross") {
    val dir = tmp()
    val t = table(dir, "mti_one", keys = Seq("topic", "part", "off"))
    val bA = new FakeBroker; val bB = new FakeBroker
    bA.append(0, "a1", "a2", "a3")
    bB.append(0, "b1")
    def lane(b: FakeBroker, topic: String) =
      IngestLane(t, new KafkaLikeSource(b.puller, 10, Some(topic)).forTable(t),
        transforms = Seq(df => df.withColumn("topic", lit(topic))),
        operation = "insert")
    val mt = new MultiTopicIngest(Seq(lane(bA, "a"), lane(bB, "b")))
    try mt.drainAll() finally mt.close()
    assert(t.snapshot().count() === 4)
    // each topic's newest map is recoverable despite interleaved commits
    // in ONE timeline — the topic label keeps them apart
    assert(ContinuousIngest.lastCheckpointFor(t, "kafka",
      v => KafkaLikeSource.topicOf(v).contains("a")) === Some("a,0:3"))
    assert(ContinuousIngest.lastCheckpointFor(t, "kafka",
      v => KafkaLikeSource.topicOf(v).contains("b")) === Some("b,0:1"))
    // restart after only topic B moved: A must stay dry (not resume from
    // B's newer commit), B delivers exactly the new record
    bB.append(0, "b2", "b3")
    val mt2 = new MultiTopicIngest(Seq(lane(bA, "a"), lane(bB, "b")))
    try assert(mt2.drainAll() === 1) finally mt2.close()
    val snap = t.snapshot()
    assert(snap.count() === 6)
    assert(snap.select("topic", "part", "off").distinct().count() === 6,
      "offset maps crossed topics: a record was re-delivered")
    GraftTable.drop(dir)
  }
}
