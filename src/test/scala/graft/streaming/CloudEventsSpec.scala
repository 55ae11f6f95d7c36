package graft.streaming

import java.nio.file.Files
import scala.collection.mutable
import graft.TestSpark
import graft.table._
import org.scalatest.funsuite.AnyFunSuite

/** In-memory at-least-once queue: receive does NOT remove (messages
  * redeliver until acked), ack deletes by receipt — the SQS contract the
  * reference's S3EventsSource is built on. */
class FakeQueue extends MessageQueue {
  private val q = mutable.LinkedHashMap[String, String]()
  private var n = 0
  def enqueue(body: String): String = { n += 1; val r = s"r$n"; q(r) = body; r }
  override def receive(max: Int): Seq[(String, String)] = q.take(max).toSeq
  override def ack(receipts: Seq[String]): Unit = receipts.foreach(q.remove)
  def size: Int = q.size
}

/** Cloud-events ingest pattern (ref: S3EventsSource +
  * S3EventsHoodieIncrSource): notifications → events table → referenced
  * objects → data table, no storage listing anywhere. */
class CloudEventsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_cloud_").toString

  private def objCreated(bucket: String, key: String, size: Long = 1,
      eventName: String = "ObjectCreated:Put"): String =
    s"""{"Records":[{"eventName":"$eventName","eventTime":"2024-01-01T00:00:00Z",""" +
      s""""s3":{"bucket":{"name":"$bucket"},"object":{"key":"$key","size":$size}}}]}"""

  test("stage 1: queue drains to the events table, ack after commit, redelivery dedups") {
    val q = new FakeQueue
    q.enqueue(objCreated("bkt", "data/d1.parquet", 10))
    q.enqueue(objCreated("bkt", "data/d2.parquet", 20))
    // non-created records are filtered like the reference's selector
    q.enqueue(objCreated("bkt", "data/gone.parquet",
      eventName = "ObjectRemoved:Delete"))

    val dir = tmp()
    val events = GraftTable.create(spark, dir, TableConfig("cloud_events",
      CopyOnWrite, keyFields = Seq("bucket", "key")))
    val src = new QueueEventsSource(spark, q)
    val (pull, ack) = src.forIngest
    val ing = new ContinuousIngest(events, pull, operation = "upsert",
      compactEvery = 0, onCommit = ack)
    try {
      assert(ing.step().isDefined)
      assert(q.size === 0) // acked AFTER the commit
      val keys = events.snapshot().select("key").as[String].collect().toSet
      assert(keys === Set("data/d1.parquet", "data/d2.parquet"))

      // crash-before-ack: the queue redelivers the same notification; the
      // upsert key (bucket, key) makes the replay converge
      q.enqueue(objCreated("bkt", "data/d1.parquet", 10))
      assert(ing.step().isDefined)
      assert(events.snapshot().count() === 2)
      assert(ing.step().isEmpty) // drained
    } finally ing.close()
    GraftTable.drop(dir)
  }

  test("stage 2: events window loads referenced objects with filters, exactly-once") {
    val root = tmp()
    val q = new FakeQueue
    val eventsDir = tmp(); val targetDir = tmp()
    val events = GraftTable.create(spark, eventsDir, TableConfig("ce2",
      CopyOnWrite, keyFields = Seq("bucket", "key")))
    val target = GraftTable.create(spark, targetDir, TableConfig("ct2",
      CopyOnWrite, keyFields = Seq("id")))

    // objects on "storage": two data files, a checkpoint to ignore by
    // prefix, a temp file to ignore by substring, and a vanished object
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$root/bkt/data/d1.parquet")
    Seq((3L, "c")).toDF("id", "v")
      .write.parquet(s"$root/bkt/data/d2.tmp.parquet")
    Seq((4L, "d")).toDF("id", "v")
      .write.parquet(s"$root/bkt/checkpoint/cp.parquet")
    Seq(objCreated("bkt", "data/d1.parquet"),
      objCreated("bkt", "data/d2.tmp.parquet"),
      objCreated("bkt", "checkpoint/cp.parquet"),
      objCreated("bkt", "data/vanished.parquet")).foreach(q.enqueue)

    val s1 = new QueueEventsSource(spark, q)
    val (pull, ack) = s1.forIngest
    val stage1 = new ContinuousIngest(events, pull, operation = "upsert",
      compactEvery = 0, onCommit = ack)
    val stage2src = CloudObjectsLoad.fromEventsTable(spark, events, target,
      format = "parquet", fsPrefix = s"$root/",
      keyPrefix = Some("data/"), ignoreKeySubstring = Some(".tmp"),
      checkExists = true)
    val stage2 = new ContinuousIngest(target, stage2src,
      operation = "upsert", compactEvery = 0)
    try {
      assert(stage1.step().isDefined)
      assert(stage2.step().isDefined)
      // only d1 survives: .tmp ignored, checkpoint/ outside keyPrefix,
      // vanished fails the existence check
      assert(target.snapshot().select("id").as[Long].collect().toSet ===
        Set(1L, 2L))

      // second wave + RESTART of stage 2 from a fresh instance: the incr:
      // cursor in the target's commits resumes exactly
      Seq((5L, "e")).toDF("id", "v")
        .write.parquet(s"$root/bkt/data/d3.parquet")
      q.enqueue(objCreated("bkt", "data/d3.parquet"))
      assert(stage1.step().isDefined)
      val stage2b = new ContinuousIngest(target,
        CloudObjectsLoad.fromEventsTable(spark, events, target,
          format = "parquet", fsPrefix = s"$root/",
          keyPrefix = Some("data/"), ignoreKeySubstring = Some(".tmp"),
          checkExists = true),
        operation = "upsert", compactEvery = 0)
      try {
        assert(stage2b.step().isDefined)
        assert(target.snapshot().select("id").as[Long].collect().toSet ===
          Set(1L, 2L, 5L))
        assert(stage2b.step().isEmpty) // caught up — no re-loads
      } finally stage2b.close()
    } finally { stage1.close(); stage2.close() }
    GraftTable.drop(eventsDir); GraftTable.drop(targetDir)
  }

  test("pathExists resolves through the path's Hadoop FileSystem scheme") {
    val root = tmp()
    Files.write(java.nio.file.Paths.get(root, "obj.bin"), Array[Byte](1))
    // plain local path AND explicit file: scheme both resolve (a java.nio
    // check would also pass these — the point is the resolution goes
    // through Path.getFileSystem, which handles s3a://hdfs:// uniformly)
    assert(CloudObjectsLoad.pathExists(spark, s"$root/obj.bin"))
    assert(CloudObjectsLoad.pathExists(spark, s"file:$root/obj.bin"))
    assert(!CloudObjectsLoad.pathExists(spark, s"$root/missing.bin"))
    assert(!CloudObjectsLoad.pathExists(spark, s"file:$root/missing.bin"))
  }
}
