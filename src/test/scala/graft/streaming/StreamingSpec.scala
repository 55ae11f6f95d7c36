package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import scala.jdk.CollectionConverters._
import graft.TestSpark
import graft.table._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  private def eventsTable(dir: String): GraftTable =
    GraftTable.create(spark, dir, TableConfig("ev", CopyOnWrite,
      keyFields = Seq("event_id"), precombineField = Some("value"),
      partitioning = PartitionByColumns(Seq("event_type"))))

  test("exactly-once batch dedup survives archival (max-id watermark carried)") {
    val dir = Files.createTempDirectory("graft_stream_arch_").toString
    val t = eventsTable(dir)
    val sid = "ckpt-a"
    for (b <- 0 until 12)
      GraftStreaming.upsertSink(t, sid)(
        Seq(Event(100 + b, ts(b), 1, "click", b.toDouble)).toDF(), batchId = b.toLong)
    assert(t.snapshot().count() === 12)
    assert(t.archive(keepLast = 2) > 0)
    val commitsBefore = t.showCommits().count()
    // replay an ARCHIVED batch: its id lives only in the checkpoint carry
    GraftStreaming.upsertSink(t, sid)(
      Seq(Event(103, ts(3), 1, "click", 999.0)).toDF(), batchId = 3L)
    assert(t.showCommits().count() === commitsBefore, "archived batch replayed")
    // a NEW batch id (and another stream's id) still commit
    GraftStreaming.upsertSink(t, sid)(
      Seq(Event(200, ts(20), 1, "view", 1.0)).toDF(), batchId = 12L)
    GraftStreaming.upsertSink(t, "ckpt-b")(
      Seq(Event(201, ts(21), 1, "view", 1.0)).toDF(), batchId = 0L)
    assert(t.snapshot().count() === 14)
    GraftTable.drop(dir)
  }

  test("session fold: late events merge without regressing; old bursts form own sessions") {
    def ev(id: Long, min: Int, v: Double = 1.0) = Event(id, ts(min), 7, "click", v)
    val gapMs = 10 * 60000L // 10-minute gap
    // open session at [100, 102]; late adjacent burst at 60,62; far single at 30
    val (closed, open) = GraftStreaming.foldEvents(7,
      Seq(ev(1, 100), ev(2, 102), ev(3, 60), ev(4, 62), ev(5, 30), ev(6, 103)),
      acc0 = None, gapMs = gapMs)
    assert(open.exists(a => a.startMs == ts(100).getTime && a.lastMs == ts(103).getTime
      && a.n == 3), s"open=$open")
    // closed: [30,30] then [60,62] (adjacent orphans merged, NOT split)
    assert(closed.map(s => (s.start_ts.getTime, s.end_ts.getTime, s.n_events)) ===
      Seq((ts(30).getTime, ts(30).getTime, 1), (ts(60).getTime, ts(62).getTime, 2)),
      s"closed=$closed")
    // cross-batch: a late event inside the gap merges and must not move the
    // open session's end backwards
    val (closed2, open2) = GraftStreaming.foldEvents(7,
      Seq(ev(7, 98)), open, gapMs)
    assert(closed2.isEmpty)
    assert(open2.exists(a => a.startMs == ts(98).getTime && a.lastMs == ts(103).getTime
      && a.n == 4), s"open2=$open2")
  }

  test("stream batch-id encoding round-trips ids with '#' and ',' in stream ids") {
    val m = Map("/data/ckpt,v2" -> 7L, "a#b#c" -> 3L, "plain" -> 0L)
    assert(StreamBatchIds.parse(StreamBatchIds.encode(m)) === m)
  }

  test("streaming upsert sink: exactly-once by batch id, updates visible per batch") {
    val dir = Files.createTempDirectory("graft_stream_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val t = eventsTable(dir)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = GraftStreaming.writeStreamTo(mem.toDF(), t, ckpt)
    mem.addData(Event(1, ts(0), 10, "click", 1.0), Event(2, ts(1), 10, "view", 2.0))
    q.processAllAvailable()
    assert(t.snapshot().count() === 2)
    // second micro-batch updates key 1 and inserts key 3
    mem.addData(Event(1, ts(2), 10, "click", 9.0), Event(3, ts(3), 11, "error", 3.0))
    q.processAllAvailable()
    q.stop()
    val snap = t.snapshot()
    assert(snap.count() === 3)
    assert(snap.filter(col("event_id") === 1).select("value").collect()(0).getDouble(0) === 9.0)
    // replayed batch id is a no-op (exactly-once) — same stream identity
    val commitsBefore = t.showCommits().count()
    GraftStreaming.upsertSink(t, ckpt)(
      Seq(Event(1, ts(2), 10, "click", 9.0)).toDF(), batchId = 1L)
    assert(t.showCommits().count() === commitsBefore)
    // a DIFFERENT stream's batch 1 is NOT deduped (ids are per-checkpoint)
    GraftStreaming.upsertSink(t, ckpt + "_other")(
      Seq(Event(4, ts(3), 12, "click", 4.0)).toDF(), batchId = 1L)
    assert(t.showCommits().count() === commitsBefore + 1)
    assert(t.snapshot().count() === 4)
    GraftTable.drop(dir); GraftTable.drop(ckpt)
  }

  test("multi-table sink: one stream demuxed to N tables, exactly-once per table") {
    val dirA = Files.createTempDirectory("graft_mt_a_").toString
    val dirB = Files.createTempDirectory("graft_mt_b_").toString
    val ckpt = Files.createTempDirectory("graft_mt_ckpt_").toString
    val tA = eventsTable(dirA)
    val tB = eventsTable(dirB)
    val routes = Seq(
      TableRoute(tA, _.filter(col("event_type") === "click")),
      TableRoute(tB, _.filter(col("event_type") =!= "click")))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = GraftStreaming.writeStreamMultiTo(mem.toDF(), routes, ckpt)
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0),
      Event(3, ts(2), 2, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    assert(tA.snapshot().count() === 2)
    assert(tB.snapshot().count() === 1)
    // restart from the SAME checkpoint: the finished batch must not replay,
    // new data continues from the next batch id
    val q2 = GraftStreaming.writeStreamMultiTo(mem.toDF(), routes, ckpt)
    mem.addData(Event(1, ts(3), 1, "click", 9.0), Event(4, ts(4), 3, "error", 4.0))
    q2.processAllAvailable()
    q2.stop()
    val snapA = tA.snapshot()
    assert(snapA.count() === 2, "restart duplicated or lost click rows")
    assert(snapA.filter(col("event_id") === 1)
      .select("value").collect()(0).getDouble(0) === 9.0)
    assert(tB.snapshot().count() === 2)
    GraftTable.drop(dirA); GraftTable.drop(dirB); GraftTable.drop(ckpt)
  }

  test("multi-table sink: mid-batch crash replay completes only unfinished tables") {
    val dirA = Files.createTempDirectory("graft_mtc_a_").toString
    val dirB = Files.createTempDirectory("graft_mtc_b_").toString
    val tA = eventsTable(dirA)
    val tB = eventsTable(dirB)
    val sid = "ckpt-mt"
    val batch = Seq(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0)).toDF()
    val routes = Seq(
      TableRoute(tA, _.filter(col("event_type") === "click")),
      TableRoute(tB, _.filter(col("event_type") === "view")))
    // simulate a crash AFTER table A committed batch 0 but before table B:
    // A's timeline already holds the batch key
    tA.writeBatch(batch.filter(col("event_type") === "click"), "upsert",
      Map("streamBatchId" -> s"$sid#0"))
    // the replay runs the full sink over the same batch
    GraftStreaming.multiTableSink(routes, sid)(batch, batchId = 0L)
    assert(tA.snapshot().count() === 1, "finished table was written twice")
    assert(tA.showCommits().count() === 1, "replay re-committed to table A")
    assert(tB.snapshot().count() === 1, "unfinished table missed the replay")
    // a full replay of the completed batch is a no-op everywhere
    GraftStreaming.multiTableSink(routes, sid)(batch, batchId = 0L)
    assert(tA.showCommits().count() === 1)
    assert(tB.showCommits().count() === 1)
    // an empty slice never commits: batch 1 has no view rows
    val clicksOnly = Seq(Event(3, ts(2), 2, "click", 3.0)).toDF()
    GraftStreaming.multiTableSink(routes, sid)(clicksOnly, batchId = 1L)
    assert(tA.snapshot().count() === 2)
    assert(tB.showCommits().count() === 1, "empty slice produced a commit")
    GraftTable.drop(dirA); GraftTable.drop(dirB)
  }

  test("windowed aggregation with watermark over an event stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val agg = GraftStreaming.windowedEventStats(mem.toDF(), "10 minutes", "1 hour")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "click", 2.0),
      Event(3, ts(61), 1, "view", 5.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_out").collect()
    assert(rows.length === 2) // two (window, type) groups
    val click = spark.table("win_out").filter(col("event_type") === "click").collect()(0)
    assert(click.getAs[Long]("n_events") === 2)
    assert(click.getAs[Double]("total_value") === 3.0)
  }

  test("stateful sessionization emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = GraftStreaming.sessionize(mem.toDS(), gapSeconds = 1800, "1 minute")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    // session 1: two events 5 min apart; then a 2h gap in the next batch
    mem.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(5), 7, "view", 2.0))
    q.processAllAvailable()
    mem.addData(Event(3, ts(125), 7, "click", 4.0)) // closes the first session
    q.processAllAvailable()
    mem.addData(Event(4, ts(300), 8, "view", 1.0)) // advances watermark far; times out session 2
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_out").orderBy("start_ts").collect()
    assert(out.length >= 2)
    assert(out(0).getAs[Long]("user_id") === 7)
    assert(out(0).getAs[Int]("n_events") === 2)
    assert(out(0).getAs[Double]("total_value") === 3.0)
    assert(out(1).getAs[Int]("n_events") === 1)
  }

  test("commit feed: polls only new commits' changes") {
    val dir = Files.createTempDirectory("graft_feed_").toString
    val t = eventsTable(dir)
    val e1 = Seq(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0)).toDF()
    t.bulkInsert(e1)
    val feed = new CommitFeed(t)
    val first = feed.poll()
    assert(first.nonEmpty && first.get._2.count() === 2)
    assert(feed.poll().isEmpty) // nothing new
    t.upsert(Seq(Event(2, ts(9), 1, "view", 7.0), Event(5, ts(4), 2, "click", 1.0)).toDF())
    val second = feed.poll()
    assert(second.nonEmpty)
    val changed = second.get._2
    assert(changed.count() === 2)
    assert(changed.filter(col("event_id") === 2).select("value").collect()(0).getDouble(0) === 7.0)
    assert(feed.poll().isEmpty)
    // bounded catch-up: maxInstantsPerPoll = 1 drains one commit per poll
    t.upsert(Seq(Event(6, ts(5), 3, "click", 1.0)).toDF())
    t.upsert(Seq(Event(7, ts(6), 3, "view", 2.0)).toDF())
    t.upsert(Seq(Event(8, ts(7), 3, "view", 3.0)).toDF())
    val bounded = new CommitFeed(t, startFrom = Some(second.get._1),
      maxInstantsPerPoll = 1)
    val polls = Iterator.continually(bounded.poll()).takeWhile(_.nonEmpty)
      .map(_.get._2.collect().map(_.getAs[Long]("event_id")).toSet).toSeq
    assert(polls.size === 3, s"expected 3 bounded polls, got ${polls.size}")
    assert(polls === Seq(Set(6L), Set(7L), Set(8L)))
    GraftTable.drop(dir)
  }

  test("writeStream.format(\"graft\") sinks micro-batches exactly-once") {
    val dir = Files.createTempDirectory("graft_streamsink_").toString
    val ckpt = Files.createTempDirectory("graft_streamsink_ckpt_").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    def start() = mem.toDF().writeStream.format("graft")
      .option("graft.recordkey.field", "event_id")
      .option("graft.precombine.field", "value")
      .option("graft.partitionpath.field", "event_type")
      .option("checkpointLocation", ckpt)
      .start(dir)
    val q = start()
    mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0))
    q.processAllAvailable()
    mem.addData(Event(1, ts(2), 1, "click", 9.0), Event(3, ts(3), 2, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val back = spark.read.format("graft").load(dir)
    assert(back.count() === 3)
    assert(back.filter(col("event_id") === 1)
      .select("value").collect()(0).getDouble(0) === 9.0)
    // restart from the SAME checkpoint: committed batches must not replay
    val t = GraftTable.load(spark, dir)
    val commits = t.timeline.completed().size
    val q2 = start()
    q2.processAllAvailable()
    mem.addData(Event(4, ts(4), 2, "view", 4.0))
    q2.processAllAvailable()
    q2.stop()
    t.timeline.refresh()
    assert(t.timeline.completed().size === commits + 1, "replayed or skipped batches")
    assert(spark.read.format("graft").load(dir).count() === 4)
    GraftTable.drop(dir)
  }

  test("MOR sink compacts asynchronously off the micro-batch path") {
    val dir = Files.createTempDirectory("graft_sinkac_").toString
    val ckpt = Files.createTempDirectory("graft_sinkac_ckpt_").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = mem.toDF().writeStream.format("graft")
      .option("graft.recordkey.field", "event_id")
      .option("graft.precombine.field", "value")
      .option("graft.table.type", "mor")
      .option("graft.compaction.async.every", "1")
      .option("checkpointLocation", ckpt)
      .start(dir)
    mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0))
    q.processAllAvailable() // base
    mem.addData(Event(1, ts(2), 1, "click", 5.0))
    q.processAllAvailable() // log → schedules a plan, executes off-thread
    mem.addData(Event(3, ts(3), 2, "click", 3.0))
    q.processAllAvailable()
    // the async execution lands without any further batch: poll the timeline
    val t = GraftTable.load(spark, dir)
    val deadline = System.currentTimeMillis() + 30000
    while (System.currentTimeMillis() < deadline &&
        { t.timeline.refresh()
          !t.timeline.metas(None).exists(_.operation == "compact") })
      Thread.sleep(200)
    q.stop()
    t.timeline.refresh()
    assert(t.timeline.metas(None).exists(_.operation == "compact"),
      "async compaction never executed")
    val back = spark.read.format("graft").load(dir)
    assert(back.count() === 3)
    assert(back.filter(col("event_id") === 1)
      .select("value").collect()(0).getDouble(0) === 5.0)
    // read-optimized sees the folded value too once compaction landed
    assert(spark.read.format("graft")
      .option("graft.query.type", "read_optimized").load(dir)
      .filter(col("event_id") === 1 && col("value") === 5.0).count() === 1)
    GraftTable.drop(dir)
  }

  test("sink retry policy: ignore.failed.batch drops a poisoned batch only on opt-in") {
    implicit val sqlCtx = spark.sqlContext
    // a transform yielding NULL record keys poisons every write attempt
    val poison = "SELECT CAST(NULL AS BIGINT) AS event_id, value FROM <SRC>"
    def run(ignore: Boolean): (String, Either[Throwable, Long]) = {
      val dir = Files.createTempDirectory("graft_sinkretry_").toString
      val mem = MemoryStream[Event]
      val q = mem.toDF().writeStream.format("graft")
        .option("graft.recordkey.field", "event_id")
        .option("graft.transformer.sql", poison)
        .option("graft.streaming.retry.count", "1")
        .option("graft.streaming.retry.interval.ms", "10")
        .option("graft.streaming.ignore.failed.batch", ignore.toString)
        .option("checkpointLocation",
          Files.createTempDirectory("graft_sinkretry_ckpt_").toString)
        .start(dir)
      mem.addData(Event(1, ts(0), 1, "click", 1.0))
      val res = try {
        q.processAllAvailable()
        Right(spark.read.format("graft").load(dir).count())
      } catch { case e: Throwable => Left(e) } finally q.stop()
      (dir, res)
    }
    // default posture: the failure surfaces, the query dies (exactly-once kept)
    val (d1, strict) = run(ignore = false)
    assert(strict.isLeft, "poisoned batch must fail the query by default")
    // opt-in: after retries the batch is dropped and the stream continues
    val (d2, lax) = run(ignore = true)
    assert(lax === Right(0L), s"opt-in drop should land zero rows, got $lax")
    GraftTable.drop(d1); GraftTable.drop(d2)
  }

  test("sink transformer SQL reshapes each micro-batch before the commit") {
    val dir = Files.createTempDirectory("graft_sinktx_").toString
    val ckpt = Files.createTempDirectory("graft_sinktx_ckpt_").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // the DeltaStreamer transform seam: filter + derive a column between
    // source and sink, inside the same exactly-once commit
    // table config references the POST-transform schema (value -> cents)
    val q = mem.toDF().writeStream.format("graft")
      .option("graft.recordkey.field", "event_id")
      .option("graft.precombine.field", "cents")
      .option("graft.transformer.sql",
        "SELECT event_id, event_type, value * 100 AS cents " +
          "FROM <SRC> WHERE event_type = 'click'")
      .option("checkpointLocation", ckpt)
      .start(dir)
    mem.addData(Event(1, ts(0), 1, "click", 1.5), Event(2, ts(1), 1, "view", 2.0),
      Event(3, ts(2), 2, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val back = spark.read.format("graft").load(dir)
    assert(back.columns.toSet.intersect(Set("event_id", "event_type", "cents"))
      === Set("event_id", "event_type", "cents"))
    assert(back.count() === 2, "transform filter did not apply")
    assert(back.filter(col("event_id") === 1)
      .select("cents").collect()(0).getDouble(0) === 150.0)
    // a transform without the <SRC> placeholder fails fast
    val q2 = mem.toDF().writeStream.format("graft")
      .option("graft.recordkey.field", "event_id")
      .option("graft.transformer.sql", "SELECT 1")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_sinktx_bad_").toString)
      .start(Files.createTempDirectory("graft_sinktx_bad_t_").toString)
    mem.addData(Event(9, ts(3), 3, "click", 1.0))
    intercept[Exception] { q2.processAllAvailable() }
    q2.stop()
    GraftTable.drop(dir)
  }

  test("readStream.format(\"graft\") streams a table's commits incrementally") {
    val dir = Files.createTempDirectory("graft_streamsrc_").toString
    val t = eventsTable(dir)
    t.bulkInsert(Seq(Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 1, "view", 2.0)).toDF())
    val q = spark.readStream.format("graft").load(dir)
      .writeStream.format("memory").queryName("gsrc_mem").outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("gsrc_mem").count() === 2)
    // the next micro-batch carries only the CHANGED records
    t.upsert(Seq(Event(1, ts(2), 1, "click", 9.0),
      Event(3, ts(3), 2, "click", 3.0)).toDF())
    q.processAllAvailable()
    val rows = spark.table("gsrc_mem")
    assert(rows.count() === 4, "incremental batch should add exactly the 2 changed rows")
    assert(rows.filter(col("event_id") === 1 && col("value") === 9.0).count() === 1)
    q.stop()
    GraftTable.drop(dir)
  }

  test("readStream catch-up bound: N commits per micro-batch, cursor survives restart") {
    val dir = Files.createTempDirectory("graft_streamrate_").toString
    val ckpt = Files.createTempDirectory("graft_streamrate_ckpt_").toString
    val sink = Files.createTempDirectory("graft_streamrate_out_").toString
    val t = eventsTable(dir)
    // 5 commits of history BEFORE the stream starts
    for (i <- 1 to 5)
      t.upsert(Seq(Event(i, ts(i), i, "click", i.toDouble)).toDF())
    def start() = spark.readStream.format("graft")
      .option("graft.max.instants.per.trigger", "2").load(dir)
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q = start()
    q.processAllAvailable()
    q.stop()
    // history drained fully, in bounded steps (5 commits / 2 per batch ≥ 3 batches)
    assert(spark.read.parquet(sink).count() === 5)
    val offsetFiles = Files.list(java.nio.file.Paths.get(ckpt, "offsets"))
      .iterator().asScala.count(p => p.getFileName.toString.forall(_.isDigit))
    assert(offsetFiles >= 3, s"expected >= 3 bounded micro-batches, got $offsetFiles")
    // restart with new commits: resumes cleanly, no replay of the 5
    t.upsert(Seq(Event(9, ts(9), 9, "view", 9.0)).toDF())
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(sink)
    assert(rows.count() === 6, "replayed or lost rows on restart")
    assert(rows.filter(col("event_id") === 9).count() === 1)
    GraftTable.drop(dir)
  }

  test("CdcFeed polls change rows with op and before/after images") {
    val dir = Files.createTempDirectory("graft_cdcfeed_").toString
    val t = eventsTable(dir)
    t.bulkInsert(Seq(Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 1, "view", 2.0)).toDF())
    val feed = new CdcFeed(t)
    val first = feed.poll()
    assert(first.nonEmpty)
    assert(first.get._2.select("op").collect().map(_.getString(0)).toSeq === Seq("i", "i"))
    assert(feed.poll().isEmpty) // nothing new
    // an update, an insert and a delete in the next window
    t.upsert(Seq(Event(2, ts(9), 1, "view", 7.0), Event(5, ts(4), 2, "click", 1.0)).toDF())
    t.delete(Seq(Event(1, ts(0), 1, "click", 1.0)).toDF())
    val rows = feed.poll().get._2
      .select(coalesce(col("before.event_id"), col("after.event_id")).as("id"),
        col("op"), col("before.value"), col("after.value"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)))).sortBy(_._1)
    assert(rows.toSeq === Seq(
      (1L, "d", Some(1.0), None),
      (2L, "u", Some(2.0), Some(7.0)),
      (5L, "i", None, Some(1.0))))
    assert(feed.poll().isEmpty)
    GraftTable.drop(dir)
  }

  test("archival: old instants fold into a checkpoint, reads keep working") {
    val dir = Files.createTempDirectory("graft_arch_").toString
    val t = eventsTable(dir)
    for (i <- 1 to 6)
      t.upsert(Seq(Event(i.toLong, ts(i), 1, "click", i.toDouble)).toDF())
    val before = t.snapshot().count()
    val archived = t.archive(keepLast = 2)
    assert(archived === 4)
    assert(t.timeline.archivedInstants().size === 4)
    assert(t.snapshot().count() === before)
    // still updatable after archival
    t.upsert(Seq(Event(1, ts(99), 1, "click", 42.0)).toDF())
    assert(t.snapshot().filter(col("event_id") === 1)
      .select("value").collect()(0).getDouble(0) === 42.0)
    GraftTable.drop(dir)
  }

  test("sink clusters asynchronously when opted in (clustering.async)") {
    val dir = Files.createTempDirectory("graft_sinkclu_").toString
    val ckpt = Files.createTempDirectory("graft_sinkclu_ckpt_").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = mem.toDF().writeStream.format("graft")
      .option("graft.recordkey.field", "event_id")
      .option("graft.precombine.field", "value")
      .option("graft.clustering.async", "true")
      .option("graft.clustering.async.every", "1")
      .option("graft.clustering.sort.columns", "user_id")
      .option("checkpointLocation", ckpt)
      .start(dir)
    mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 3, "view", 2.0))
    q.processAllAvailable() // batch 1 → schedules a plan, executes off-thread
    mem.addData(Event(3, ts(2), 2, "click", 3.0))
    q.processAllAvailable()
    val t = GraftTable.load(spark, dir)
    val deadline = System.currentTimeMillis() + 30000
    while (System.currentTimeMillis() < deadline &&
        { t.timeline.refresh()
          !t.timeline.metas(None).exists(m =>
            m.action == "replacecommit" && m.operation == "cluster") })
      Thread.sleep(200)
    q.stop()
    t.timeline.refresh()
    assert(t.timeline.metas(None).exists(m =>
        m.action == "replacecommit" && m.operation == "cluster"),
      "async clustering never executed")
    val back = spark.read.format("graft").load(dir)
    assert(back.count() === 3)
    assert(back.select(sum("value")).collect()(0).getDouble(0) === 6.0)
    // q.stop() does not await the sink's daemon service thread (the Sink
    // API has no close hook; an interrupted service is swept by rollback,
    // not awaited — the async contract). With every=1 a SECOND clustering
    // plan may still be draining its staging dir here, so teardown retries
    // until the thread exits instead of racing the recursive delete.
    val dropBy = System.currentTimeMillis() + 30000
    var dropped = false
    while (!dropped) {
      try { GraftTable.drop(dir); dropped = true }
      catch {
        case _: java.nio.file.DirectoryNotEmptyException
            if System.currentTimeMillis() < dropBy => Thread.sleep(200)
      }
    }
  }

  test("optimistic concurrency: overlapping commit since start is detected") {
    val dir = Files.createTempDirectory("graft_occ_").toString
    val t = eventsTable(dir)
    val c1 = t.bulkInsert(Seq(Event(1, ts(0), 1, "click", 1.0)).toDF())
    val groups = t.slices(None).map(s => s"${s.partition}|${s.fileId}").toSet
    // a commit after c1 touching the same group is a conflict...
    t.upsert(Seq(Event(1, ts(1), 1, "click", 2.0)).toDF())
    assert(t.detectConflict(Set(c1), groups))
    // ...but disjoint groups are not
    assert(!t.detectConflict(Set(c1), Set("event_type=purchase|b99999")))
    GraftTable.drop(dir)
  }
}
