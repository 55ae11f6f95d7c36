package graft.table

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}
import scala.collection.mutable
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Randomized two-writer soak under optimistic concurrency: two writer
 * THREADS, each with its OWN GraftTable instance over the same base path
 * (the multi-process shape — shared nothing but the filesystem and the
 * file lock), race seeded random upserts/deletes with retry on conflict.
 * The final snapshot must equal a driver-side model replaying every
 * committed batch in COMMIT-INSTANT order (OverwriteLatest semantics:
 * later commit wins, precombine max within a batch). This is the net
 * under the pairwise OCC specs — lost updates, torn tagging, or a
 * conflict check that fails open surface here.
 */
class MultiWriterSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def run(seed: Int, tt: TableType = CopyOnWrite): Unit = {
    val dir = Files.createTempDirectory("graft_mw_").toString
    val cfg = TableConfig("mw", tt,
      keyFields = Seq("id"), precombineField = Some("ver"),
      targetFileSizeRows = 40)
    GraftTable.create(spark, dir, cfg)
    val opsPerWriter = 8
    // (instant, op, rows) from both writers, ordered later
    val committed = mutable.Buffer[(String, String, Seq[(Long, Long, Long)])]()
    val start = new CountDownLatch(1)
    val errors = mutable.Buffer[Throwable]()

    def writer(wid: Int): Thread = new Thread(() => {
      try {
        val t = GraftTable.load(spark, dir) // own instance: multi-process shape
        val rnd = new scala.util.Random(seed * 100 + wid)
        start.await()
        for (_ <- 1 to opsPerWriter) {
          val op = if (rnd.nextInt(4) == 0) "delete" else "upsert"
          val rows = (1 to 1 + rnd.nextInt(12)).map { _ =>
            (rnd.nextInt(60).toLong, rnd.nextInt(1000).toLong,
              rnd.nextInt(100).toLong)
          }.groupBy(_._1).values.map(_.maxBy(_._3)).toSeq // pre-dedup per id
          var done = false
          var attempts = 0
          while (!done) {
            t.timeline.refresh() // observe the other writer before tagging
            try {
              val df = rows.toDF("id", "v", "ver")
              val instant =
                if (op == "delete") t.delete(df) else t.upsert(df)
              committed.synchronized { committed += ((instant, op, rows)) }
              done = true
            } catch {
              case _: ConcurrentWriteException =>
                attempts += 1
                if (attempts > 20) sys.error(s"writer $wid starved")
            }
          }
        }
      } catch { case e: Throwable => errors.synchronized { errors += e } }
    }, s"graft-mw-writer-$wid")

    val ws = Seq(writer(0), writer(1))
    ws.foreach(_.start()); start.countDown()
    ws.foreach(_.join(TimeUnit.MINUTES.toMillis(5)))
    assert(errors.isEmpty, errors.headOption.map(_.toString).getOrElse(""))
    assert(committed.size === 2 * opsPerWriter)
    val instants = committed.map(_._1)
    assert(instants.distinct.size === instants.size, "two commits shared an instant")

    // replay in commit order against the model
    var model = Map.empty[Long, (Long, Long)] // id -> (v, ver)
    for ((_, op, rows) <- committed.sortBy(_._1)) {
      if (op == "delete") model --= rows.map(_._1)
      else model ++= rows.map { case (id, v, ver) => id -> (v, ver) }
    }
    val t = GraftTable.load(spark, dir)
    val got = t.snapshot().select("id", "v", "ver")
      .as[(Long, Long, Long)].collect()
      .map { case (id, v, ver) => id -> (v, ver) }.toMap
    if (got != model) {
      // forensic dump: the racing schedule is not replayable, so capture
      // everything needed to diagnose this run — commit metadata and the
      // ops (by thread) that touched the diverged keys
      val diff = (model.keySet -- got.keySet) ++ (got.keySet -- model.keySet) ++
        model.keySet.intersect(got.keySet).filter(k => model(k) != got(k))
      val info = new StringBuilder(s"seed $seed diverged keys=$diff\n")
      t.timeline.metas(None).foreach { m =>
        info ++= s"${m.instant} ${m.action} ${m.operation} files=${
          m.files.map(f => s"${f.fileId}@${f.path}(${f.rows})").mkString(",")} replaced=${
          m.replaced.mkString(",")}\n"
      }
      committed.sortBy(_._1).foreach { case (i, op, rows) =>
        val hit = rows.filter(r => diff.contains(r._1))
        if (hit.nonEmpty) info ++= s"op $i $op touching diverged: $hit\n"
      }
      fail(info.toString)
    }
    GraftTable.drop(dir)
  }

  for (seed <- Seq(3, 11, 29))
    test(s"two racing writers converge to the commit-order model (seed $seed)") {
      run(seed)
    }

  // MOR: racing deltacommits append logs to shared groups — the conflict
  // on touched groups plus the seen-set check must hold there too
  for (seed <- Seq(5, 17))
    test(s"two racing MOR writers converge to the commit-order model (seed $seed)") {
      run(seed, MergeOnRead)
    }

  test("two writers + a racing service thread (compact/clean/archive) stay model-correct") {
    val dir = Files.createTempDirectory("graft_mw_svc_").toString
    GraftTable.create(spark, dir, TableConfig("mw_svc", MergeOnRead,
      keyFields = Seq("id"), precombineField = Some("ver"),
      targetFileSizeRows = 40))
    val committed = mutable.Buffer[(String, String, Seq[(Long, Long, Long)])]()
    val start = new CountDownLatch(1)
    val errors = mutable.Buffer[Throwable]()
    val writersDone = new java.util.concurrent.atomic.AtomicInteger(0)

    def writer(wid: Int): Thread = new Thread(() => {
      try {
        val t = GraftTable.load(spark, dir)
        val rnd = new scala.util.Random(7000 + wid)
        start.await()
        for (_ <- 1 to 6) {
          val op = if (rnd.nextInt(4) == 0) "delete" else "upsert"
          val rows = (1 to 1 + rnd.nextInt(10)).map { _ =>
            (rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong,
              rnd.nextInt(100).toLong)
          }.groupBy(_._1).values.map(_.maxBy(_._3)).toSeq
          var done = false; var attempts = 0
          while (!done) {
            t.timeline.refresh()
            try {
              val df = rows.toDF("id", "v", "ver")
              val i = if (op == "delete") t.delete(df) else t.upsert(df)
              committed.synchronized { committed += ((i, op, rows)) }
              done = true
            } catch { case _: ConcurrentWriteException =>
              attempts += 1; if (attempts > 30) sys.error(s"writer $wid starved")
            }
          }
        }
      } catch { case e: Throwable => errors.synchronized { errors += e } }
      finally writersDone.incrementAndGet()
    }, s"graft-mwsvc-writer-$wid")

    // services are data-NEUTRAL: they race the writers freely, swallow
    // optimistic-concurrency aborts, and must never change visible rows
    val service = new Thread(() => {
      try {
        val t = GraftTable.load(spark, dir)
        val rnd = new scala.util.Random(971)
        start.await()
        while (writersDone.get() < 2) {
          t.timeline.refresh()
          try rnd.nextInt(6) match {
            case 0 => t.compact()
            case 1 => t.clean(KeepLatestCommits(5))
            case 2 => t.archive(keepLast = 6)
            case 3 => t.scheduleCompaction().foreach(t.runCompaction)
            // metadata-table maintenance races the writers too: listings
            // flip MDT-served mid-soak and every later read goes through
            // the segments + post-sync JSON path under concurrency
            case 4 => t.syncMetadataTable()
            case 5 => t.syncBloomMetadata()
          } catch {
            case _: ConcurrentWriteException => // expected under race
            case e: IllegalArgumentException
              if String.valueOf(e.getMessage).contains("executed") => // raced plan
          }
          Thread.sleep(30)
        }
      } catch { case e: Throwable => errors.synchronized { errors += e } }
    }, "graft-mwsvc-service")

    val ws = Seq(writer(0), writer(1))
    (ws :+ service).foreach(_.start()); start.countDown()
    ws.foreach(_.join(TimeUnit.MINUTES.toMillis(5)))
    service.join(TimeUnit.MINUTES.toMillis(2))
    assert(errors.isEmpty, errors.headOption.map(_.toString).getOrElse(""))
    var model = Map.empty[Long, (Long, Long)]
    for ((_, op, rows) <- committed.sortBy(_._1)) {
      if (op == "delete") model --= rows.map(_._1)
      else model ++= rows.map { case (id, v, ver) => id -> (v, ver) }
    }
    val t = GraftTable.load(spark, dir)
    def snap(x: GraftTable) = x.snapshot().select("id", "v", "ver")
      .as[(Long, Long, Long)].collect()
      .map { case (id, v, ver) => id -> (v, ver) }.toMap
    assert(snap(t) === model, "snapshot diverged with services racing")
    // the race left MDT segments behind (service syncs) — force a
    // STALENESS event on top of them: one more commit, rolled back. The
    // fail-soft path must serve the JSON fold, and the next sync rebuilds.
    t.syncMetadataTable()
    t.upsert(Seq((999L, 1L, 1L)).toDF("id", "v", "ver"))
    t.rollback()
    val afterRb = GraftTable.load(spark, dir)
    assert(snap(afterRb) === model,
      "post-rollback listing diverged from the JSON fold")
    afterRb.syncMetadataTable() // staleness detected -> rebuild
    val resynced = GraftTable.load(spark, dir)
    assert(snap(resynced) === model, "post-rebuild listing diverged")
    GraftTable.drop(dir)
  }

  test("racing strict inserts of the same new key: exactly one wins") {
    val dir = Files.createTempDirectory("graft_strict_race_").toString
    GraftTable.create(spark, dir, TableConfig("strict_race", CopyOnWrite,
      keyFields = Seq("id")))
    val start = new CountDownLatch(1)
    val outcomes = mutable.Buffer[Either[Throwable, String]]()
    val ts = (0 until 2).map { i =>
      new Thread(() => {
        val t = GraftTable.load(spark, dir)
        start.await()
        val r = try Right(t.insertStrict(Seq((7L, s"w$i")).toDF("id", "v")))
                catch { case e: Throwable => Left(e) }
        outcomes.synchronized { outcomes += r }
      }, s"graft-strict-$i")
    }
    ts.foreach(_.start()); start.countDown()
    ts.foreach(_.join(TimeUnit.MINUTES.toMillis(3)))
    val t = GraftTable.load(spark, dir)
    assert(t.snapshot().filter(col("id") === 7L).count() === 1,
      "duplicate key landed through the strict guard")
    // the loser (if the race materialized) must have failed with the
    // duplicate-key error after its conflict-forced re-probe, never a
    // silent second commit
    val losers = outcomes.collect { case Left(e) => e }
    assert(outcomes.count(_.isRight) + losers.size === 2)
    assert(outcomes.count(_.isRight) >= 1, "both strict inserts failed")
    losers.foreach(e => assert(
      e.isInstanceOf[IllegalStateException] &&
        e.getMessage.contains("already exists"), e.toString))
    GraftTable.drop(dir)
  }
}
