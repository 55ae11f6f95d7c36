package graft.table

import java.nio.file.Files
import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Automatic table services on the write door (ref: hudi
  * hoodie.compact.inline / hoodie.compact.schedule.inline /
  * hoodie.clustering.inline / hoodie.clean.automatic /
  * hoodie.archive.automatic): the writer maintains its own table, with
  * triggers counted from timeline actions alone. */
class AutoServicesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_autosvc_").toString

  private def rows(ids: Range, v: Int): DataFrame =
    ids.map(i => (i.toLong, s"v$v-$i", v.toLong)).toDF("id", "payload", "ver")

  private def write(dir: String, df: DataFrame, opts: Map[String, String] = Map.empty,
      op: String = "upsert"): Unit = {
    val w = df.write.format("graft")
      .option("graft.recordkey.field", "id")
      .option("graft.precombine.field", "ver")
      .option("graft.table.type", "mor")
      .option("graft.operation", op)
      .mode("append")
    opts.foldLeft(w) { case (b, (k, v)) => b.option(k, v) }.save(dir)
  }

  private def actions(dir: String): Seq[(String, String)] =
    GraftTable.load(spark, dir).timeline.completed()

  test("compact.inline fires after max.delta.commits deltacommits, then count resets") {
    val dir = tmp()
    val opts = Map(
      AutoServices.COMPACT_INLINE -> "true",
      AutoServices.COMPACT_MAX_DELTA_COMMITS -> "2")
    write(dir, rows(1 to 50, 0), opts, op = "bulk_insert") // commit, no logs yet
    write(dir, rows(1 to 50, 1), opts) // deltacommit #1 — below threshold
    assert(!actions(dir).exists { case (i, a) => a == "commit" &&
      GraftTable.load(spark, dir).timeline.read(i, a).operation == "compact" })
    write(dir, rows(1 to 50, 2), opts) // deltacommit #2 — fires
    val t = GraftTable.load(spark, dir)
    val compactions = t.timeline.completed().filter { case (i, a) =>
      a == "commit" && t.timeline.read(i, a).operation == "compact" }
    assert(compactions.size === 1, s"expected one inline compaction: ${actions(dir)}")
    // folded: snapshot correct and served base-only
    val snap = t.snapshot().select("id", "ver").as[(Long, Long)].collect().toMap
    assert(snap.size === 50 && snap.values.forall(_ == 2L))
    assert(t.slices(None).forall(_.logs.isEmpty), "compaction must fold all logs")
    assert(AutoServices.deltaCommitsSinceCompaction(t) === 0)
    GraftTable.drop(dir)
  }

  test("compact.schedule.inline plans instead of executing; run_compaction finishes it") {
    val dir = tmp()
    val opts = Map(
      AutoServices.COMPACT_SCHEDULE_INLINE -> "true",
      AutoServices.COMPACT_MAX_DELTA_COMMITS -> "2")
    write(dir, rows(1 to 40, 0), opts, op = "bulk_insert")
    write(dir, rows(1 to 40, 1), opts)
    write(dir, rows(1 to 40, 2), opts)
    val t = GraftTable.load(spark, dir)
    val plans = t.timeline.completed().filter(_._2 == "compactionreq")
    assert(plans.size === 1, s"expected one scheduled plan: ${actions(dir)}")
    assert(t.slices(None).exists(_.logs.nonEmpty), "schedule must not rewrite data")
    // a pending plan suppresses re-scheduling on the next write
    write(dir, rows(1 to 40, 3), opts)
    assert(actions(dir).count(_._2 == "compactionreq") === 1)
    val t2 = GraftTable.load(spark, dir)
    t2.runCompaction(plans.head._1)
    val snap = t2.snapshot().select("id", "ver").as[(Long, Long)].collect().toMap
    assert(snap.values.forall(_ == 3L))
    GraftTable.drop(dir)
  }

  test("clustering.inline rewrites layout after max.commits data commits") {
    val dir = tmp()
    val opts = Map(
      AutoServices.CLUSTER_INLINE -> "true",
      AutoServices.CLUSTER_MAX_COMMITS -> "2",
      AutoServices.CLUSTER_SORT_COLS -> "payload")
    write(dir, rows(1 to 30, 0), opts, op = "insert")
    assert(!actions(dir).exists(_._2 == "replacecommit"))
    write(dir, rows(31 to 60, 0), opts, op = "insert")
    assert(actions(dir).count(_._2 == "replacecommit") === 1,
      s"clustering should fire on the 2nd commit: ${actions(dir)}")
    val t = GraftTable.load(spark, dir)
    assert(t.snapshot().count() === 60)
    GraftTable.drop(dir)
  }

  test("clustering.inline without sort columns is an actionable error") {
    val dir = tmp()
    val opts = Map(
      AutoServices.CLUSTER_INLINE -> "true",
      AutoServices.CLUSTER_MAX_COMMITS -> "1")
    val e = intercept[IllegalArgumentException] {
      write(dir, rows(1 to 10, 0), opts, op = "insert")
    }
    assert(e.getMessage.contains(AutoServices.CLUSTER_SORT_COLS))
    GraftTable.drop(dir)
  }

  test("clean.automatic retains the configured commit window") {
    val dir = tmp()
    val opts = Map(
      AutoServices.CLEAN_AUTOMATIC -> "true",
      AutoServices.CLEAN_RETAIN_COMMITS -> "1")
    write(dir, rows(1 to 20, 0), opts, op = "bulk_insert")
    write(dir, rows(1 to 20, 1), opts)
    write(dir, rows(1 to 20, 2), opts)
    val t = GraftTable.load(spark, dir)
    assert(actions(dir).exists(_._2 == "clean"), "each write should auto-clean")
    val snap = t.snapshot().select("id", "ver").as[(Long, Long)].collect().toMap
    assert(snap.size === 20 && snap.values.forall(_ == 2L))
    GraftTable.drop(dir)
  }

  test("archive.automatic trims the timeline past keep.max down to keep.min") {
    val dir = tmp()
    val opts = Map(
      AutoServices.ARCHIVE_AUTOMATIC -> "true",
      AutoServices.ARCHIVE_KEEP_MAX -> "4",
      AutoServices.ARCHIVE_KEEP_MIN -> "2")
    write(dir, rows(1 to 10, 0), opts, op = "bulk_insert")
    (1 to 5).foreach(v => write(dir, rows(1 to 10, v), opts))
    val t = GraftTable.load(spark, dir)
    val dataActions = Set("commit", "deltacommit", "replacecommit")
    val live = t.timeline.completed().count { case (_, a) => dataActions(a) }
    assert(live <= 4, s"timeline not trimmed: ${actions(dir)}")
    assert(t.timeline.archivedInstants().nonEmpty)
    val snap = t.snapshot().select("id", "ver").as[(Long, Long)].collect().toMap
    assert(snap.size === 10 && snap.values.forall(_ == 5L))
    GraftTable.drop(dir)
  }

  test("COW table with compact.inline is a quiet no-op") {
    val dir = tmp()
    val opts = Map(
      AutoServices.COMPACT_INLINE -> "true",
      AutoServices.COMPACT_MAX_DELTA_COMMITS -> "1")
    rows(1 to 10, 0).write.format("graft")
      .option("graft.recordkey.field", "id")
      .option("graft.precombine.field", "ver")
      .option(AutoServices.COMPACT_INLINE, "true")
      .mode("append").save(dir)
    val t = GraftTable.load(spark, dir)
    assert(t.config.tableType === CopyOnWrite)
    assert(!actions(dir).exists { case (i, a) => a == "commit" &&
      t.timeline.read(i, a).operation == "compact" })
    GraftTable.drop(dir)
  }
}
