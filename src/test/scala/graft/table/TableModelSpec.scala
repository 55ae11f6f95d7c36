package graft.table

import java.nio.file.Files
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Model-based testing: a seeded random sequence of write operations and
 * table services runs against BOTH a GraftTable and a driver-side model
 * (key → row map with the engine's documented merge semantics); the
 * snapshot must equal the model after EVERY step. Services (compact /
 * cluster / clean / archive) must never change visible data. This is the
 * net under the targeted specs — interaction bugs between operations
 * surface here even when each operation's own spec is green.
 */
case class ModelRow(id: Long, p: String, v: Long, ver: Long)

class TableModelSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private type R = ModelRow
  private def R(id: Long, p: String, v: Long, ver: Long) = ModelRow(id, p, v, ver)

  private def df(rows: Seq[R]) = rows.toDF()

  private def run(tt: TableType, seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = Files.createTempDirectory(s"graft_model_${tt.name}_").toString
    val t = GraftTable.create(spark, dir, TableConfig("model", tt,
      keyFields = Seq("id"), precombineField = Some("ver"),
      partitioning = PartitionByColumns(Seq("p")),
      targetFileSizeRows = 50))
    val parts = Seq("a", "b", "c")
    var model = Map.empty[Long, R]
    var step = 0

    def freshRows(n: Int): Seq[R] =
      (1 to n).map { _ =>
        val id = rnd.nextInt(300).toLong
        R(id, parts(rnd.nextInt(parts.length)), rnd.nextInt(1000).toLong,
          rnd.nextInt(100).toLong)
      }

    // within-batch precombine: highest ver per (partition, key) wins; the
    // engine then merges by ARRIVAL (OverwriteLatest) against the store.
    // Matching is per (key, partition): the same id written under a new
    // partition value is a NEW row unless upsertGlobal is used — the model
    // keys on id only when the batch keeps the stored partition, so batches
    // REUSE the stored partition for known ids (the common workload).
    def pin(rows: Seq[R]): Seq[R] =
      rows.map(r => model.get(r.id).map(m => r.copy(p = m.p)).getOrElse(r))
    def precombined(rows: Seq[R]): Seq[R] =
      rows.groupBy(r => (r.id, r.p)).values.map(_.maxBy(_.ver)).toSeq

    def check(what: String): Unit = {
      val got = t.snapshot().select("id", "p", "v", "ver").as[ModelRow]
        .collect().sortBy(r => (r.id, r.p)).toSeq
      val want = model.values.toSeq.sortBy(r => (r.id, r.p))
      assert(got === want, s"step $step ($what, ${tt.name}, seed $seed)")
    }

    // time-travel net: the PREVIOUS step's state must stay readable (one
    // step back is always inside the clean retention window) and equal the
    // previous model, whatever ops/services ran since
    var prev: Option[(String, Seq[R])] = None
    def checkTravel(what: String): Unit = {
      prev.foreach { case (instant, want) =>
        val got = t.snapshot(asOf = Some(instant))
          .select("id", "p", "v", "ver").as[ModelRow]
          .collect().sortBy(r => (r.id, r.p)).toSeq
        assert(got === want,
          s"time travel to $instant diverged at step $step ($what, ${tt.name}, seed $seed)")
      }
      t.timeline.refresh()
      prev = Some((t.timeline.completed().last._1,
        model.values.toSeq.sortBy(r => (r.id, r.p))))
    }

    // bulk_insert skips precombine entirely — feed it pre-deduped rows
    val init = precombined(freshRows(80))
      .groupBy(_.id).values.map(_.maxBy(_.ver)).toSeq // unique per id too
    val t2 = t
    t2.bulkInsert(df(init))
    model = init.map(r => r.id -> r).toMap

    for (_ <- 1 to 18) {
      step += 1
      rnd.nextInt(9) match {
        case 0 | 1 => // upsert: one row per id (the model is keyed by id)
          val rows = pin(freshRows(1 + rnd.nextInt(30)))
            .groupBy(_.id).values.map(_.maxBy(_.ver)).toSeq
          t2.upsert(df(rows))
          model ++= rows.map(r => r.id -> r)
        case 2 => // delete known keys
          val ids = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(10))
          if (ids.nonEmpty) {
            t2.delete(df(ids.map(model)))
            model --= ids
          }
        case 3 => // insert_overwrite one partition's content — ids from a
          // per-partition range so an overwrite row can never collide with
          // a live id in ANOTHER partition (the model is keyed by id)
          val part = parts(rnd.nextInt(parts.length))
          val rows = freshRows(10)
            .map(r => r.copy(id = 1000L + parts.indexOf(part) * 1000 + r.id, p = part))
            .groupBy(_.id).values.map(_.maxBy(_.ver)).toSeq
          t2.insertOverwrite(df(rows))
          model = model.filterNot(_._2.p == part) ++ rows.map(r => r.id -> r)
        case 4 => // delete_partition
          val part = parts(rnd.nextInt(parts.length))
          t2.deletePartitions(Seq(s"p=$part"))
          model = model.filterNot(_._2.p == part)
        case 5 => // compaction (MOR) — a service must not change data
          if (tt == MergeOnRead) t2.compact()
        case 6 => // clustering or clean
          if (rnd.nextBoolean()) t2.cluster(Seq("v"))
          else t2.clean(KeepLatestCommits(3))
        case 7 => // archive
          t2.archive(keepLast = 5)
        case 8 => // async indexing / bloom + file-listing metadata —
          // services, data-neutral. After a syncMetadataTable every
          // subsequent snapshot/travel check reads an MDT-SERVED listing,
          // so the whole op mix downstream exercises segment-fold equality
          rnd.nextInt(4) match {
            case 0 => t2.scheduleIndex()
            case 1 => // run the oldest pending index plan, if any
              t2.pendingPlans().collectFirst { case (i, "index_schedule") => i }
                .foreach(t2.runIndex)
            case 2 => t2.syncBloomMetadata()
            case 3 => t2.syncMetadataTable()
          }
      }
      check(s"op#$step")
      checkTravel(s"op#$step")
    }
    GraftTable.drop(dir)
  }

  for (tt <- Seq(CopyOnWrite, MergeOnRead); seed <- Seq(7, 42))
    test(s"random op sequence matches the model (${tt.name}, seed $seed)") {
      run(tt, seed)
    }
}
