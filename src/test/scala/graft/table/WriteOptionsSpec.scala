package graft.table

import java.nio.file.{Files, Paths}
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object RecordingCallback {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
}
class RecordingCallback extends CommitCallback {
  override def onCommit(tablePath: String, meta: CommitMeta): Unit =
    RecordingCallback.seen.add((meta.instant, meta.operation))
}
class ExplodingCallback extends CommitCallback {
  override def onCommit(tablePath: String, meta: CommitMeta): Unit =
    throw new RuntimeException("callback down")
}

/** Write-door option parity added in round 7: combine.before.insert and
  * the post-commit callback (ref: hoodie.combine.before.insert,
  * hoodie.write.commit.callback.class). */
class WriteOptionsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_wopts_").toString

  test("combine.before.insert=false appends duplicate keys; default dedups") {
    val batch = Seq((1L, "a", 1L), (1L, "b", 2L), (2L, "c", 3L))
      .toDF("id", "payload", "v")
    val dedup = tmp()
    batch.write.format("graft")
      .option("graft.recordkey.field", "id")
      .option("graft.precombine.field", "v")
      .option("graft.operation", "insert")
      .mode("append").save(dedup)
    assert(spark.read.format("graft").load(dedup).count() === 2)
    val dups = tmp()
    batch.write.format("graft")
      .option("graft.recordkey.field", "id")
      .option("graft.precombine.field", "v")
      .option("graft.operation", "insert")
      .option("graft.combine.before.insert", "false")
      .mode("append").save(dups)
    val back = spark.read.format("graft").load(dups)
    assert(back.count() === 3, "duplicates must all append when combining is off")
    assert(back.filter(col("id") === 1).count() === 2)
    GraftTable.drop(dedup); GraftTable.drop(dups)
  }

  test("commit callback fires per door write with the write's own instant") {
    val dir = tmp()
    RecordingCallback.seen.clear()
    def write(op: String, ids: Seq[Long]): Unit =
      ids.map(i => (i, s"p$i", i)).toDF("id", "payload", "v")
        .write.format("graft")
        .option("graft.recordkey.field", "id")
        .option("graft.precombine.field", "v")
        .option("graft.operation", op)
        .option("graft.commit.callback.class", "graft.table.RecordingCallback")
        .mode("append").save(dir)
    write("bulk_insert", Seq(1L, 2L))
    write("upsert", Seq(1L))
    val got = RecordingCallback.seen.toArray(Array.empty[(String, String)])
    assert(got.length === 2, got.mkString(","))
    assert(got.map(_._2).toSeq === Seq("bulk_insert", "upsert"))
    val instants = GraftTable.load(spark, dir).timeline.completed().map(_._1)
    assert(got.map(_._1).forall(instants.contains))
    GraftTable.drop(dir)
  }

  test("FileCommitCallback appends an audit line per commit") {
    val dir = tmp()
    Seq((1L, 1L)).toDF("id", "v").write.format("graft")
      .option("graft.recordkey.field", "id")
      .option("graft.commit.callback.class", "graft.table.FileCommitCallback")
      .mode("append").save(dir)
    val log = Paths.get(dir, ".graft", "commit_callbacks.log")
    assert(Files.exists(log))
    val lines = new String(Files.readAllBytes(log), "UTF-8").trim.linesIterator.toSeq
    assert(lines.size === 1 && lines.head.contains("\"operation\""))
    GraftTable.drop(dir)
  }

  test("callback failure propagates (the commit itself is already durable)") {
    val dir = tmp()
    val e = intercept[Exception] {
      Seq((1L, 1L)).toDF("id", "v").write.format("graft")
        .option("graft.recordkey.field", "id")
        .option("graft.commit.callback.class", "graft.table.ExplodingCallback")
        .mode("append").save(dir)
    }
    assert(e.getMessage != null)
    // the write committed before the callback blew up
    assert(spark.read.format("graft").load(dir).count() === 1)
    GraftTable.drop(dir)
  }
}
