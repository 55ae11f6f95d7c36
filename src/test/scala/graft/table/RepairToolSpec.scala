package graft.table

import java.nio.file.{Files, Paths}
import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** repair_table (ref: hudi-utilities HoodieRepairTool modes): dangling-file
  * repair with a reversible backup. */
class RepairToolSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("dry_run lists, repair moves to backup, undo restores") {
    val dir = Files.createTempDirectory("graft_repair_").toString
    val t = GraftTable.create(spark, dir, TableConfig("rep_t", CopyOnWrite,
      keyFields = Seq("id"), partitioning = PartitionByColumns(Seq("part"))))
    t.bulkInsert((1 to 10).map(i => (i.toLong, s"p${i % 2}"))
      .toDF("id", "part"))
    val before = t.snapshot().count()

    // two planted orphans in a real partition dir (completed-looking
    // names, claimed by no inflight instant)
    val part = Paths.get(dir, "part=p0")
    val orphans = Seq("deadbeef_19990101000000000.parquet",
      "cafebabe_19990101000000001.parquet").map(part.resolve)
    orphans.foreach(p => Files.write(p, Array[Byte](1, 2, 3)))

    // dry_run: listed, nothing touched
    val dry = GraftSql.repairTable(t, "dry_run").collect()
    assert(dry.map(_.getString(1)).toSet === Set("would_move"))
    assert(dry.map(_.getString(0)).toSet ===
      orphans.map(p => Paths.get(dir).relativize(p).toString).toSet)
    assert(orphans.forall(Files.exists(_)))

    // repair: moved to the backup, validator now clean, data unaffected
    val rep = GraftSql.repairTable(t, "repair").collect()
    assert(rep.length === 2 && rep.forall(_.getString(1) == "moved"))
    val backupId = rep.head.getString(2)
    assert(backupId.nonEmpty)
    assert(orphans.forall(!Files.exists(_)))
    assert(GraftSql.validateDataTable(t).count() === 0)
    assert(t.snapshot().count() === before)
    orphans.foreach { p =>
      assert(Files.exists(Paths.get(dir, ".graft", "repair_backup", backupId)
        .resolve(Paths.get(dir).relativize(p))))
    }

    // undo: restored in place, dangling again
    val undo = GraftSql.repairTable(t, "undo", Some(backupId)).collect()
    assert(undo.length === 2 && undo.forall(_.getString(1) == "restored"))
    assert(orphans.forall(Files.exists(_)))
    assert(GraftSql.validateDataTable(t)
      .filter(org.apache.spark.sql.functions.col("issue") === "dangling")
      .count() === 2)
    // the consumed backup is gone; undoing it again fails loudly
    val e = intercept[Exception](GraftSql.repairTable(t, "undo", Some(backupId)))
    assert(e.getMessage.contains("no repair backup"))

    // CALL surface
    spark.sql(s"CALL graft.sync_catalog(path => '$dir', db => 'repdb')")
    val viaSql = spark.sql(
      "CALL graft.repair_table(table => 'repdb.rep_t', mode => 'repair')")
      .collect()
    assert(viaSql.length === 2)
    assert(GraftSql.validateDataTable(t).count() === 0)
    GraftTable.drop(dir)
  }

  test("repair with nothing dangling is a no-op; bad mode rejected") {
    val dir = Files.createTempDirectory("graft_repair2_").toString
    val t = GraftTable.create(spark, dir, TableConfig("rep2", CopyOnWrite,
      keyFields = Seq("id")))
    t.bulkInsert(Seq((1L, "a")).toDF("id", "v"))
    assert(GraftSql.repairTable(t, "repair").count() === 0)
    val e = intercept[Exception](GraftSql.repairTable(t, "fix_everything"))
    assert(e.getMessage.contains("unknown repair mode"))
    GraftTable.drop(dir)
  }

  test("undo rejects traversal backup ids; escaped dirs are never walked") {
    val dir = Files.createTempDirectory("graft_repair3_").toString
    val t = GraftTable.create(spark, dir, TableConfig("rep3", CopyOnWrite,
      keyFields = Seq("id")))
    t.bulkInsert(Seq((1L, "a")).toDF("id", "v"))
    // plant a sentinel OUTSIDE the backup root that a '..' id could reach
    val outside = Files.createTempDirectory("graft_outside_")
    Files.write(outside.resolve("sentinel.txt"), "keep".getBytes("UTF-8"))
    val rel = java.nio.file.Paths.get(dir, ".graft", "repair_backup")
      .relativize(outside).toString
    for (bad <- Seq("..", ".", "", rel, "a/b", "..\\x")) {
      val e = intercept[Exception](GraftSql.repairTable(t, "undo", Some(bad)))
      assert(e.getMessage.contains("invalid backup id") ||
        e.getMessage.contains("escapes") ||
        e.getMessage.contains("needs backup"), s"'$bad' → ${e.getMessage}")
    }
    // the sentinel survived every rejected attempt
    assert(Files.isRegularFile(outside.resolve("sentinel.txt")))
    // an unknown-but-plain id still reports cleanly
    val e2 = intercept[Exception](GraftSql.repairTable(t, "undo", Some("nope")))
    assert(e2.getMessage.contains("no repair backup"))
    GraftTable.drop(dir)
    GraftTable.drop(outside.toString)
  }
}
