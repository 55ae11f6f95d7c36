package graft.catalog

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The reference's `CALL` procedure surface (HoodieProcedures) as Spark 4
  * stored procedures: literal `CALL graft.<proc>(...)` statements with
  * named, positional and defaulted arguments, resolved through
  * [[GraftCatalog]]'s ProcedureCatalog side. */
class GraftProcedureSpec extends AnyFunSuite {
  import TestSpark.spark

  private def sql(q: String) = spark.sql(q)

  private def freshMor(name: String, rows: Int = 30): Unit = {
    sql(s"DROP TABLE IF EXISTS graft.$name")
    sql(s"""CREATE TABLE graft.$name (
           |  id BIGINT, status STRING, price DOUBLE, note STRING)
           |USING graft PARTITIONED BY (status)
           |TBLPROPERTIES (
           |  'graft.recordkey.field' = 'id',
           |  'graft.precombine.field' = 'price',
           |  'graft.table.type' = 'mor')""".stripMargin)
    val vals = (1 to rows).map(i =>
      s"(${i}L, '${if (i % 2 == 0) "O" else "F"}', ${i * 10}.0, 'n$i')")
    sql(s"INSERT INTO graft.$name VALUES ${vals.mkString(", ")}")
  }

  test("show_commits / show_partitions / show_table_properties / show_fsview_all") {
    freshMor("p_show")
    val commits = sql("CALL graft.show_commits(`table` => 'p_show')").collect()
    assert(commits.length === 1 && commits(0).getString(1) === "deltacommit")
    assert(commits(0).schema.fieldNames.toSeq ===
      Seq("instant", "action", "operation", "n_files", "rows_written", "n_replaced"))
    // positional args work too
    val parts = sql("CALL graft.show_partitions('p_show')").collect()
    assert(parts.map(_.getString(0)).sorted.toSeq === Seq("status=F", "status=O"))
    val props = sql("CALL graft.show_table_properties('p_show')").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("type") === "mor" && props("recordkey.field") === "id")
    val fsview = sql("CALL graft.show_fsview_all(`table` => 'p_show')")
    assert(fsview.collect().map(_.getLong(5)).sum === 30)
  }

  test("show_compaction / show_clustering / show_commit_write_stats / show_commit_files") {
    freshMor("p_svc", rows = 20)
    // a second batch -> MOR logs -> something to compact; then cluster
    sql("INSERT INTO graft.p_svc VALUES (1L, 'F', 999.0, 'upd')")
    sql("CALL graft.run_compaction(`table` => 'p_svc')")
    sql("CALL graft.run_clustering(`table` => 'p_svc', `order` => 'id')")
    val comp = sql("CALL graft.show_compaction(`table` => 'p_svc')").collect()
    assert(comp.nonEmpty && comp(0).getString(1) === "COMPLETED")
    assert(comp(0).schema.fieldNames.toSeq === Seq("instant", "state",
      "n_files_written", "rows_written", "n_groups_compacted"))
    val clus = sql("CALL graft.show_clustering(`table` => 'p_svc')").collect()
    assert(clus.nonEmpty && clus(0).getString(1) === "COMPLETED")
    assert(clus(0).schema.fieldNames.toSeq === Seq("instant", "state",
      "n_files_written", "rows_written", "n_groups_replaced"))
    val stats = sql("CALL graft.show_commit_write_stats(`table` => 'p_svc')").collect()
    assert(stats.nonEmpty)
    assert(stats(0).schema.fieldNames.toSeq === Seq("instant", "action",
      "operation", "total_files_added", "total_records_written",
      "total_bytes_written"))
    assert(stats.map(_.getLong(4)).sum >= 21, "write stats lost records")
    assert(stats.forall(_.getLong(5) > 0), "bytes_written missing")
    val first = sql("CALL graft.show_commits(`table` => 'p_svc', `limit` => 100)")
      .collect().map(_.getString(0)).min
    val files = sql(s"CALL graft.show_commit_files('p_svc', '$first')").collect()
    assert(files.nonEmpty)
    assert(files(0).schema.fieldNames.toSeq ===
      Seq("partition", "file_id", "path", "rows", "bytes", "is_log"))
    assert(files.map(_.getLong(3)).sum === 20)
    intercept[Exception] {
      sql("CALL graft.show_commit_files('p_svc', '00000000000000000')") }
  }

  test("show_rollbacks / export_instants") {
    freshMor("p_roll", rows = 6)
    sql("INSERT INTO graft.p_roll VALUES (99L, 'O', 1.0, 'extra')")
    sql("CALL graft.run_rollback(`table` => 'p_roll')")
    val rb = sql("CALL graft.show_rollbacks(`table` => 'p_roll')").collect()
    assert(rb.length === 1)
    assert(rb(0).schema.fieldNames.toSeq ===
      Seq("rollback_instant", "rolled_back_instant", "n_files_deleted"))
    assert(rb(0).getString(1).nonEmpty && rb(0).getInt(2) >= 1)
    assert(sql("SELECT count(*) AS c FROM graft.p_roll")
      .collect()(0).getLong(0) === 6)
    val out = java.nio.file.Files.createTempDirectory("graft_export_").toString
    val exp = sql(s"CALL graft.export_instants('p_roll', '$out')").collect()
    assert(exp.nonEmpty)
    assert(exp(0).schema.fieldNames.toSeq === Seq("instant", "action", "exported_to"))
    exp.foreach { r =>
      assert(java.nio.file.Files.isRegularFile(
        java.nio.file.Paths.get(r.getString(2))), s"missing export ${r.getString(2)}")
    }
    // limit caps the export
    val out2 = java.nio.file.Files.createTempDirectory("graft_export2_").toString
    val exp2 = sql(s"CALL graft.export_instants('p_roll', '$out2', 1)").collect()
    assert(exp2.length === 1)
  }

  test("run_bootstrap adopts an existing parquet dir and registers the table") {
    import TestSpark.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_boot_").toString
    (1 to 50).map(i => (i.toLong, s"v$i", i * 1.0)).toDF("k", "v", "price")
      .write.mode("overwrite").parquet(dir)
    sql("DROP TABLE IF EXISTS graft.p_boot")
    val inst = sql(s"""CALL graft.run_bootstrap(`table` => 'p_boot',
        |`location` => '$dir', `record_key_field` => 'k',
        |`precombine_field` => 'price')""".stripMargin).collect()
    assert(inst.length === 1 && inst(0).getString(0) != null)
    assert(sql("SELECT count(*) AS c FROM graft.p_boot")
      .collect()(0).getLong(0) === 50)
    // the adopted files are live data: SQL DML works on them immediately
    sql("UPDATE graft.p_boot SET v = 'updated' WHERE k = 7")
    assert(sql("SELECT v FROM graft.p_boot WHERE k = 7")
      .collect()(0).getString(0) === "updated")
    assert(sql("SELECT count(*) AS c FROM graft.p_boot")
      .collect()(0).getLong(0) === 50)
    intercept[Exception] { // registering over an existing name is refused
      sql(s"CALL graft.run_bootstrap('p_boot', '$dir', 'k')") }
    sql("DROP TABLE graft.p_boot")
  }

  test("stats_wa / stats_file_sizes / show_commit_partitions / show_logfile_metadata") {
    freshMor("p_stats", rows = 20)
    sql("INSERT INTO graft.p_stats VALUES (1L, 'F', 999.0, 'u1'), (2L, 'O', 999.0, 'u2')")
    val wa = sql("CALL graft.stats_wa(`table` => 'p_stats')").collect()
    assert(wa.length === 2)
    assert(wa(0).schema.fieldNames.toSeq === Seq("instant", "operation",
      "batch_rows", "rows_written", "write_amplification"))
    val first = wa.map(r => (r.getString(0), r.getLong(2), r.getLong(3))).minBy(_._1)
    assert(first._2 === 20 && first._3 === 20, s"bulk batch stats: $first")
    // the MOR upsert writes only log rows for the 2 touched groups
    val second = wa.map(r => (r.getString(0), r.getLong(2), r.getDouble(4))).maxBy(_._1)
    assert(second._2 === 2)
    val sizes = sql("CALL graft.stats_file_sizes(`table` => 'p_stats')").collect()
    assert(sizes.map(_.getString(0)).sorted.toSeq === Seq("status=F", "status=O"))
    assert(sizes.forall(r => r.getLong(1) >= 1 && r.getLong(5) > 0))
    val firstInstant = first._1
    val cp = sql(s"CALL graft.show_commit_partitions('p_stats', '$firstInstant')").collect()
    assert(cp.map(_.getString(0)).sorted.toSeq === Seq("status=F", "status=O"))
    assert(cp.map(_.getLong(2)).sum === 20)
    // log files of a touched group
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/p_stats"
    val t = graft.table.GraftTable.load(spark, path)
    val logged = t.slices(None).find(_.logs.nonEmpty).map(_.fileId)
    assert(logged.nonEmpty, "MOR upsert produced no log files")
    val lf = sql(s"CALL graft.show_logfile_metadata('p_stats', '${logged.get}')").collect()
    assert(lf.nonEmpty && lf.forall(_.getString(1) == logged.get))
    assert(lf(0).schema.fieldNames.toSeq ===
      Seq("partition", "file_id", "instant", "path", "rows", "bytes"))
  }

  test("repair_deduplicate / copy_to_table / show_bootstrap_mapping") {
    import TestSpark.spark.implicits._
    // a table WITHOUT precombine: INSERT INTO inserts, so re-inserting an
    // existing key plants real duplicates
    sql("DROP TABLE IF EXISTS graft.p_dup")
    sql("""CREATE TABLE graft.p_dup (id BIGINT, side STRING, v STRING)
          |USING graft PARTITIONED BY (side)
          |TBLPROPERTIES ('graft.recordkey.field' = 'id')""".stripMargin)
    sql("INSERT INTO graft.p_dup VALUES (1L, 'A', 'v1'), (2L, 'A', 'v2'), (3L, 'B', 'v3')")
    sql("INSERT INTO graft.p_dup VALUES (1L, 'A', 'v1dup'), (2L, 'A', 'v2dup')")
    assert(sql("SELECT count(*) AS c FROM graft.p_dup").collect()(0).getLong(0) === 5)
    val removed = sql("CALL graft.repair_deduplicate('p_dup', 'side=A')").collect()
    assert(removed(0).getLong(0) === 2)
    assert(sql("SELECT count(*) AS c FROM graft.p_dup").collect()(0).getLong(0) === 3)
    // the kept version is the latest-committed one
    assert(sql("SELECT v FROM graft.p_dup WHERE id = 1").collect()(0)
      .getString(0) === "v1dup")
    // copy_to_table clones data + config into a new catalog table
    sql("DROP TABLE IF EXISTS graft.p_dup2")
    sql("CALL graft.copy_to_table('p_dup', 'p_dup2')")
    assert(sql("SELECT id, v FROM graft.p_dup2 ORDER BY id").collect().toSeq ===
      sql("SELECT id, v FROM graft.p_dup ORDER BY id").collect().toSeq)
    sql("INSERT INTO graft.p_dup2 VALUES (9L, 'B', 'nine')")
    assert(sql("SELECT count(*) AS c FROM graft.p_dup2").collect()(0).getLong(0) === 4)
    assert(sql("SELECT count(*) AS c FROM graft.p_dup").collect()(0).getLong(0) === 3)
    sql("DROP TABLE graft.p_dup"); sql("DROP TABLE graft.p_dup2")
    // bootstrap mapping lists external files; full-class tables list none
    val dir = java.nio.file.Files.createTempDirectory("graft_bmap_").toString
    (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    sql("DROP TABLE IF EXISTS graft.p_bmap")
    sql(s"CALL graft.run_bootstrap('p_bmap', '$dir', 'k')")
    val bm = sql("CALL graft.show_bootstrap_mapping('p_bmap')").collect()
    assert(bm.nonEmpty && bm.map(_.getLong(3)).sum === 10)
    assert(bm(0).schema.fieldNames.toSeq ===
      Seq("partition", "file_id", "source_file", "rows", "bytes"))
    sql("DROP TABLE graft.p_bmap")
  }

  test("run_bootstrap mode => full_record rewrites into keyed file groups") {
    import TestSpark.spark.implicits._
    import java.nio.file.{Files => NioFiles, Paths => NioPaths}
    import scala.jdk.CollectionConverters._
    val dir = NioFiles.createTempDirectory("graft_fullrec_").toString
    (1 to 40).map(i => (i.toLong, s"v$i", i * 1.0, if (i % 2 == 0) "E" else "O"))
      .toDF("k", "v", "price", "side")
      .write.mode("overwrite").partitionBy("side").parquet(dir)
    val originals = NioFiles.walk(NioPaths.get(dir)).iterator()
      .asScala.filter(_.toString.endsWith(".parquet")).toSeq
    assert(originals.nonEmpty)
    sql("DROP TABLE IF EXISTS graft.p_fullrec")
    sql(s"""CALL graft.run_bootstrap(`table` => 'p_fullrec',
        |`location` => '$dir', `record_key_field` => 'k',
        |`precombine_field` => 'price', `partition_fields` => 'side',
        |`mode` => 'full_record')""".stripMargin)
    // originals are gone — their rows live in keyed graft file groups now
    assert(originals.forall(p => !NioFiles.exists(p)),
      "full_record bootstrap left the adopted originals behind")
    val t = graft.table.GraftTable.load(spark, dir)
    val bases = t.slices(None).flatMap(_.baseFiles)
    assert(bases.nonEmpty && bases.forall(f => !f.external && f.hasBloom),
      "rewritten files must be first-class graft files (meta cols + blooms)")
    assert(sql("SELECT count(*) AS c FROM graft.p_fullrec")
      .collect()(0).getLong(0) === 40)
    // upsert + delete behave exactly as on a natively written table
    sql("UPDATE graft.p_fullrec SET v = 'upd' WHERE k <= 3")
    sql("DELETE FROM graft.p_fullrec WHERE k % 10 = 0")
    assert(sql("SELECT count(*) AS c FROM graft.p_fullrec")
      .collect()(0).getLong(0) === 36)
    assert(sql("SELECT count(*) AS c FROM graft.p_fullrec WHERE v = 'upd'")
      .collect()(0).getLong(0) === 3)
    assert(sql("SELECT sum(k) AS s FROM graft.p_fullrec").collect()(0).getLong(0) ===
      (1 to 40).filter(_ % 10 != 0).sum)
    sql("DROP TABLE graft.p_fullrec")
  }

  test("run_bootstrap failure leaves the source directory untouched") {
    import TestSpark.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bootfail_").toString
    (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    sql("DROP TABLE IF EXISTS graft.p_bootfail")
    // key field that does not exist in the parquet -> adoption must fail
    intercept[Exception] {
      sql(s"CALL graft.run_bootstrap('p_bootfail', '$dir', 'missing_col')") }
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, ".graft")),
      "failed bootstrap left .graft state in the source directory")
    assert(sql("SHOW TABLES IN graft").collect()
      .forall(_.getString(1) != "p_bootfail"),
      "failed bootstrap left the identifier registered")
    // file:-URI locations normalize like createTable's LOCATION handling
    val ok = sql(s"""CALL graft.run_bootstrap(`table` => 'p_bootfile',
        |`location` => 'file:$dir', `record_key_field` => 'k')""".stripMargin)
      .collect()
    assert(ok.length === 1)
    assert(sql("SELECT count(*) AS c FROM graft.p_bootfile")
      .collect()(0).getLong(0) === 10)
    sql("DROP TABLE graft.p_bootfile")
  }

  test("show_commits honors the limit argument and its default") {
    freshMor("p_limit", rows = 4)
    (1 to 3).foreach { i =>
      sql(s"UPDATE graft.p_limit SET note = 'u$i' WHERE id = $i")
    }
    assert(sql("CALL graft.show_commits(`table` => 'p_limit')").count() === 4)
    val top = sql("CALL graft.show_commits(`table` => 'p_limit', `limit` => 2)").collect()
    assert(top.length === 2)
    // newest first
    assert(top(0).getString(0) > top(1).getString(0))
  }

  test("run_compaction folds MOR logs into new bases without changing results") {
    freshMor("p_compact")
    sql("UPDATE graft.p_compact SET price = price * 2 WHERE id % 3 = 0")
    def logCount: Long = sql("CALL graft.show_fsview_all('p_compact')")
      .collect().map(_.getInt(4).toLong).sum
    assert(logCount > 0, "update on a MOR table should land in log files")
    val before = sql("SELECT id, price FROM graft.p_compact ORDER BY id").collect()
    val inst = sql("CALL graft.run_compaction(`table` => 'p_compact')").collect()
    assert(inst.length === 1 && inst(0).getString(0) != null)
    assert(logCount === 0, "compaction should leave no log files")
    assert(sql("SELECT id, price FROM graft.p_compact ORDER BY id").collect() === before)
  }

  test("run_compaction with an IO budget compacts only the worst groups") {
    freshMor("p_budget")
    sql("UPDATE graft.p_budget SET note = 'x' WHERE status = 'O'") // logs in O only
    val inst = sql(
      "CALL graft.run_compaction(`table` => 'p_budget', `min_log_bytes` => 1)")
      .collect()(0).getString(0)
    assert(inst != null)
    // with min_log_bytes=1 every log-bearing group qualifies; none remain
    assert(sql("CALL graft.show_fsview_all('p_budget')")
      .collect().map(_.getInt(4)).sum === 0)
  }

  test("run_clustering rewrites layout, preserves data") {
    freshMor("p_cluster")
    val before = sql("SELECT * FROM graft.p_cluster ORDER BY id").collect()
    val inst = sql(
      "CALL graft.run_clustering(`table` => 'p_cluster', `order` => 'price,id')")
      .collect()(0).getString(0)
    assert(inst != null)
    assert(sql("SELECT * FROM graft.p_cluster ORDER BY id").collect() === before)
  }

  test("rollback_to_instant restores an earlier table state") {
    freshMor("p_rb", rows = 10)
    val first = sql("CALL graft.show_commits('p_rb')").collect()(0).getString(0)
    sql("UPDATE graft.p_rb SET price = 0.0 WHERE id <= 5")
    assert(sql("SELECT sum(price) AS s FROM graft.p_rb").collect()(0).getDouble(0) === 400.0)
    sql(s"CALL graft.rollback_to_instant(`table` => 'p_rb', `instant` => '$first')")
    assert(sql("SELECT sum(price) AS s FROM graft.p_rb").collect()(0).getDouble(0) === 550.0)
  }

  test("create_savepoint / show_savepoints / delete_savepoint / rollback_to_savepoint") {
    freshMor("p_sp", rows = 6)
    val saved = sql("CALL graft.create_savepoint('p_sp')").collect()(0).getString(0)
    val sps = sql("CALL graft.show_savepoints('p_sp')").collect()
    assert(sps.length === 1 && sps(0).getString(1) === saved)
    sql("UPDATE graft.p_sp SET note = 'later' WHERE id = 1")
    sql(s"CALL graft.rollback_to_savepoint(`table` => 'p_sp', `instant` => '$saved')")
    assert(sql("SELECT note FROM graft.p_sp WHERE id = 1").collect()(0).getString(0) === "n1")
    val spInstant = sps(0).getString(0)
    sql(s"CALL graft.delete_savepoint(`table` => 'p_sp', `instant` => '$spInstant')")
    assert(sql("CALL graft.show_savepoints('p_sp')").count() === 0)
    val err = intercept[Exception] {
      sql(s"CALL graft.delete_savepoint(`table` => 'p_sp', `instant` => '$spInstant')")
    }
    assert(err.getMessage.contains("no savepoint"))
  }

  test("create_savepoint at a mid-history instant survives cleaning") {
    freshMor("p_spmid", rows = 6)
    // three more versions of id=1 → four versions of its file group
    (1 to 3).foreach(i => sql(s"UPDATE graft.p_spmid SET price = $i.0 WHERE id = 1"))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/p_spmid"
    val t = graft.table.GraftTable.load(spark, path)
    val instants = t.timeline.metas(None)
      .filter(m => Set("commit", "deltacommit", "replacecommit")(m.action)).map(_.instant)
    val mid = instants(1) // the state after "SET price = 1.0"
    val saved = sql(
      s"CALL graft.create_savepoint(`table` => 'p_spmid', `commit_time` => '$mid')")
      .collect()(0).getString(0)
    assert(saved === mid)
    // aggressive clean: keep only the latest file version — except savepoints
    sql("CALL graft.run_clean(`table` => 'p_spmid', `policy` => 'file_versions', `retain` => 1)")
    // latest state reads fine AND time travel to the savepoint still works
    assert(sql("SELECT price FROM graft.p_spmid WHERE id = 1")
      .collect()(0).getDouble(0) === 3.0)
    val atMid = t.snapshot(Some(mid))
    assert(atMid.filter(org.apache.spark.sql.functions.col("id") === 1L)
      .collect()(0).getAs[Double]("price") === 1.0)
    assert(atMid.count() === 6)
    // an instant that never existed is rejected
    val bad = intercept[Exception] {
      sql("CALL graft.create_savepoint(`table` => 'p_spmid', `commit_time` => '19700101000000000')")
    }
    assert(bad.getMessage.contains("not a data instant"))
    sql("DROP TABLE graft.p_spmid")
  }

  test("run_clean with the commits policy keeps the retained window readable") {
    freshMor("p_clean", rows = 8)
    (1 to 3).foreach(i => sql(s"UPDATE graft.p_clean SET price = price + $i WHERE id = 1"))
    val inst = sql(
      "CALL graft.run_clean(`table` => 'p_clean', `policy` => 'commits', `retain` => 2)")
      .collect()(0).getString(0)
    assert(inst != null)
    assert(sql("SELECT count(*) AS c FROM graft.p_clean").collect()(0).getLong(0) === 8)
    val bad = intercept[Exception] {
      sql("CALL graft.run_clean(`table` => 'p_clean', `policy` => 'bogus')")
    }
    assert(bad.getMessage.contains("unknown clean policy"))
  }

  test("commits_compare reports one-sided instants") {
    freshMor("p_cmp_a", rows = 3)
    freshMor("p_cmp_b", rows = 3)
    val rows = sql("CALL graft.commits_compare(`table` => 'p_cmp_a', `other` => 'p_cmp_b')")
      .collect()
    assert(rows.length === 2)
    assert(rows.map(_.getString(1)).sorted.toSeq === Seq("only_left", "only_right"))
  }

  test("archive_commits + sync_metadata_table run through CALL") {
    freshMor("p_arch", rows = 5)
    (1 to 4).foreach(i => sql(s"UPDATE graft.p_arch SET note = 'a$i' WHERE id = $i"))
    val archived = sql("CALL graft.archive_commits(`table` => 'p_arch', `keep_last` => 2)")
      .collect()(0).getInt(0)
    assert(archived > 0)
    assert(sql("SELECT count(*) AS c FROM graft.p_arch").collect()(0).getLong(0) === 5)
    val path = sql("CALL graft.sync_metadata_table('p_arch')").collect()(0).getString(0)
    // the metadata table is parquet SEGMENTS under the returned dir —
    // readable by any engine with recursive listing (sidecars are
    // underscore-prefixed and ignored by parquet readers)
    assert(spark.read.option("recursiveFileLookup", "true")
      .parquet(path).count() > 0)
    val archInstants = sql("CALL graft.show_archived_commits('p_arch')").collect()
    assert(archInstants.length === archived)
  }

  test("run_rollback undoes the most recent data commit") {
    freshMor("p_runrb", rows = 6)
    sql("UPDATE graft.p_runrb SET price = 0.0 WHERE id = 1")
    assert(sql("SELECT price FROM graft.p_runrb WHERE id = 1")
      .collect()(0).getDouble(0) === 0.0)
    val rolled = sql("CALL graft.run_rollback(`table` => 'p_runrb')")
      .collect()(0).getString(0)
    assert(rolled != null)
    assert(sql("SELECT price FROM graft.p_runrb WHERE id = 1")
      .collect()(0).getDouble(0) === 10.0)
  }

  test("SHOW PROCEDURES / DESCRIBE PROCEDURE surface the catalog's procedures") {
    val names = sql("SHOW PROCEDURES IN graft").collect().map(_.getString(3))
    assert(names.length >= 15 && names.contains("run_compaction")
      && names.contains("show_commits"))
    val desc = sql("DESCRIBE PROCEDURE graft.run_clean")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("run_clean") && desc.contains("file_versions"))
  }

  test("show_commits_metadata / show_fsview_latest / show_rollback_detail / show_logfile_records") {
    freshMor("p_meta", rows = 12)
    sql("INSERT INTO graft.p_meta VALUES (1L, 'F', 999.0, 'u1'), (2L, 'O', 999.0, 'u2')")
    val cm = sql("CALL graft.show_commits_metadata(`table` => 'p_meta')").collect()
    assert(cm.length === 2)
    assert(cm(0).schema.fieldNames.toSeq === Seq("instant", "action",
      "operation", "n_partitions", "n_files", "n_log_files", "rows_written",
      "bytes_written", "n_replaced", "n_deleted_paths", "extra"))
    val bulk = cm.minBy(_.getString(0))
    assert(bulk.getInt(3) === 2 && bulk.getLong(6) === 12)
    assert(bulk.getString(10).contains("batchRows=12"))
    // MOR upsert -> second commit carries log files
    assert(cm.maxBy(_.getString(0)).getInt(5) >= 1)
    val fsv = sql("CALL graft.show_fsview_latest('p_meta', 'status=F')").collect()
    assert(fsv.nonEmpty && fsv.forall(_.getString(0) == "status=F"))
    assert(fsv(0).schema.fieldNames.toSeq === Seq("partition", "file_id",
      "base_instant", "base_bytes", "n_logs", "log_bytes", "log_to_base_ratio"))
    val touched = fsv.find(_.getInt(4) >= 1)
    assert(touched.nonEmpty, "upserted group shows no log debt")
    assert(touched.get.getDouble(6) > 0.0)
    // raw log records of that group, as JSON rows
    val fid = touched.get.getString(1)
    val recs = sql(s"CALL graft.show_logfile_records('p_meta', '$fid')").collect()
    assert(recs.nonEmpty && recs(0).getString(0).contains("999"))
    // rollback the upsert, then inspect its per-file detail
    sql("CALL graft.run_rollback(`table` => 'p_meta')")
    val rbInstant = sql("CALL graft.show_rollbacks('p_meta')")
      .collect()(0).getString(0)
    val det = sql(s"CALL graft.show_rollback_detail('p_meta', '$rbInstant')").collect()
    assert(det.nonEmpty && det.forall(_.getString(2).nonEmpty))
    assert(det(0).schema.fieldNames.toSeq ===
      Seq("rollback_instant", "rolled_back_instant", "deleted_path"))
    intercept[Exception] {
      sql("CALL graft.show_rollback_detail('p_meta', '00000000000000000')") }
  }

  test("metadata-table procedures: show files/partitions/stats, validate, delete") {
    freshMor("p_mdt", rows = 10)
    sql("CALL graft.sync_metadata_table(`table` => 'p_mdt')")
    val files = sql("CALL graft.show_metadata_table_files('p_mdt')").collect()
    assert(files.nonEmpty)
    assert(files(0).schema.fieldNames.toSeq ===
      Seq("partition", "file_id", "instant", "path", "rows", "is_log"))
    assert(files.map(_.getLong(4)).sum === 10)
    val parts = sql("CALL graft.show_metadata_table_partitions('p_mdt')").collect()
    assert(parts.map(_.getString(0)).toSeq === Seq("status=F", "status=O"))
    val stats = sql("CALL graft.show_metadata_table_stats('p_mdt')").collect()
    assert(stats.length === 2 && stats.map(_.getLong(2)).sum === 10)
    // in sync -> no discrepancies
    assert(sql("CALL graft.validate_metadata_table_files('p_mdt')").count() === 0)
    // a commit the sidecar has not seen -> only_timeline rows
    sql("INSERT INTO graft.p_mdt VALUES (1L, 'F', 999.0, 'upd')")
    val diff = sql("CALL graft.validate_metadata_table_files('p_mdt')").collect()
    assert(diff.nonEmpty && diff.forall(_.getString(1) == "only_timeline"))
    val del = sql("CALL graft.delete_metadata_table('p_mdt')").collect()
    assert(del(0).getBoolean(0))
    intercept[Exception] {
      sql("CALL graft.show_metadata_table_files('p_mdt')") }
  }

  test("delete_marker / repair_corrupted_clean_files / repair_overwrite_props") {
    import java.nio.file.{Files => NioFiles, Paths => NioPaths}
    freshMor("p_repair", rows = 8)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/p_repair"
    // simulate a writer that died mid-commit: inflight claim + staged files
    val dead = "99990101000000000"
    NioFiles.createFile(
      NioPaths.get(base, ".graft", "timeline", s"$dead.commit.inflight"))
    val staging = NioPaths.get(base, ".graft", s"staging_$dead")
    NioFiles.createDirectories(staging)
    NioFiles.write(staging.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    val removed = sql(s"CALL graft.delete_marker('p_repair', '$dead')").collect()
    assert(removed(0).getLong(0) === 2)
    assert(!NioFiles.exists(staging) && !NioFiles.exists(
      NioPaths.get(base, ".graft", "timeline", s"$dead.commit.inflight")))
    // completed instants are protected
    val live = sql("CALL graft.show_commits('p_repair')").collect()(0).getString(0)
    intercept[Exception] { sql(s"CALL graft.delete_marker('p_repair', '$live')") }
    // a clean file that no longer parses is removed; data commits stay
    NioFiles.write(
      NioPaths.get(base, ".graft", "timeline", s"$dead.clean.json"),
      "{not json".getBytes("UTF-8"))
    val repaired = sql("CALL graft.repair_corrupted_clean_files('p_repair')").collect()
    assert(repaired.map(_.getString(0)).toSeq === Seq(s"$dead.clean.json"))
    assert(sql("SELECT count(*) AS c FROM graft.p_repair")
      .collect()(0).getLong(0) === 8)
    assert(sql("CALL graft.repair_corrupted_clean_files('p_repair')").count() === 0)
    // overwrite the mutable config subset; structural keys are rejected
    val props = sql("CALL graft.repair_overwrite_props('p_repair', " +
      "'graft.target.file.rows=500, graft.merge.payload=event_time')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("graft.target.file.rows") === "500")
    assert(props("graft.merge.payload") === "event_time")
    val t = graft.table.GraftTable.load(spark, base)
    assert(t.config.targetFileSizeRows === 500)
    intercept[Exception] {
      sql("CALL graft.repair_overwrite_props('p_repair', 'graft.recordkey.field=x')") }
  }

  test("import_parquet / show_bootstrap_partitions / show_archived_commits_metadata") {
    import TestSpark.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_import_").toString
    (1 to 25).map(i => (i.toLong, s"v$i", if (i % 2 == 0) "E" else "O"))
      .toDF("k", "v", "side").write.mode("overwrite").parquet(dir)
    sql("DROP TABLE IF EXISTS graft.p_imp")
    val inst = sql(s"""CALL graft.import_parquet(`table` => 'p_imp',
        |`location` => '$dir', `record_key_field` => 'k',
        |`partition_fields` => 'side')""".stripMargin).collect()
    assert(inst.length === 1)
    assert(sql("SELECT count(*) AS c FROM graft.p_imp")
      .collect()(0).getLong(0) === 25)
    // full copy, NOT adoption: no external files, source stays independent
    assert(sql("CALL graft.show_bootstrap_mapping('p_imp')").count() === 0)
    assert(sql("CALL graft.show_bootstrap_partitions('p_imp')").count() === 0)
    sql("UPDATE graft.p_imp SET v = 'upd' WHERE k = 5")
    assert(spark.read.parquet(dir).count() === 25, "import mutated the source")
    // a bootstrapped table DOES list its partitions as bootstrap-carrying
    sql("DROP TABLE IF EXISTS graft.p_bparts")
    sql(s"CALL graft.run_bootstrap('p_bparts', '$dir', 'k')")
    assert(sql("CALL graft.show_bootstrap_partitions('p_bparts')").count() >= 1)
    sql("DROP TABLE graft.p_bparts") // drops the temp source dir too (adoption)
    // archived commits expose their metadata
    (1 to 3).foreach(i => sql(s"UPDATE graft.p_imp SET v = 'a$i' WHERE k = $i"))
    sql("CALL graft.create_savepoint(`table` => 'p_imp')")
    sql("CALL graft.archive_commits(`table` => 'p_imp', `keep_last` => 2)")
    val arch = sql("CALL graft.show_archived_commits_metadata('p_imp')").collect()
    assert(arch.nonEmpty)
    assert(arch(0).schema.fieldNames.toSeq === Seq("instant", "action",
      "operation", "n_files", "rows_written", "bytes_written", "n_replaced"))
    assert(arch.forall(_.getLong(4) > 0))
    sql("DROP TABLE graft.p_imp")
  }

  test("show_fs_path_detail lists files recursively with sizes") {
    freshMor("p_fsd", rows = 5)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/p_fsd"
    val rows = sql(s"CALL graft.show_fs_path_detail('$base')").collect()
    assert(rows.nonEmpty)
    assert(rows(0).schema.fieldNames.toSeq ===
      Seq("relative_path", "bytes", "modified_ms"))
    assert(rows.exists(_.getString(0).contains(".graft/")), "missing metadata files")
    assert(rows.exists(_.getString(0).endsWith(".parquet")), "missing data files")
    assert(rows.forall(_.getLong(1) >= 0))
    // limit caps the listing
    assert(sql(s"CALL graft.show_fs_path_detail('$base', 3)").count() === 3)
    intercept[Exception] { sql("CALL graft.show_fs_path_detail('/nonexistent_xyz')") }
  }

  test("upgrade_or_downgrade migrates the schema-id format version") {
    import graft.table.GraftTable
    freshMor("p_ver", rows = 6)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/p_ver"
    // regress the table to version 1 (as a pre-version writer would leave it)
    val t0 = GraftTable.load(spark, base)
    GraftTable.saveConfig(base, t0.config.copy(version = 1, schemaOnRead = true))
    sql("INSERT INTO graft.p_ver VALUES (7L, 'F', 70.0, 'n7')") // id-less epoch
    val props1 = sql("CALL graft.show_table_properties('p_ver')").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props1("version") === "1")
    // v1 has no column ids: RENAME is refused even with schema.on.read on
    val err = intercept[Exception] {
      sql("ALTER TABLE graft.p_ver RENAME COLUMN note TO memo") }
    assert(err.getMessage.contains("upgrade_or_downgrade"))
    // upgrade, then the same rename works and old files serve the column
    val up = sql("CALL graft.upgrade_or_downgrade('p_ver', 2)").collect()
    assert(up(0).getInt(0) === 1 && up(0).getInt(1) === 2)
    sql("ALTER TABLE graft.p_ver RENAME COLUMN note TO memo")
    val memos = sql("SELECT memo FROM graft.p_ver WHERE id = 3").collect()
    assert(memos.map(_.getString(0)).toSeq === Seq("n3"))
    // id history is now load-bearing: downgrade is refused
    val soErr = intercept[Exception] {
      sql("CALL graft.upgrade_or_downgrade('p_ver', 1)") }
    assert(soErr.getMessage.contains("schema.on.read"))
    sql("ALTER TABLE graft.p_ver UNSET TBLPROPERTIES ('graft.schema.on.read')")
    val down = intercept[Exception] {
      sql("CALL graft.upgrade_or_downgrade('p_ver', 1)") }
    assert(down.getMessage.contains("renamed"))
    // a no-rename v2 table downgrades cleanly and stays readable
    freshMor("p_ver2", rows = 5)
    sql("INSERT INTO graft.p_ver2 VALUES (9L, 'F', 90.0, 'n9')")
    val d2 = sql("CALL graft.upgrade_or_downgrade('p_ver2', 1)").collect()
    assert(d2(0).getInt(0) === 2 && d2(0).getInt(1) === 1)
    assert(sql("SELECT count(*) AS c FROM graft.p_ver2")
      .collect()(0).getLong(0) === 6)
    // idempotent: migrating to the current version is a no-op
    val same = sql("CALL graft.upgrade_or_downgrade('p_ver2', 1)").collect()
    assert(same(0).getInt(0) === 1)
    // writes at v1 commit id-less epochs; upgrading back restores ids
    sql("INSERT INTO graft.p_ver2 VALUES (10L, 'O', 100.0, 'n10')")
    sql("CALL graft.upgrade_or_downgrade('p_ver2', 2)")
    sql("ALTER TABLE graft.p_ver2 SET TBLPROPERTIES ('graft.schema.on.read' = 'true')")
    sql("ALTER TABLE graft.p_ver2 RENAME COLUMN note TO memo")
    assert(sql("SELECT memo FROM graft.p_ver2 WHERE id = 10")
      .collect()(0).getString(0) === "n10")
  }

  test("create_metadata_table / init_metadata_table / validate_sync / export_snapshot") {
    freshMor("p_sync", rows = 10)
    // create builds it; a second create is refused; init rebuilds
    sql("CALL graft.create_metadata_table('p_sync')")
    intercept[Exception] { sql("CALL graft.create_metadata_table('p_sync')") }
    sql("INSERT INTO graft.p_sync VALUES (1L, 'F', 999.0, 'upd')")
    assert(sql("CALL graft.validate_metadata_table_files('p_sync')").count() > 0)
    sql("CALL graft.init_metadata_table('p_sync')")
    assert(sql("CALL graft.validate_metadata_table_files('p_sync')").count() === 0)
    // a fresh copy is in sync; divergence shows up per partition
    sql("DROP TABLE IF EXISTS graft.p_sync2")
    sql("CALL graft.copy_to_table('p_sync', 'p_sync2')")
    assert(sql("CALL graft.validate_sync('p_sync', 'p_sync2')").count() === 0)
    sql("INSERT INTO graft.p_sync VALUES (99L, 'F', 1.0, 'new')")
    val diff = sql("CALL graft.validate_sync('p_sync', 'p_sync2')").collect()
    assert(diff.length === 1 && diff(0).getString(0) === "status=F")
    assert(diff(0).getLong(1) === diff(0).getLong(2) + 1)
    // export the snapshot as plain partitioned parquet and read it back raw
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_export_${System.nanoTime()}"
    val exp = sql(s"CALL graft.export_snapshot('p_sync', '$out')").collect()
    assert(exp(0).getLong(0) >= 2) // >= one file per partition
    val back = spark.read.parquet(out)
    assert(back.count() === 11 && back.columns.contains("status"))
    assert(back.columns.forall(!_.startsWith("_graft")))
    intercept[Exception] { // refuses overwrite
      sql(s"CALL graft.export_snapshot('p_sync', '$out')") }
    intercept[Exception] { // unknown format
      sql(s"CALL graft.export_snapshot('p_sync', '${out}_x', 'csvish')") }
  }

  test("show_metrics: per-commit duration/files/rows/bytes from the timeline") {
    sql("DROP TABLE IF EXISTS graft.p_metrics")
    sql("""CREATE TABLE graft.p_metrics (id BIGINT, v STRING) USING graft
      |TBLPROPERTIES ('graft.recordkey.field' = 'id',
      |  'graft.precombine.field' = 'v')""".stripMargin)
    sql("INSERT INTO graft.p_metrics VALUES (1L, 'a'), (2L, 'b')")
    sql("INSERT INTO graft.p_metrics VALUES (3L, 'c')")
    val rows = sql("CALL graft.show_metrics(`table` => 'p_metrics')").collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getString(1) === "commit")
      assert(r.getLong(3) > 0, "durationMs missing from commit metadata")
      assert(r.getLong(4) >= 1 && r.getLong(6) > 0, "files/bytes missing")
    }
    // physical rows: commit 2 bin-packs into the existing group, rewriting
    // its 2 rows alongside the 1 new -> 2 + 3 (write amplification shows)
    assert(rows.map(_.getLong(5)).sum === 5, "rows_written mismatch")
    assert(rows.map(_.getLong(7)).sum === 3, "batch_rows mismatch")
    sql("DROP TABLE graft.p_metrics")
  }

  test("index lifecycle procedures: show_index_drift / reconcile_index / rebuild_index / vacuum_index") {
    import org.apache.spark.sql.functions.col
    val vecs = graft.Tables.embeddings(spark, TestSpark.sf)
      .select("vec_id", "embedding")
    vecs.createOrReplaceTempView("p_emb_src")
    sql("DROP TABLE IF EXISTS graft.p_embcorp")
    sql("""CREATE TABLE graft.p_embcorp (vec_id BIGINT, embedding ARRAY<FLOAT>)
      |USING graft
      |TBLPROPERTIES ('graft.recordkey.field' = 'vec_id')""".stripMargin)
    sql("INSERT INTO graft.p_embcorp SELECT * FROM p_emb_src WHERE vec_id < 400")
    val dir = java.nio.file.Files.createTempDirectory("graft_procidx_").toString
    try {
      graft.pipeline.AnnIndex.buildIvfPq(
        vecs.filter(col("vec_id") < 400), dir, nlist = 16)
      // drift: corpus == training corpus -> ratio at baseline
      val drift = sql(s"CALL graft.show_index_drift(`index_dir` => '$dir', " +
        "`table` => 'p_embcorp')").collect()
      assert(drift.length === 1)
      assert(drift(0).schema.fieldNames.toSeq ===
        Seq("n", "mean_sq_error", "train_mean_sq_error", "ratio"))
      assert(drift(0).getLong(0) === 400)
      assert(math.abs(drift(0).getDouble(3) - 1.0) < 1e-6)
      // the corpus moves ahead of the index; reconcile heals, then no-ops
      sql("INSERT INTO graft.p_embcorp SELECT * FROM p_emb_src WHERE vec_id >= 400")
      val healed = sql(s"CALL graft.reconcile_index(`index_dir` => '$dir', " +
        "`table` => 'p_embcorp', `kind` => 'ivfpq')").collect()
      assert(healed(0).schema.fieldNames.toSeq === Seq("added"))
      assert(healed(0).getLong(0) === 100)
      assert(sql(s"CALL graft.reconcile_index(`index_dir` => '$dir', " +
        "`table` => 'p_embcorp', `kind` => 'ivfpq')").collect()(0)
        .getLong(0) === 0)
      // drift-TRIGGERED rebuild: a healthy index under an absurd threshold
      // does NOT fire (and reports the observed ratio)
      val skipped = sql(s"CALL graft.rebuild_index(`index_dir` => '$dir', " +
        "`table` => 'p_embcorp', `if_ratio_above` => 1000.0)").collect()
      assert(skipped(0).schema.fieldNames.toSeq ===
        Seq("rebuilt", "indexed", "ratio"))
      assert(!skipped(0).getBoolean(0) && skipped(0).getLong(1) === 0)
      assert(skipped(0).getDouble(2) > 0)
      // unconditional rebuild retrains on the full corpus, resets baseline
      val rebuilt = sql(s"CALL graft.rebuild_index(`index_dir` => '$dir', " +
        "`table` => 'p_embcorp')").collect()
      assert(rebuilt(0).getBoolean(0) && rebuilt(0).getLong(1) === 500)
      val drift2 = sql(s"CALL graft.show_index_drift(`index_dir` => '$dir', " +
        "`table` => 'p_embcorp')").collect()
      assert(drift2(0).getLong(0) === 500)
      assert(math.abs(drift2(0).getDouble(3) - 1.0) < 1e-6,
        "rebuild must reset the drift baseline")
      // version inventory: the superseded root set + the live v1
      val vers = sql(s"CALL graft.show_index_versions(`index_dir` => '$dir')")
        .collect()
      assert(vers(0).schema.fieldNames.toSeq ===
        Seq("version", "live", "complete", "bytes"))
      assert(vers.map(r => (r.getString(0), r.getBoolean(1),
        r.getBoolean(2))).toSeq ===
        Seq(("root", false, true), ("v1", true, true)))
      assert(vers.forall(_.getLong(3) > 0), "every version holds bytes")
      // vacuum reclaims the superseded pre-rebuild table set
      val vac = sql(s"CALL graft.vacuum_index(`index_dir` => '$dir')").collect()
      assert(vac(0).schema.fieldNames.toSeq === Seq("dropped"))
      assert(vac(0).getInt(0) === 1)
      assert(sql(s"CALL graft.vacuum_index(`index_dir` => '$dir')")
        .collect()(0).getInt(0) === 0)
      // post-vacuum inventory: only the live version remains
      assert(sql(s"CALL graft.show_index_versions(`index_dir` => '$dir')")
        .collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq ===
        Seq(("v1", true)))
      // unknown kind is an actionable error
      val err = intercept[Exception] {
        sql(s"CALL graft.reconcile_index(`index_dir` => '$dir', " +
          "`table` => 'p_embcorp', `kind` => 'btree')") }
      val messages = Iterator.iterate(err: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString("\n")
      assert(messages.contains("unknown index kind"))
    } finally {
      graft.table.GraftTable.drop(dir)
      sql("DROP TABLE IF EXISTS graft.p_embcorp")
    }
  }

  test("index lifecycle procedures for the train-free kinds: occupancy drift, guarded rebuild, vacuum") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text")
    docs.createOrReplaceTempView("p_doc_src2")
    sql("DROP TABLE IF EXISTS graft.p_mhcorp")
    sql("""CREATE TABLE graft.p_mhcorp (doc_id BIGINT, text STRING)
      |USING graft
      |TBLPROPERTIES ('graft.recordkey.field' = 'doc_id')""".stripMargin)
    sql("INSERT INTO graft.p_mhcorp SELECT * FROM p_doc_src2 WHERE doc_id < 200")
    val dir = java.nio.file.Files.createTempDirectory("graft_procmh2_").toString
    val dirL = java.nio.file.Files.createTempDirectory("graft_proclsh_").toString
    try {
      graft.pipeline.MinhashIndex.build(
        docs.filter(col("doc_id") < 200), dir)
      // occupancy drift: fresh index reads ratio 1 under the kind-matched
      // statistic (table unused for the train-free kinds)
      val occ = sql(s"CALL graft.show_index_drift(`index_dir` => '$dir', " +
        "`kind` => 'minhash')").collect()
      assert(occ(0).schema.fieldNames.toSeq ===
        Seq("buckets", "mean", "p99", "max", "build_p99", "ratio"))
      assert(occ(0).getLong(0) > 0)
      assert(math.abs(occ(0).getDouble(5) - 1.0) < 1e-9)
      // guarded rebuild under an absurd threshold does NOT fire
      val skipped = sql(s"CALL graft.rebuild_index(`index_dir` => '$dir', " +
        "`table` => 'p_mhcorp', `kind` => 'minhash', " +
        "`if_ratio_above` => 1000.0)").collect()
      assert(!skipped(0).getBoolean(0) && skipped(0).getLong(1) === 0)
      assert(math.abs(skipped(0).getDouble(2) - 1.0) < 1e-9)
      // unconditional rebuild with NEW banding; vacuum reclaims the root set
      val rebuilt = sql(s"CALL graft.rebuild_index(`index_dir` => '$dir', " +
        "`table` => 'p_mhcorp', `kind` => 'minhash', `num_hashes` => 64)")
        .collect()
      assert(rebuilt(0).getBoolean(0))
      assert(rebuilt(0).getLong(1) ===
        docs.filter(col("doc_id") < 200).count() * 8)
      assert(sql(s"CALL graft.vacuum_index(`index_dir` => '$dir', " +
        "`kind` => 'minhash')").collect()(0).getInt(0) === 1)
      // the lsh kind reads its own occupancy statistic
      graft.pipeline.AnnIndex.buildLsh(
        graft.Tables.embeddings(spark, TestSpark.sf)
          .select("vec_id", "embedding"), dirL, planes = 4, tables = 8)
      val occL = sql(s"CALL graft.show_index_drift(`index_dir` => '$dirL', " +
        "`kind` => 'lsh')").collect()
      assert(math.abs(occL(0).getDouble(5) - 1.0) < 1e-9)
      assert(sql(s"CALL graft.vacuum_index(`index_dir` => '$dirL', " +
        "`kind` => 'lsh')").collect()(0).getInt(0) === 0)
      // unknown kind is an actionable error on every surface
      val err = intercept[Exception] {
        sql(s"CALL graft.show_index_drift(`index_dir` => '$dir', " +
          "`kind` => 'btree')") }
      val messages = Iterator.iterate(err: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString("\n")
      assert(messages.contains("unknown index kind"))
    } finally {
      graft.table.GraftTable.drop(dir)
      graft.table.GraftTable.drop(dirL)
      sql("DROP TABLE IF EXISTS graft.p_mhcorp")
    }
  }

  test("reconcile_index kind => minhash heals a documents corpus") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text")
    docs.createOrReplaceTempView("p_doc_src")
    sql("DROP TABLE IF EXISTS graft.p_doccorp")
    sql("""CREATE TABLE graft.p_doccorp (doc_id BIGINT, text STRING)
      |USING graft
      |TBLPROPERTIES ('graft.recordkey.field' = 'doc_id')""".stripMargin)
    sql("INSERT INTO graft.p_doccorp SELECT * FROM p_doc_src WHERE doc_id < 160")
    val dir = java.nio.file.Files.createTempDirectory("graft_procmh_").toString
    try {
      graft.pipeline.MinhashIndex.build(
        docs.filter(col("doc_id") < 150), dir)
      val healed = sql(s"CALL graft.reconcile_index(`index_dir` => '$dir', " +
        "`table` => 'p_doccorp', `kind` => 'minhash')").collect()
      assert(healed(0).getLong(0) === 10)
      assert(sql(s"CALL graft.reconcile_index(`index_dir` => '$dir', " +
        "`table` => 'p_doccorp', `kind` => 'minhash')").collect()(0)
        .getLong(0) === 0)
    } finally {
      graft.table.GraftTable.drop(dir)
      sql("DROP TABLE IF EXISTS graft.p_doccorp")
    }
  }

  test("unknown procedure fails with the known-procedure list") {
    val err = intercept[Exception] { sql("CALL graft.run_nonsense('t')") }
    // Spark wraps loadProcedure failures in FAILED_TO_LOAD_ROUTINE; the
    // actionable list rides in the cause
    val messages = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    assert(messages.contains("FAILED_TO_LOAD_ROUTINE"))
    assert(messages.contains("undefined procedure") &&
      messages.contains("run_compaction"))
  }
}
