package graft.catalog

import java.nio.file.Files
import graft.TestSpark
import graft.table._
import org.scalatest.funsuite.AnyFunSuite

/** Metastore-sync re-expression: path-based tables registered into the
  * engine's catalog (ref: hudi-sync HiveSyncTool — db auto-create, MOR
  * _ro/_rt dual naming, idempotent re-sync). */
class CatalogSyncSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_catsync_").toString

  test("MOR sync registers _rt (merged) and _ro (base-only) names") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("sync_mor", MergeOnRead,
      keyFields = Seq("id")))
    t.bulkInsert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.upsert(Seq((2L, "B2"), (3L, "c")).toDF("id", "v")) // log-only delta

    val names = CatalogSync.sync(spark, dir, "lakedb")
    assert(names === Seq("graft.lakedb.sync_mor_rt", "graft.lakedb.sync_mor_ro"))

    // _rt = snapshot (log merged); _ro = base files only — the UPDATE to
    // id 2 lives in a log file and is invisible, and id 3's INSERT
    // bin-packed into the under-sized group's LOG (round-13 MOR small-file
    // packing), so it is invisible too until compaction — the reference's
    // RO semantics with a log-indexing-capable index (canIndexLogFiles)
    val rt = spark.table("graft.lakedb.sync_mor_rt")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rt === Set((1L, "a"), (2L, "B2"), (3L, "c")))
    val ro = spark.table("graft.lakedb.sync_mor_ro")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ro === Set((1L, "a"), (2L, "b")))

    // after compaction the RO view catches up — same registration
    t.compact()
    val ro2 = spark.table("graft.lakedb.sync_mor_ro")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ro2 === rt)

    // writes through the read-optimized view are rejected
    val e = intercept[Exception](
      spark.sql("DELETE FROM graft.lakedb.sync_mor_ro WHERE id = 1"))
    assert(e.getMessage.contains("read-optimized"))

    // re-sync is idempotent
    assert(CatalogSync.sync(spark, dir, "lakedb") === names)
    GraftTable.drop(dir)
  }

  test("COW sync registers one snapshot name; SQL DML works through it") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("sync_cow", CopyOnWrite,
      keyFields = Seq("id")))
    t.bulkInsert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))

    assert(CatalogSync.sync(spark, dir, "lakedb") ===
      Seq("graft.lakedb.sync_cow"))
    spark.sql("UPDATE graft.lakedb.sync_cow SET v = 'A' WHERE id = 1")
    assert(spark.table("graft.lakedb.sync_cow")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "A"), (2L, "b")))
    // name override + CALL surface
    val called = spark.sql(
      s"CALL graft.sync_catalog(path => '$dir', db => 'lakedb', table => 'cow2')")
      .collect().map(_.getString(0))
    assert(called === Array("graft.lakedb.cow2"))
    assert(spark.table("graft.lakedb.cow2").count() === 2)
    GraftTable.drop(dir)
  }

  test("DROP TABLE on a synced (link) identifier unregisters without deleting data") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("sync_drop", MergeOnRead,
      keyFields = Seq("id")))
    t.bulkInsert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val names = CatalogSync.sync(spark, dir, "lakedb")
    assert(names === Seq("graft.lakedb.sync_drop_rt", "graft.lakedb.sync_drop_ro"))
    // dropping the _ro registration must NOT delete the shared base path:
    // _rt and path-based reads keep working
    spark.sql("DROP TABLE graft.lakedb.sync_drop_ro")
    assert(GraftTable.exists(dir))
    assert(spark.table("graft.lakedb.sync_drop_rt").count() === 2)
    assert(spark.read.format("graft").load(dir).count() === 2)
    // dropping the remaining registration also keeps the data
    spark.sql("DROP TABLE graft.lakedb.sync_drop_rt")
    assert(GraftTable.exists(dir))
    assert(spark.read.format("graft").load(dir).count() === 2)
    GraftTable.drop(dir)
  }

  test("read-optimized view rejects every mutation entry point") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("sync_guard", MergeOnRead,
      keyFields = Seq("id"), partitioning = PartitionByColumns(Seq("p"))))
    t.bulkInsert(Seq((1L, "x", "a"), (2L, "y", "b")).toDF("id", "v", "p"))
    CatalogSync.sync(spark, dir, "lakedb")
    def rejected(sqlText: String): Unit = {
      val e = intercept[Exception](spark.sql(sqlText))
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString("; ")
      assert(msgs.contains("read-optimized"), s"$sqlText → $msgs")
    }
    rejected("TRUNCATE TABLE graft.lakedb.sync_guard_ro")
    rejected("ALTER TABLE graft.lakedb.sync_guard_ro DROP PARTITION (p = 'a')")
    rejected("CREATE INDEX ro_idx ON graft.lakedb.sync_guard_ro (id)")
    rejected("DROP INDEX ro_idx ON graft.lakedb.sync_guard_ro")
    // the base table is untouched by all of the above
    assert(spark.table("graft.lakedb.sync_guard_rt").count() === 2)
    // the _rt identifier accepts the same operations
    spark.sql("TRUNCATE TABLE graft.lakedb.sync_guard_rt")
    assert(spark.table("graft.lakedb.sync_guard_rt").count() === 0)
    spark.sql("DROP TABLE graft.lakedb.sync_guard_rt")
    spark.sql("DROP TABLE graft.lakedb.sync_guard_ro")
    GraftTable.drop(dir)
  }

  test("sync refuses to shadow a warehouse-resident table") {
    val dir = tmp()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.shadowdb")
    spark.sql("DROP TABLE IF EXISTS graft.shadowdb.victim")
    spark.sql("CREATE TABLE graft.shadowdb.victim (id BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('graft.recordkey.field' = 'id')")
    spark.sql("INSERT INTO graft.shadowdb.victim VALUES (1, 'x')")
    val t = GraftTable.create(spark, dir, TableConfig("victim", CopyOnWrite,
      keyFields = Seq("id")))
    t.bulkInsert(Seq((9L, "z")).toDF("id", "v"))
    val e = intercept[Exception](CatalogSync.sync(spark, dir, "shadowdb"))
    assert(e.getMessage.contains("warehouse-resident"))
    // the existing table is untouched
    assert(spark.table("graft.shadowdb.victim").count() === 1)
    spark.sql("DROP TABLE graft.shadowdb.victim")
    GraftTable.drop(dir)
  }
}
