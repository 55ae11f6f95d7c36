package graft.table

import java.nio.file.Files
import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ORC base files (ref: HoodieOrcWriter.java:51, hoodie.table.base.file
  * .format): the whole engine — staged writes, tagging, MOR merge,
  * compaction, time travel, commit-time stats — over ORC instead of
  * parquet. Stats come from the ORC file tail ([[OrcFooterStats]]); blooms
  * arrive only via CREATE INDEX backfill (no while-writing sidecar). */
class OrcTableSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def tmp(): String = Files.createTempDirectory("graft_orc_").toString
  private def orders: DataFrame = Tables.orders(spark, sf)

  private def orcTable(tableType: TableType, dir: String): GraftTable =
    GraftTable.create(spark, dir, TableConfig("orc_t", tableType,
      keyFields = Seq("o_orderkey"), precombineField = Some("o_totalprice"),
      partitioning = PartitionByColumns(Seq("o_orderstatus")),
      targetFileSizeRows = 400, baseFileFormat = "orc"))

  test("COW lifecycle on orc: write, stats, upsert, delete, time travel") {
    val dir = tmp()
    val t = orcTable(CopyOnWrite, dir)
    val first = t.bulkInsert(orders)
    // files ARE orc, and commit-time key stats came from the orc tail
    val bases = t.slices(None).flatMap(_.baseFiles)
    assert(bases.nonEmpty && bases.forall(_.path.endsWith(".orc")))
    assert(bases.forall(f => f.keyMin.nonEmpty && f.keyMax.nonEmpty && f.rows > 0))
    assert(t.snapshot().count() === orders.count())
    // tagging upsert + delete work off orc scans
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderpriority", lit("ORCUP"))
    t.upsert(updates)
    assert(t.snapshot().filter(col("o_orderpriority") === "ORCUP").count()
      === updates.count())
    assert(t.snapshot().count() === orders.count())
    t.delete(orders.filter(col("o_orderkey") % 13 === 0))
    assert(t.snapshot().filter(col("o_orderkey") % 13 === 0).count() === 0)
    // time travel reads the superseded orc files
    assert(t.snapshot(Some(first)).count() === orders.count())
    GraftTable.drop(dir)
  }

  test("MOR on orc: logs, snapshot merge, read-optimized, compaction") {
    val dir = tmp()
    val t = orcTable(MergeOnRead, dir)
    t.bulkInsert(orders)
    val updates = orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderpriority", lit("MORC"))
    t.upsert(updates)
    val logs = t.slices(None).flatMap(_.logs.map(_._2))
    assert(logs.nonEmpty && logs.forall(_.path.endsWith(".orc")))
    assert(t.snapshot().filter(col("o_orderpriority") === "MORC").count()
      === updates.count())
    assert(t.readOptimized().filter(col("o_orderpriority") === "MORC").count() === 0)
    val Some(_) = t.compact(): @unchecked
    assert(t.slices(None).forall(_.logs.isEmpty))
    assert(t.readOptimized().filter(col("o_orderpriority") === "MORC").count()
      === updates.count())
    GraftTable.drop(dir)
  }

  test("incremental + CREATE INDEX bloom backfill work over orc files") {
    val dir = tmp()
    val t = orcTable(CopyOnWrite, dir)
    val first = t.bulkInsert(orders.filter(col("o_orderkey") % 2 === 0))
    t.insert(orders.filter(col("o_orderkey") % 2 === 1))
    val inc = t.incremental(first)
    assert(inc.count() === orders.filter(col("o_orderkey") % 2 === 1).count())
    // backfilled bloom sidecars load and prune like the parquet ones
    t.createBloomIndex()
    val withSidecars = t.slices(None).flatMap(_.baseFiles)
      .filter(f => Files.isRegularFile(
        java.nio.file.Paths.get(dir, KeyBloom.sidecar(f.path))))
    assert(withSidecars.nonEmpty)
    assert(withSidecars.forall(f => KeyBloom.load(dir, f.path).nonEmpty))
    GraftTable.drop(dir)
  }

  test("SQL surface: orc table via TBLPROPERTIES, DML round trip") {
    def sql(q: String) = spark.sql(q)
    sql("DROP TABLE IF EXISTS graft.p_orc")
    sql("""CREATE TABLE graft.p_orc (id BIGINT, v STRING, price DOUBLE)
          |USING graft
          |TBLPROPERTIES (
          |  'graft.recordkey.field' = 'id',
          |  'graft.precombine.field' = 'price',
          |  'graft.base.file.format' = 'orc')""".stripMargin)
    sql("INSERT INTO graft.p_orc VALUES (1L, 'a', 1.0), (2L, 'b', 2.0)")
    sql("UPDATE graft.p_orc SET v = 'z' WHERE id = 2")
    assert(sql("SELECT v FROM graft.p_orc WHERE id = 2").collect()(0).getString(0) === "z")
    val props = sql("SHOW TBLPROPERTIES graft.p_orc").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.base.file.format").contains("orc"))
    sql("DROP TABLE graft.p_orc")
  }
}
