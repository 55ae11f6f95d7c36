package graft.table

import java.nio.file.Files
import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Virtual keys (ref: HoodieTableConfig.java:178 POPULATE_META_FIELDS):
  * append-only tables that never materialize the `_g_*` meta columns —
  * five columns fewer per row on disk, a real storage win at PB scale.
  * Key and partition derive from the configured expressions on read; the
  * commit instant derives from the file name. Tagging ops are rejected. */
class VirtualKeysSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def tmp(): String = Files.createTempDirectory("graft_vk_").toString
  private def orders: DataFrame = Tables.orders(spark, sf)

  private def vkTable(dir: String): GraftTable =
    GraftTable.create(spark, dir, TableConfig("vk_t", CopyOnWrite,
      keyFields = Seq("o_orderkey"), precombineField = Some("o_totalprice"),
      partitioning = PartitionByColumns(Seq("o_orderstatus")),
      targetFileSizeRows = 400, populateMetaFields = false))

  test("bulk_insert + snapshot round trip with meta fields off; files are meta-free") {
    val dir = tmp()
    val t = vkTable(dir)
    t.bulkInsert(orders)
    // the written parquet files carry ONLY data columns
    val dataFile = t.slices(None).head.baseFiles.head.path
    val fileCols = spark.read.parquet(s"$dir/$dataFile").columns.toSet
    assert(fileCols.intersect(Set("_g_key", "_g_part", "_g_commit",
      "_g_file_id", "_g_deleted")).isEmpty, s"meta columns leaked: $fileCols")
    assert(fileCols.contains("o_orderkey"))
    // snapshot round trip: same rows, no meta columns exposed
    val snap = t.snapshot()
    assert(!snap.columns.exists(_.startsWith("_g_")))
    assert(snap.count() === orders.count())
    assert(snap.agg(sum("o_orderkey")).collect()(0).getLong(0) ===
      orders.agg(sum("o_orderkey")).collect()(0).getLong(0))
    GraftTable.drop(dir)
  }

  test("appends work; incremental derives correct commit instants from file names") {
    val dir = tmp()
    val t = vkTable(dir)
    val (oldHalf, newHalf) = (orders.filter(col("o_orderkey") % 2 === 0),
      orders.filter(col("o_orderkey") % 2 === 1))
    val first = t.bulkInsert(oldHalf)
    t.insert(newHalf)
    assert(t.snapshot().count() === orders.count())
    // incremental after the first commit sees exactly the second batch —
    // its per-row commit instants come from the FILE NAMES, not columns
    val inc = t.incremental(first)
    assert(inc.count() === newHalf.count())
    assert(inc.filter(col("o_orderkey") % 2 === 0).count() === 0)
    // time travel to the first commit sees only the first batch
    assert(t.snapshot(Some(first)).count() === oldHalf.count())
    GraftTable.drop(dir)
  }

  test("partition-level ops work; tagging ops and clustering are rejected") {
    val dir = tmp()
    val t = vkTable(dir)
    t.bulkInsert(orders)
    // partition-level delete needs no row meta
    t.deletePartitions(Seq("o_orderstatus=F"))
    assert(t.snapshot().filter(col("o_orderstatus") === "F").count() === 0)
    // insert_overwrite replaces a partition wholesale
    val replacement = orders.filter(col("o_orderstatus") === "O").limit(10)
    t.insertOverwrite(replacement)
    assert(t.snapshot().filter(col("o_orderstatus") === "O").count() === 10)
    // record-level ops need materialized meta fields
    for (bad <- Seq(
        () => t.upsert(orders.limit(1)),
        () => t.delete(orders.limit(1)),
        () => t.cluster(Seq("o_orderkey")))) {
      val e = intercept[IllegalArgumentException](bad())
      assert(e.getMessage.contains("meta fields") ||
        e.getMessage.contains("virtual-key"), e.getMessage)
    }
    GraftTable.drop(dir)
  }

  test("virtual keys require copy-on-write; config round-trips through load") {
    val dir = tmp()
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, dir, TableConfig("vk_bad", MergeOnRead,
        keyFields = Seq("o_orderkey"), populateMetaFields = false))
    }
    val t = vkTable(dir)
    assert(!GraftTable.load(spark, dir).config.populateMetaFields)
    GraftTable.drop(dir)
  }
}
