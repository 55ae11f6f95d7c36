package graft.table

import java.nio.file.{Files, Paths}

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** validate_data_table (ref: HoodieDataTableValidator): storage-vs-timeline
  * accounting diffs. */
class DataTableValidatorSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def fresh(name: String): (GraftTable, String) = {
    val dir = Files.createTempDirectory(s"graft_dtv_$name").toString
    val t = GraftTable.create(spark, dir, TableConfig(name, MergeOnRead,
      keyFields = Seq("id"), precombineField = Some("ver"),
      partitioning = PartitionByColumns(Seq("part"))))
    t.upsert((1 to 20).map(i => (i.toLong, s"p${i % 3}", i.toLong))
      .toDF("id", "part", "ver"))
    t.upsert(Seq((1L, "p1", 99L), (2L, "p2", 99L)).toDF("id", "part", "ver"))
    (t, dir)
  }

  test("clean table: no discrepancies; MOR logs and sidecars accounted") {
    val (t, dir) = fresh("ok")
    assert(GraftSql.validateDataTable(t).count() === 0)
    GraftTable.drop(dir)
  }

  test("planted orphan -> dangling; removed base file -> missing") {
    val (t, dir) = fresh("bad")
    // an orphan with a COMPLETED-looking name (i.e. not claimed by any
    // inflight instant) in a real partition dir
    val part = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(Paths.get(dir))
      try s.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString != ".graft").toSeq.minBy(_.toString)
      finally s.close()
    }
    val orphan = part.resolve("deadbeef_19990101000000000.parquet")
    Files.write(orphan, Array[Byte](1, 2, 3))
    // remove one committed base file
    val victim = t.slices(None).head.baseFiles.head.path
    Files.delete(Paths.get(dir, victim))
    val diff = GraftSql.validateDataTable(t).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(diff.values.toSet === Set("dangling", "missing"))
    assert(diff.exists { case (p, k) =>
      k == "dangling" && p.endsWith("deadbeef_19990101000000000.parquet") })
    assert(diff.get(victim).contains("missing"))
    GraftTable.drop(dir)
  }

  test("a live writer's in-flight files are neither dangling nor missing") {
    val (t, dir) = fresh("inflight")
    val instant = t.timeline.startInstant("commit")
    val part = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(Paths.get(dir))
      try s.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString != ".graft").toSeq.minBy(_.toString)
      finally s.close()
    }
    Files.write(part.resolve(s"wip_$instant.parquet"), Array[Byte](9))
    assert(GraftSql.validateDataTable(t).count() === 0)
    GraftTable.drop(dir)
  }

  test("CALL surface returns the (path, issue) schema") {
    spark.sql("DROP TABLE IF EXISTS graft.dtv_call")
    spark.sql("""CREATE TABLE graft.dtv_call (id BIGINT, v DOUBLE)
                |USING graft
                |TBLPROPERTIES ('graft.recordkey.field' = 'id',
                |  'graft.precombine.field' = 'v')""".stripMargin)
    spark.sql("INSERT INTO graft.dtv_call VALUES (1L, 1.0), (2L, 2.0)")
    val rows = spark.sql("CALL graft.validate_data_table('dtv_call')")
    assert(rows.schema.fieldNames.toSeq === Seq("path", "issue"))
    assert(rows.count() === 0)
  }
}
