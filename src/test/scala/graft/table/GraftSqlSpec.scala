package graft.table

import java.nio.file.Files
import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftSqlSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def freshTable(): (GraftTable, String) = {
    val dir = Files.createTempDirectory("graft_sql_").toString
    val t = GraftTable.create(spark, dir, TableConfig("o", CopyOnWrite,
      Seq("o_orderkey"), Some("o_totalprice"),
      PartitionByColumns(Seq("o_orderstatus"))))
    t.bulkInsert(Tables.orders(spark, sf))
    (t, dir)
  }

  test("UPDATE ... SET ... WHERE routes through upsert") {
    val (t, dir) = freshTable()
    GraftSql.update(t,
      Map("o_orderpriority" -> lit("9-RUSH"),
          "o_totalprice" -> (col("o_totalprice") * 2)),
      where = col("o_orderkey") % 25 === 0)
    val snap = t.snapshot()
    val hit = snap.filter(col("o_orderkey") % 25 === 0)
    assert(hit.filter(col("o_orderpriority") =!= "9-RUSH").count() === 0)
    assert(snap.filter(col("o_orderkey") % 25 =!= 0 &&
      col("o_orderpriority") === "9-RUSH").count() === 0)
    assert(snap.count() === Tables.orders(spark, sf).count())
    GraftTable.drop(dir)
  }

  test("DELETE WHERE routes through delete") {
    val (t, dir) = freshTable()
    GraftSql.deleteWhere(t, col("o_totalprice") < 100000)
    val snap = t.snapshot()
    assert(snap.filter(col("o_totalprice") < 100000).count() === 0)
    assert(snap.count() ===
      Tables.orders(spark, sf).filter(col("o_totalprice") >= 100000).count())
    GraftTable.drop(dir)
  }

  test("CTAS materializes a query as a new table") {
    val dir = Files.createTempDirectory("graft_ctas_").toString
    val q = Tables.orders(spark, sf).filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val t = GraftSql.createTableAsSelect(spark, dir,
      TableConfig("ctas", CopyOnWrite, Seq("o_orderkey")), q)
    assert(t.snapshot().count() === q.count())
    GraftTable.drop(dir)
  }

  test("savepoints listing and commits compare") {
    val (t, dir) = freshTable()
    t.savepoint()
    assert(GraftSql.showSavepoints(t).count() === 1)
    val (t2, dir2) = freshTable()
    val diff = GraftSql.commitsCompare(t, t2)
    assert(diff.count() > 0) // different instants on each side
    GraftTable.drop(dir); GraftTable.drop(dir2)
  }
}
