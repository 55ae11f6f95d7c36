package graft.table

import java.nio.file.Files
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pre-commit validators: SQL data-quality gates over the before/after
  * table states; a failed gate rejects the commit and leaves the table
  * untouched (ref: hudi SparkPreCommitValidator family). */
class PreCommitSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def mkTable(): (GraftTable, String) = {
    val dir = Files.createTempDirectory("graft_precommit_").toString
    val t = GraftTable.create(spark, dir, TableConfig("pc", CopyOnWrite,
      keyFields = Seq("id"), precombineField = Some("v"),
      partitioning = PartitionByColumns(Seq("p")), targetFileSizeRows = 100))
    t.bulkInsert(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)).toDF("id", "p", "v"))
    (t, dir)
  }

  test("SqlQuerySingleResult accepts a conforming write and rejects a violating one") {
    val (t, dir) = mkTable()
    // gate: no negative values may ever land
    t.preCommitValidators = Seq(SqlQuerySingleResult(
      "SELECT count(*) FROM <TABLE_NAME> WHERE v < 0", "0"))
    t.upsert(Seq((4L, "b", 4.0)).toDF("id", "p", "v"))
    assert(t.snapshot().count() === 4)
    val commitsBefore = t.timeline.completed().size
    val err = intercept[ValidationException] {
      t.upsert(Seq((5L, "b", -5.0)).toDF("id", "p", "v"))
    }
    assert(err.getMessage.contains("got '1', expected '0'"))
    // rejected: no new commit, no new row, table still readable + writable
    assert(t.timeline.completed().size === commitsBefore)
    assert(t.snapshot().count() === 4)
    t.upsert(Seq((5L, "b", 5.0)).toDF("id", "p", "v"))
    assert(t.snapshot().count() === 5)
    GraftTable.drop(dir)
  }

  test("SqlQueryEquality preserves an invariant; violating write is rejected") {
    val (t, dir) = mkTable()
    t.preCommitValidators = Seq(SqlQueryEquality(
      "SELECT count(DISTINCT p) FROM <TABLE_NAME>"))
    // same partitions → equal result → accepted
    t.upsert(Seq((1L, "a", 10.0)).toDF("id", "p", "v"))
    assert(t.snapshot().filter(col("id") === 1).select("v").collect()(0).getDouble(0) === 10.0)
    // a brand-new partition changes the distinct count → rejected
    intercept[ValidationException] {
      t.upsert(Seq((9L, "NEW", 9.0)).toDF("id", "p", "v"))
    }
    assert(t.snapshot().filter(col("p") === "NEW").count() === 0)
    GraftTable.drop(dir)
  }

  test("SqlQueryInequality requires the write to change the queried state") {
    val (t, dir) = mkTable()
    t.preCommitValidators = Seq(SqlQueryInequality(
      "SELECT sum(v) FROM <TABLE_NAME>"))
    t.upsert(Seq((1L, "a", 100.0)).toDF("id", "p", "v")) // sum changes → ok
    // re-upserting the identical row leaves sum unchanged → rejected
    intercept[ValidationException] {
      t.upsert(Seq((1L, "a", 100.0)).toDF("id", "p", "v"))
    }
    GraftTable.drop(dir)
  }

  test("validators skip compaction (layout-preserving service)") {
    val dir = Files.createTempDirectory("graft_precommit_mor_").toString
    val t = GraftTable.create(spark, dir, TableConfig("pcm", MergeOnRead,
      keyFields = Seq("id"), precombineField = Some("v"),
      partitioning = PartitionByColumns(Seq("p")), targetFileSizeRows = 100))
    t.bulkInsert(Seq((1L, "a", 1.0), (2L, "a", 2.0)).toDF("id", "p", "v"))
    t.upsert(Seq((1L, "a", 5.0)).toDF("id", "p", "v")) // log file
    // an inequality gate would reject any no-op — compaction must bypass it
    t.preCommitValidators = Seq(SqlQueryInequality("SELECT sum(v) FROM <TABLE_NAME>"))
    assert(t.compact().nonEmpty)
    assert(t.readOptimized().filter(col("id") === 1)
      .select("v").collect()(0).getDouble(0) === 5.0)
    GraftTable.drop(dir)
  }
}
