package graft.table

import java.nio.file.Files
import graft.TestSpark
import org.apache.spark.sql.execution.{ExplainMode, FileSourceScanExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** drop.partition.columns (ref: hoodie.datasource.write.drop.partition
  * .columns): the value lives only in the directory path; the fast read
  * serves it as a REAL relation partition column (plan-time pruning), the
  * conforming readers derive it from the materialized partition path. */
class DropPartitionColsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_dropcols_").toString

  private def rows = Seq(
    (1L, "A", 10L), (2L, "B", 20L), (3L, "A", 30L), (4L, null, 40L))
    .toDF("id", "grp", "v")

  private def write(dir: String, df: org.apache.spark.sql.DataFrame,
      op: String = "upsert"): Unit =
    df.write.format("graft")
      .option("graft.recordkey.field", "id")
      .option("graft.precombine.field", "v")
      .option("graft.partitionpath.field", "grp")
      .option("graft.drop.partition.columns", "true")
      .option("graft.operation", op)
      .mode("append").save(dir)

  test("files carry no partition column; reads restore typed values incl. null sentinel") {
    val dir = tmp()
    write(dir, rows, op = "bulk_insert")
    // physical files must NOT contain grp
    val t = GraftTable.load(spark, dir)
    val aFile = t.slices(None).head.baseFiles.head.path
    val physical = spark.read.parquet(s"$dir/$aFile").schema.fieldNames
    assert(!physical.contains("grp"), s"grp leaked into the file: ${physical.mkString(",")}")
    // format door read: full round trip with typed values
    val back = spark.read.format("graft").load(dir)
    assert(back.count() === 4)
    val got = back.select("id", "grp").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === Map(1L -> Some("A"), 2L -> Some("B"), 3L -> Some("A"), 4L -> None))
    GraftTable.drop(dir)
  }

  test("partition columns declared out of schema order parse correctly on the fast path") {
    val dir = tmp()
    // schema order (a, b, ...) but partitioning declares (b, a): path
    // segments follow the PARTITIONING order — the fast path must parse
    // them positionally against that order, not schema order
    Seq((1L, "x1", 7, 100L), (2L, "x2", 8, 200L)).toDF("a", "b", "n", "v")
      .write.format("graft")
      .option("graft.recordkey.field", "n")
      .option("graft.precombine.field", "v")
      .option("graft.partitionpath.field", "b,a")
      .option("graft.drop.partition.columns", "true")
      .option("graft.operation", "bulk_insert")
      .mode("append").save(dir)
    val back = spark.read.format("graft").load(dir)
    val got = back.select("n", "a", "b").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set((7, 1L, "x1"), (8, 2L, "x2")),
      s"fast-path partition parse corrupted values: $got")
    // and a filter on either partition column still prunes + evaluates right
    assert(back.filter(col("a") === 2L).count() === 1)
    assert(back.filter(col("b") === "x1").count() === 1)
    GraftTable.drop(dir)
  }

  test("SELECT * column order agrees between fast path and conforming fallback") {
    // contract: drop-partition-columns tables surface partition columns
    // LAST (HadoopFsRelation convention); the fallback reorders to match
    val dirCow = tmp()
    write(dirCow, rows, op = "bulk_insert")
    val fastCols = spark.read.format("graft").load(dirCow).columns.toSeq
    GraftTable.drop(dirCow)
    val dirMor = tmp()
    rows.write.format("graft")
      .option("graft.recordkey.field", "id")
      .option("graft.precombine.field", "v")
      .option("graft.partitionpath.field", "grp")
      .option("graft.drop.partition.columns", "true")
      .option("graft.table.type", "mor")
      .option("graft.operation", "bulk_insert")
      .mode("append").save(dirMor)
    // a log append forces the merging fallback
    Seq((1L, "A", 11L)).toDF("id", "grp", "v").write.format("graft")
      .option("graft.recordkey.field", "id")
      .option("graft.precombine.field", "v")
      .option("graft.partitionpath.field", "grp")
      .option("graft.drop.partition.columns", "true")
      .option("graft.table.type", "mor")
      .mode("append").save(dirMor)
    val t = GraftTable.load(spark, dirMor)
    assert(t.fastScanFiles(None, baseOnly = false).isEmpty,
      "MOR with logs should be on the fallback path")
    val fallbackCols = t.snapshot().columns.toSeq
    assert(fallbackCols === fastCols,
      s"column order flips between paths: fast=$fastCols fallback=$fallbackCols")
    GraftTable.drop(dirMor)
  }

  test("fast path: filter on the dropped column is plan-time partition pruning") {
    val dir = tmp()
    write(dir, rows, op = "bulk_insert")
    val q = spark.read.format("graft").load(dir).filter(col("grp") === "A")
    q.collect()
    val scanned = q.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f.metrics("numFiles").value
    }.sum
    val all = spark.read.format("graft").load(dir)
    all.collect()
    val total = all.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f.metrics("numFiles").value
    }.sum
    assert(scanned < total,
      s"partition filter must prune files at plan time ($scanned vs $total)")
    assert(q.count() === 2)
    // and the plan is still a native scan, no Exchange
    val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), p)
    GraftTable.drop(dir)
  }

  test("upsert tagging and snapshot merge still work without the column in files") {
    val dir = tmp()
    write(dir, rows, op = "bulk_insert")
    write(dir, Seq((1L, "A", 99L)).toDF("id", "grp", "v"))
    val t = GraftTable.load(spark, dir)
    val snap = t.snapshot()
    assert(snap.count() === 4)
    assert(snap.filter(col("id") === 1).select("v").as[Long].collect().toSeq === Seq(99L))
    assert(snap.filter(col("id") === 1).select("grp").as[String].collect().toSeq === Seq("A"))
    GraftTable.drop(dir)
  }

  test("MOR logs, compaction and time travel re-derive the column everywhere") {
    val dir = tmp()
    Seq((1L, "A", 1L), (2L, "B", 2L)).toDF("id", "grp", "v")
      .write.format("graft")
      .option("graft.recordkey.field", "id")
      .option("graft.precombine.field", "v")
      .option("graft.partitionpath.field", "grp")
      .option("graft.table.type", "mor")
      .option("graft.drop.partition.columns", "true")
      .option("graft.operation", "bulk_insert")
      .mode("append").save(dir)
    val t = GraftTable.load(spark, dir)
    val first = t.timeline.completed().last._1
    t.upsert(Seq((1L, "A", 5L)).toDF("id", "grp", "v")) // log file
    val merged = t.snapshot()
    assert(merged.filter(col("id") === 1)
      .select("v", "grp").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((5L, "A")))
    t.compact()
    val afterCompact = t.snapshot()
    assert(afterCompact.filter(col("id") === 1)
      .select("grp").as[String].collect().toSeq === Seq("A"))
    // time travel back to the first commit still restores the column
    val tt = t.snapshot(Some(first))
    assert(tt.filter(col("id") === 1).select("v", "grp").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "A")))
    GraftTable.drop(dir)
  }

  test("schema evolution on a drop-cols table: new column lands, derived column spans epochs") {
    val dir = tmp()
    write(dir, rows, op = "bulk_insert")
    // epoch 2 adds a column; the files still omit grp in both epochs
    write(dir, Seq((5L, "B", 50L, "x5"), (6L, "C", 60L, "x6"))
      .toDF("id", "grp", "v", "extra"))
    val back = spark.read.format("graft").load(dir)
    assert(back.count() === 6)
    val got = back.select("id", "grp", "extra").collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), Option(r.getString(2))))).toMap
    assert(got(1L) === ((Some("A"), None)), "old epoch: derived grp, null extra")
    assert(got(5L) === ((Some("B"), Some("x5"))))
    assert(got(6L) === ((Some("C"), Some("x6"))), "new partition value from the new epoch")
    val t = GraftTable.load(spark, dir)
    assert(t.slices(None).flatMap(_.baseFiles).forall { f =>
      !spark.read.parquet(s"$dir/${f.path}").schema.fieldNames.contains("grp")
    }, "no epoch may materialize the partition column")
    GraftTable.drop(dir)
  }

  test("guard: non-hive-style or encoded partitioning rejects the option") {
    intercept[IllegalArgumentException] {
      TableConfig("t", CopyOnWrite, Seq("id"),
        partitioning = PartitionByColumns(Seq("grp"), hiveStyle = false),
        dropPartitionColumns = true)
    }
    intercept[IllegalArgumentException] {
      TableConfig("t", CopyOnWrite, Seq("id"),
        partitioning = PartitionByColumns(Seq("grp"), urlEncode = true),
        dropPartitionColumns = true)
    }
    intercept[IllegalArgumentException] {
      TableConfig("t", CopyOnWrite, Seq("id"),
        partitioning = NonPartitioned, dropPartitionColumns = true)
    }
  }

  test("typed non-string partition column round-trips through the fast path") {
    val dir = tmp()
    Seq((1L, 7, 1L), (2L, 8, 2L)).toDF("id", "bucket", "v")
      .write.format("graft")
      .option("graft.recordkey.field", "id")
      .option("graft.precombine.field", "v")
      .option("graft.partitionpath.field", "bucket")
      .option("graft.drop.partition.columns", "true")
      .option("graft.operation", "bulk_insert")
      .mode("append").save(dir)
    val back = spark.read.format("graft").load(dir)
    assert(back.schema("bucket").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(back.select(sum("bucket")).collect()(0).getLong(0) === 15L)
    GraftTable.drop(dir)
  }
}
