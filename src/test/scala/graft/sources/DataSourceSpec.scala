package graft.sources

import java.nio.file.Files
import graft.{Tables, TestSpark}
import graft.table._
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.{ExplainMode, FileSourceScanExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `format("graft")` DataSource: read fast path (native parquet scan,
  * plan-time file skipping), general fallbacks (MOR logs, incremental,
  * time travel), and the write path's operations/SaveModes. */
class DataSourceSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def tmp(): String = Files.createTempDirectory("graft_dsv2_").toString
  private def orders: DataFrame = Tables.orders(spark, sf)

  private def writeOrders(dir: String, op: String = "bulk_insert",
      mode: String = "overwrite", df: DataFrame = null): Unit =
    Option(df).getOrElse(orders).write.format("graft")
      .option("graft.recordkey.field", "o_orderkey")
      .option("graft.precombine.field", "o_totalprice")
      .option("graft.partitionpath.field", "o_orderstatus")
      .option("graft.operation", op)
      .option("graft.target.file.rows", "400")
      .mode(mode).save(dir)

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f.metrics("numFiles").value
    }.sum
  }

  test("write + read round trip preserves data; meta columns exposed") {
    val dir = tmp()
    writeOrders(dir)
    val back = spark.read.format("graft").load(dir)
    assert(back.count() === orders.count())
    assert(back.columns.contains(GraftTable.COMMIT))
    assert(back.columns.contains(GraftTable.KEY))
    assert(orders.columns.forall(back.columns.contains))
    // values intact through the native path (integer sum: order-independent)
    val total = back.agg(sum("o_orderkey")).collect()(0).getLong(0)
    val expected = orders.agg(sum("o_orderkey")).collect()(0).getLong(0)
    assert(total === expected)
    GraftTable.drop(dir)
  }

  test("COW snapshot read is a native parquet scan with pushdown, no shuffle") {
    val dir = tmp()
    writeOrders(dir)
    val q = spark.read.format("graft").load(dir)
      .filter(col("o_orderkey") === 42).select("o_orderkey", "o_totalprice")
    val p = plan(q)
    assert(p.contains("PushedFilters:") && p.contains("EqualTo(o_orderkey,42)"),
      "filter must reach the parquet scan through format(\"graft\"):\n" +
        p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
    assert(!p.contains("Exchange"), "snapshot read introduced a shuffle:\n" + p)
    val rs = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!rs.contains("o_orderpriority"), s"column pruning lost: $rs")
    GraftTable.drop(dir)
  }

  test("plan-time file skipping from commit stats: selective key range scans fewer files") {
    val dir = tmp()
    writeOrders(dir) // targetFileSizeRows=400 -> many files per partition
    val all = spark.read.format("graft").load(dir)
    val everything = scannedFiles(all)
    assert(everything > 3, s"need several files for a meaningful test, got $everything")
    // o_orderkey ranges are disjoint-ish across hash-assigned groups, but
    // o_custkey stats still bound; use a filter outside every file's range
    val none = scannedFiles(all.filter(col("o_orderkey") > 999999999L))
    assert(none === 0, s"out-of-range filter should skip every file, scanned $none")
    val one = scannedFiles(all.filter(col("o_orderkey") === 1L))
    assert(one < everything, s"point lookup scanned all $one of $everything files")
    // partition-column filter prunes via the same stats (values materialized)
    val part = scannedFiles(all.filter(col("o_orderstatus") === "P"))
    assert(part < everything, "partition-value filter did not skip files")
    GraftTable.drop(dir)
  }

  test("upsert via write API; snapshot reflects updates (still fast path)") {
    val dir = tmp()
    writeOrders(dir)
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    writeOrders(dir, op = "upsert", mode = "append", df = updates)
    val back = spark.read.format("graft").load(dir)
    assert(back.count() === orders.count())
    val doubled = back.filter(col("o_orderkey") === 10).select("o_totalprice").collect()(0).getDouble(0)
    val orig = orders.filter(col("o_orderkey") === 10).select("o_totalprice").collect()(0).getDouble(0)
    assert(doubled === orig * 2)
    // COW upsert keeps the table log-free: still the native scan
    assert(plan(back.filter(col("o_orderkey") === 10)).contains("PushedFilters:"))
    GraftTable.drop(dir)
  }

  test("MOR with live logs falls back to the merging reader, still correct") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("mor_ds", MergeOnRead,
      Seq("o_orderkey"), Some("o_totalprice"),
      PartitionByColumns(Seq("o_orderstatus")), targetFileSizeRows = 400))
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", lit(1.0)))
    val snap = spark.read.format("graft").load(dir)
    assert(snap.count() === orders.count())
    assert(snap.filter(col("o_orderkey") % 5 === 0 && col("o_totalprice") =!= 1.0).count() === 0)
    // pushed filter still prunes inside the merging plan
    assert(snap.filter(col("o_orderkey") === 5).count() === 1)
    // read_optimized ignores the logs -> original prices (native fast path:
    // base files only, logs don't disqualify)
    val ro = spark.read.format("graft")
      .option("graft.query.type", "read_optimized").load(dir)
    assert(ro.filter(col("o_orderkey") % 5 === 0 && col("o_totalprice") === 1.0).count() === 0)
    val rp = plan(ro.filter(col("o_orderkey") === 10))
    assert(rp.contains("GraftFileIndex") && rp.contains("PushedFilters:"),
      "read_optimized should stay native with pushdown:\n" + rp)
    GraftTable.drop(dir)
  }

  test("skip_merge snapshot: base + log rows unmerged, no exchange in the plan") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("mor_sm", MergeOnRead,
      Seq("o_orderkey"), Some("o_totalprice"),
      PartitionByColumns(Seq("o_orderstatus")), targetFileSizeRows = 400))
    t.bulkInsert(orders)
    val updates = orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", lit(1.0))
    t.upsert(updates)
    val sm = spark.read.format("graft")
      .option("graft.merge.type", "skip_merge").load(dir)
    // unmerged: every base row PLUS every log row
    assert(sm.count() === orders.count() + updates.count())
    // updated keys appear twice (old base version + log version)
    assert(sm.filter(col("o_orderkey") === 5).count() === 2)
    // deletes: tombstones themselves are dropped, stale base rows remain
    t.delete(orders.filter(col("o_orderkey") === 7))
    val sm2 = spark.read.format("graft")
      .option("graft.merge.type", "skip_merge").load(dir)
    assert(sm2.filter(col("o_orderkey") === 7).count() === 1) // base version only
    // the whole point: no merge window → no exchange anywhere in the plan
    val p = plan(sm2)
    assert(!p.contains("Exchange"), s"skip_merge must not shuffle:\n$p")
    GraftTable.drop(dir)
  }

  test("incremental path glob prunes partitions before the scan") {
    val dir = tmp()
    writeOrders(dir)
    val t = GraftTable.load(spark, dir)
    val c1 = t.timeline.completed().last._1
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    writeOrders(dir, op = "upsert", mode = "append", df = updates)
    val all = spark.read.format("graft")
      .option("graft.query.type", "incremental")
      .option("graft.begin.instanttime", c1).load(dir)
    val globbed = spark.read.format("graft")
      .option("graft.query.type", "incremental")
      .option("graft.begin.instanttime", c1)
      .option("graft.incr.path.glob", "o_orderstatus=F*").load(dir)
    val expectF = updates.filter(col("o_orderstatus").startsWith("F")).count()
    assert(globbed.count() === expectF)
    assert(globbed.count() < all.count())
    assert(globbed.filter(!col("o_orderstatus").startsWith("F")).count() === 0)
    // glob semantics: * does not cross segments, ** does
    assert(t.globMatcher("a/*")("a/b") && !t.globMatcher("a/*")("a/b/c"))
    assert(t.globMatcher("a/**")("a/b/c") && t.globMatcher("x?z")("xyz"))
    assert(!t.globMatcher("x?z")("xz"))
    GraftTable.drop(dir)
  }

  test("incremental + time travel through read options") {
    val dir = tmp()
    writeOrders(dir)
    val t = GraftTable.load(spark, dir)
    val c1 = t.timeline.completed().last._1
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    writeOrders(dir, op = "upsert", mode = "append", df = updates)
    val inc = spark.read.format("graft")
      .option("graft.query.type", "incremental")
      .option("graft.begin.instanttime", c1).load(dir)
    assert(inc.count() === updates.count())
    val tt = spark.read.format("graft")
      .option("as.of.instant", c1).load(dir)
    assert(tt.filter(col("o_totalprice") =!=
      orders.filter(col("o_orderkey") === 10).select("o_totalprice").collect()(0).getDouble(0))
      .filter(col("o_orderkey") === 10).count() === 0)
    assert(tt.count() === orders.count())
    GraftTable.drop(dir)
  }

  test("cdc query type through read options: op + before/after images") {
    val dir = tmp()
    writeOrders(dir)
    val c1 = GraftTable.load(spark, dir).timeline.completed().last._1
    val updates = orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    writeOrders(dir, op = "upsert", mode = "append", df = updates)
    val cdc = spark.read.format("graft")
      .option("graft.query.type", "cdc")
      .option("graft.begin.instanttime", c1).load(dir)
    assert(cdc.columns.contains("op") && cdc.columns.contains("before") &&
      cdc.columns.contains("after"))
    val ops = cdc.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops.getOrElse("u", 0L) === updates.count())
    assert(!ops.contains("i") && !ops.contains("d"))
    // the after image carries the doubled price
    assert(cdc.filter(col("after.o_totalprice") =!=
      col("before.o_totalprice") * 2).count() === 0)
    intercept[IllegalArgumentException] { // begin instant is mandatory
      spark.read.format("graft").option("graft.query.type", "cdc").load(dir) }
    GraftTable.drop(dir)
  }

  test("SaveModes: ErrorIfExists throws, Ignore no-ops, Overwrite replaces") {
    val dir = tmp()
    writeOrders(dir)
    intercept[Exception] { writeOrders(dir, mode = "error") }
    val half = orders.filter(col("o_orderkey") % 2 === 0)
    writeOrders(dir, mode = "ignore", df = half) // ignored
    assert(spark.read.format("graft").load(dir).count() === orders.count())
    writeOrders(dir, op = "insert_overwrite_table", mode = "overwrite", df = half)
    assert(spark.read.format("graft").load(dir).count() === half.count())
    GraftTable.drop(dir)
  }

  test("typed snapshot()/readOptimized() take the plan-time pruning fast path") {
    val dir = tmp()
    writeOrders(dir)
    val t = GraftTable.load(spark, dir)
    val snap = t.snapshot()
    assert(plan(snap.filter(col("o_orderkey") === 1L)).contains("GraftFileIndex"),
      "typed snapshot missed the native fast path")
    // plan-time skipping: an out-of-range key scans zero files
    assert(scannedFiles(snap.filter(col("o_orderkey") > 999999999L)) === 0)
    val everything = scannedFiles(t.snapshot())
    assert(scannedFiles(t.snapshot().filter(col("o_orderkey") === 1L)) < everything)
    // partitionPred still prunes on the fast path
    assert(t.snapshot(partitionPred = _ == "o_orderstatus=P").count() ===
      orders.filter(col("o_orderstatus") === "P").count())
    GraftTable.drop(dir)

    // a MOR table with live logs must fall back to the merging reader
    val dir2 = tmp()
    val m = GraftTable.create(spark, dir2, TableConfig("mor_fast", MergeOnRead,
      Seq("o_orderkey"), Some("o_totalprice"),
      PartitionByColumns(Seq("o_orderstatus")), targetFileSizeRows = 400))
    m.bulkInsert(orders)
    m.upsert(orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", lit(1.0)))
    assert(!plan(m.snapshot()).contains("GraftFileIndex"),
      "logged MOR snapshot must not claim the base-only fast path")
    assert(m.snapshot().count() === orders.count())
    // read_optimized ignores logs -> stays native
    assert(plan(m.readOptimized()).contains("GraftFileIndex"))
    GraftTable.drop(dir2)
  }

  test("computed-relation filter translation is sound") {
    import org.apache.spark.sql.sources._
    def c(f: Filter) = GraftComputedRelation.toColumn(f)
    // a filter shape the translator deliberately doesn't handle
    val untranslatable: Filter =
      CollatedEqualTo("b", "x", org.apache.spark.sql.types.StringType)
    assert(c(EqualTo("a", 1)).isDefined)
    assert(c(And(EqualTo("a", 1), EqualTo("b", 2))).isDefined)
    // And with one untranslatable side still pushes the other
    assert(c(And(EqualTo("a", 1), untranslatable)).isDefined)
    // Or with one untranslatable side must drop entirely
    assert(c(Or(EqualTo("a", 1), untranslatable)).isEmpty)
    assert(c(Not(In("a", Array(1, 2)))).isDefined)
    // Not over a PARTIALLY-translatable And must drop: pushing !a for
    // Not(And(a, b)) is stricter than !a || !b and silently loses rows
    assert(c(Not(And(EqualTo("a", 1), untranslatable))).isEmpty)
    assert(c(Not(Or(EqualTo("a", 1), untranslatable))).isEmpty)
    // fully-translatable composites under Not still push
    assert(c(Not(And(EqualTo("a", 1), EqualTo("b", 2)))).isDefined)
    assert(c(Not(Not(EqualTo("a", 1)))).isDefined)
  }

  test("stats pruning compares at native precision (float / long > 2^53)") {
    import org.apache.spark.sql.catalyst.{expressions => cat}
    import org.apache.spark.sql.types._
    def fm(col: String, mn: String, mx: String) = FileMeta(
      "p", "f", "", 1, colStats = Map(col -> Array(mn, mx)))
    def keeps(f: FileMeta, e: cat.Expression): Boolean =
      GraftFileIndex.mayMatch(f, e)
    // float stat "1.1" is exactly 1.1f; the literal is the same float. A
    // double-widened compare sees 1.1000000000000001 vs 1.100000023841858
    // and wrongly prunes the file on equality.
    val fcol = cat.AttributeReference("v", FloatType)()
    assert(keeps(fm("v", "1.1", "1.1"), cat.EqualTo(fcol, cat.Literal(1.1f))))
    assert(!keeps(fm("v", "1.1", "1.1"), cat.EqualTo(fcol, cat.Literal(1.2f))))
    // longs adjacent above 2^53 collapse to the same double; strict range
    // predicates at the boundary must not prune the file holding the match
    val big = (1L << 53) + 1
    val lcol = cat.AttributeReference("k", LongType)()
    val f53 = fm("k", big.toString, big.toString)
    assert(keeps(f53, cat.GreaterThan(lcol, cat.Literal(big - 1))))
    assert(keeps(f53, cat.EqualTo(lcol, cat.Literal(big))))
    assert(!keeps(f53, cat.EqualTo(lcol, cat.Literal(big - 1))))
    assert(!keeps(f53, cat.GreaterThan(lcol, cat.Literal(big))))
  }

  test("insert.drop.duplicates, delete_partition op, commit-meta passthrough") {
    import spark.implicits._
    val dir = tmp()
    def write(df: DataFrame, opts: (String, String)*): Unit = {
      val w = df.write.format("graft")
        .option("graft.recordkey.field", "id")
        .option("graft.partitionpath.field", "p")
        .option("graft.operation", "insert")
        .mode(SaveMode.Append)
      opts.foldLeft(w) { case (ww, (k, v)) => ww.option(k, v) }.save(dir)
    }
    write(Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "p"))
    // drop-duplicates insert: key 1 exists -> dropped; key 3 appends
    write(Seq((1L, "a2", "x"), (3L, "c", "x")).toDF("id", "v", "p"),
      "graft.insert.drop.duplicates" -> "true",
      "_checkpoint" -> "src-offset-42")
    val t = GraftTable.load(spark, dir)
    val state = t.snapshot().select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(state === Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "existing key must keep its original row")
    // the commit-meta option landed in the commit's extra metadata
    val metas = t.timeline.metas(None)
    assert(metas.last.extra.get("_checkpoint").contains("src-offset-42"))
    // a DELETED key no longer blocks re-insert under drop.duplicates
    Seq((3L, "c", "x")).toDF("id", "v", "p").write.format("graft")
      .option("graft.operation", "delete").mode(SaveMode.Append).save(dir)
    write(Seq((3L, "c2", "x")).toDF("id", "v", "p"),
      "graft.insert.drop.duplicates" -> "true")
    t.timeline.refresh() // door writes used their own table instances
    assert(t.snapshot().filter($"id" === 3L).select("v").collect()
      .map(_.getString(0)).toSeq === Seq("c2"))
    // delete_partition through the write door: frame content is ignored
    Seq((0L, "ignored", "zz")).toDF("id", "v", "p").write.format("graft")
      .option("graft.operation", "delete_partition")
      .option("graft.partitions.to.delete", "p=y")
      .mode(SaveMode.Append).save(dir)
    t.timeline.refresh()
    assert(t.snapshot().select("p").distinct().collect()
      .map(_.getString(0)).sorted.toSeq === Seq("x"))
    // missing option fails fast
    intercept[Exception] {
      Seq((0L, "i", "z")).toDF("id", "v", "p").write.format("graft")
        .option("graft.operation", "delete_partition")
        .mode(SaveMode.Append).save(dir) }
  }
}
