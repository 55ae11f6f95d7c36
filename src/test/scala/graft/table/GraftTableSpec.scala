package graft.table

import java.nio.file.Files
import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftTableSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def tmp(): String =
    Files.createTempDirectory("graft_spec_").toString

  private def orders: DataFrame = Tables.orders(spark, sf)

  private def ordersTable(tableType: TableType, dir: String,
      index: IndexType = StatsIndex): GraftTable =
    GraftTable.create(spark, dir, TableConfig("orders_t", tableType,
      keyFields = Seq("o_orderkey"), precombineField = Some("o_totalprice"),
      partitioning = PartitionByColumns(Seq("o_orderstatus")),
      index = index, targetFileSizeRows = 400))

  private def keys(df: DataFrame): Set[Long] =
    df.select("o_orderkey").collect().map(_.getLong(0)).toSet

  test("bulk insert global_sort lays out disjoint per-file key ranges") {
    import graft.TestSpark.spark.implicits._
    def build(sortMode: String): (GraftTable, String) = {
      val dir = tmp()
      val t = GraftTable.create(spark, dir, TableConfig("gs", CopyOnWrite,
        keyFields = Seq("k"), precombineField = None,
        partitioning = NonPartitioned, targetFileSizeRows = 100))
      // keys arrive scrambled — layout quality must come from the write path
      t.bulkInsert((0 until 1000).map(i => (f"k${i * 7919 % 1000}%04d", i))
        .toDF("k", "v"), sortMode)
      (t, dir)
    }
    val (tg, dg) = build("global_sort")
    val files = tg.timeline.metas(None).last.files
    assert(files.size >= 8, s"expected ~10 files, got ${files.size}")
    // disjoint, ordered ranges: sorted by keyMin, each file ends before the
    // next begins — so a key-range probe hits exactly one file
    val ranges = files.map(f => (f.keyMin, f.keyMax)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(CodePointOrder.le(aMax, bMin) && aMax != bMin,
          s"overlapping file key ranges: $ranges")
      case _ =>
    }
    val probe = "k0500"
    def containing(fs: Seq[FileMeta]) = fs.count(f =>
      CodePointOrder.le(f.keyMin, probe) && CodePointOrder.le(probe, f.keyMax))
    assert(containing(files) === 1)
    // the default hash layout spreads each partition's keys over every new
    // file: ranges all contain the probe — blooms, not ranges, must prune
    val (th, dh) = build("hash")
    val hashFiles = th.timeline.metas(None).last.files
    assert(containing(hashFiles) === hashFiles.size)
    // identical content either way
    assert(tg.snapshot().select("k", "v").collect().map(r => (r.getString(0),
      r.getInt(1))).sorted.toSeq ===
      th.snapshot().select("k", "v").collect().map(r => (r.getString(0),
        r.getInt(1))).sorted.toSeq)
    GraftTable.drop(dg); GraftTable.drop(dh)
  }

  test("clustering SmallFileBounded consolidates only small groups within the IO budget") {
    import graft.TestSpark.spark.implicits._
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("smallc", CopyOnWrite,
      keyFields = Seq("k"), precombineField = None,
      partitioning = NonPartitioned, targetFileSizeRows = 10000))
    // one big group + three small ones (bulk_insert never bin-packs)
    t.bulkInsert((1 to 2000).map(i => (i.toLong, s"v$i")).toDF("k", "s"))
    t.bulkInsert((10001 to 10050).map(i => (i.toLong, s"v$i")).toDF("k", "s"))
    t.bulkInsert((20001 to 20050).map(i => (i.toLong, s"v$i")).toDF("k", "s"))
    t.bulkInsert((30001 to 30050).map(i => (i.toLong, s"v$i")).toDF("k", "s"))
    val before = t.snapshot().select("k").collect().map(_.getLong(0)).sorted
    val bySize = t.slices(None)
      .map(s => s.fileId -> s.baseFiles.map(_.bytes).sum).sortBy(_._2)
    assert(bySize.size === 4)
    val (bigId, bigBytes) = bySize.last
    // limit excludes the big group; budget covers only the two smallest
    val budget = 2 * (bySize(0)._2 + bySize(1)._2) + 1
    val inst = t.cluster(Seq("k"), strategy = SmallFileBounded(bigBytes, budget))
    assert(inst.nonEmpty)
    val after = t.slices(None)
    assert(after.size === 3, s"expected big + untouched small + merged, got $after")
    assert(after.exists(_.fileId == bigId), "big group must not be rewritten")
    assert(after.exists(_.fileId == bySize(2)._1), "over-budget small group must survive")
    assert(t.snapshot().select("k").collect().map(_.getLong(0)).sorted === before)
    // nothing under the limit → no-op, no commit
    val commits = t.timeline.completed().size
    assert(t.cluster(Seq("k"), strategy = SmallFileBounded(1)).isEmpty)
    assert(t.timeline.completed().size === commits)
    GraftTable.drop(dir)
  }

  test("event-time payload: stale updates and deletes lose against stored rows") {
    import graft.TestSpark.spark.implicits._
    for (tt <- Seq(CopyOnWrite, MergeOnRead)) {
      val dir = tmp()
      val t = GraftTable.create(spark, dir, TableConfig("et", tt,
        keyFields = Seq("id"), precombineField = Some("v"),
        partitioning = PartitionByColumns(Seq("p")),
        payload = EventTimeOrdered))
      t.bulkInsert(Seq((1L, "a", 5.0, "orig1"), (2L, "a", 3.0, "orig2"))
        .toDF("id", "p", "v", "note"))
      // stale update (4.0 < stored 5.0) ignored; fresh one (9.0 > 3.0) wins
      t.upsert(Seq((1L, "a", 4.0, "stale")).toDF("id", "p", "v", "note"))
      t.upsert(Seq((2L, "a", 9.0, "fresh")).toDF("id", "p", "v", "note"))
      val rows = t.snapshot().select("id", "v", "note")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sortBy(_._1)
      assert(rows.toSeq === Seq((1L, 5.0, "orig1"), (2L, 9.0, "fresh")), s"$tt")
      // stale delete ignored; fresh delete applies
      t.delete(Seq((1L, "a", 1.0, "")).toDF("id", "p", "v", "note"))
      assert(t.snapshot().filter(col("id") === 1).count() === 1, s"$tt stale delete applied")
      t.delete(Seq((2L, "a", 99.0, "")).toDF("id", "p", "v", "note"))
      assert(t.snapshot().filter(col("id") === 2).count() === 0, s"$tt fresh delete ignored")
      if (tt == MergeOnRead) {
        // compaction folds the event-order merge into the new bases
        t.compact()
        val ro = t.readOptimized().select("id", "v", "note")
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
        assert(ro.toSeq === Seq((1L, 5.0, "orig1")))
      }
      GraftTable.drop(dir)
    }
  }

  test("cow: bulk insert + snapshot round-trips") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    val snap = t.snapshot()
    assert(snap.count() === orders.count())
    assert(keys(snap) === keys(orders))
    // meta columns present, data columns intact
    assert(snap.columns.contains(GraftTable.COMMIT))
    assert(orders.columns.forall(snap.columns.contains))
    GraftTable.drop(dir)
  }

  test("cow: upsert updates existing keys, inserts new, preserves commit time of untouched rows") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    val c1 = t.bulkInsert(orders)
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", round(col("o_totalprice") * 2, 2))
    val news = orders.filter(col("o_orderkey") % 100 === 1)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000)
    val c2 = t.upsert(updates.unionByName(news))
    val snap = t.snapshot()
    assert(snap.count() === orders.count() + news.count())
    val doubled = snap.filter(col("o_orderkey") % 10 === 0 && col("o_orderkey") < 1000000)
    val orig = orders.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), round(col("o_totalprice") * 2, 2).as("exp"))
    assert(doubled.join(orig, "o_orderkey")
      .filter(abs(col("o_totalprice") - col("exp")) > 0.001).count() === 0)
    // untouched rows keep their original commit time
    val untouched = snap.filter(col("o_orderkey") % 10 =!= 0 && col("o_orderkey") < 1000000)
    assert(untouched.filter(col(GraftTable.COMMIT) =!= c1).count() === 0)
    assert(snap.filter(col(GraftTable.COMMIT) === c2).count()
      === updates.count() + news.count())
    GraftTable.drop(dir)
  }

  test("cow: delete removes keys; deleting everything in a group kills the group") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    t.delete(orders.filter(col("o_orderkey") % 7 === 0))
    val snap = t.snapshot()
    assert(keys(snap) === keys(orders.filter(col("o_orderkey") % 7 =!= 0)))
    // now delete an entire partition's rows record-by-record
    t.delete(orders.filter(col("o_orderstatus") === "P"))
    assert(t.snapshot().filter(col("o_orderstatus") === "P").count() === 0)
    GraftTable.drop(dir)
  }

  test("time travel and incremental") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    val c1 = t.bulkInsert(orders)
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderpriority", lit("0-UPDATED"))
    val c2 = t.upsert(updates)
    // time travel to c1 sees the original data
    val tt = t.snapshot(asOf = Some(c1))
    assert(tt.filter(col("o_orderpriority") === "0-UPDATED").count() === 0)
    assert(tt.count() === orders.count())
    // incremental (c1, c2] sees exactly the changed rows
    val inc = t.incremental(c1, Some(c2))
    assert(inc.count() === updates.count())
    assert(inc.filter(col("o_orderpriority") =!= "0-UPDATED").count() === 0)
    GraftTable.drop(dir)
  }

  test("insert_overwrite replaces only touched partitions; delete_partition; overwrite table") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    val replacement = orders.filter(col("o_orderstatus") === "P")
      .withColumn("o_totalprice", lit(1.0)).limit(100)
    t.insertOverwrite(replacement)
    val snap = t.snapshot()
    assert(snap.filter(col("o_orderstatus") === "P").count() === 100)
    assert(snap.filter(col("o_orderstatus") === "O").count()
      === orders.filter(col("o_orderstatus") === "O").count())
    t.deletePartitions(Seq("o_orderstatus=F"))
    assert(t.snapshot().filter(col("o_orderstatus") === "F").count() === 0)
    t.insertOverwriteTable(orders.limit(10))
    assert(t.snapshot().count() === 10)
    GraftTable.drop(dir)
  }

  test("mor small-file packing: tiny inserts append as logs, never new groups") {
    val dir = tmp()
    val t = ordersTable(MergeOnRead, dir)
    val base = orders.filter(col("o_orderkey") % 50 === 0)
    t.upsert(base) // empty table: inserts open the initial (under-sized) groups
    val groups0 = t.slices(None).map(s => (s.partition, s.fileId)).toSet
    def tiny(i: Int): DataFrame = orders.filter(col("o_orderkey") % 50 === i)
      .withColumn("o_orderkey", col("o_orderkey") + lit(90000000L))
    val tinyRows = (1 to 3).map(i => { t.upsert(tiny(i)); tiny(i).count() }).sum
    val slices1 = t.slices(None)
    // the packing contract: N tiny MOR inserts do NOT grow the group count —
    // they append as log files of the under-sized existing groups
    assert(slices1.map(s => (s.partition, s.fileId)).toSet === groups0,
      "tiny MOR inserts must bin-pack into existing groups, not open new ones")
    assert(slices1.exists(_.logs.nonEmpty), "packed inserts must land in logs")
    // packed-insert log files carry while-writing bloom sidecars — hasBloom
    // on a log is the "can introduce keys" marker tagging consults (merge
    // reads never do)
    assert(t.timeline.metas(None).flatMap(_.files).filter(_.isLog).forall(_.hasBloom))
    assert(t.snapshot().count() === base.count() + tinyRows)
    // read-optimized = base files only: log-resident inserts are invisible
    // until compaction (MOR contract)
    assert(t.readOptimized().count() === base.count())
    // tagging finds LOG-resident keys: re-upserting a packed key must
    // UPDATE it in place, not insert a duplicate
    t.upsert(tiny(1).withColumn("o_totalprice", lit(77.0)))
    assert(t.slices(None).map(s => (s.partition, s.fileId)).toSet === groups0)
    // the pure-UPDATE commit's log stays unmarked (its keys are
    // base-or-marked-log covered), so tagging never reads it
    val updLogs = t.timeline.metas(None).last.files.filter(_.isLog)
    assert(updLogs.nonEmpty && updLogs.forall(!_.hasBloom))
    val snap2 = t.snapshot()
    assert(snap2.count() === base.count() + tinyRows, "log-resident key re-upsert duplicated rows")
    assert(snap2.filter(col("o_orderkey") >= 90000000L && col("o_orderkey") % 50 === 1)
      .filter(col("o_totalprice") =!= 77.0).count() === 0)
    // deleting a log-resident key tombstones it in its group's log
    t.delete(tiny(2).limit(1))
    assert(t.snapshot().count() === base.count() + tinyRows - 1)
    // compaction folds packed inserts into the base; snapshot equality holds
    // and read-optimized converges to the snapshot
    val snapBefore = t.snapshot().select("o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(t.compact().nonEmpty)
    assert(t.slices(None).forall(_.logs.isEmpty))
    assert(t.snapshot().select("o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet === snapBefore)
    assert(t.readOptimized().count() === base.count() + tinyRows - 1)
    GraftTable.drop(dir)
  }

  test("mor: upsert goes to logs; read-optimized skips them until compaction") {
    val dir = tmp()
    val t = ordersTable(MergeOnRead, dir)
    t.bulkInsert(orders)
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderpriority", lit("0-UPDATED"))
    t.upsert(updates)
    // deltacommit wrote logs
    assert(t.slices(None).exists(_.logs.nonEmpty))
    // snapshot merges, read-optimized does not
    assert(t.snapshot().filter(col("o_orderpriority") === "0-UPDATED").count()
      === updates.count())
    assert(t.readOptimized().filter(col("o_orderpriority") === "0-UPDATED").count() === 0)
    assert(t.snapshot().count() === orders.count())
    // MOR delete via log tombstone
    t.delete(orders.filter(col("o_orderkey") % 13 === 0))
    assert(t.snapshot().filter(col("o_orderkey") % 13 === 0).count() === 0)
    // compaction folds logs into new bases
    val Some(_) = t.compact(): @unchecked
    assert(t.slices(None).forall(_.logs.isEmpty))
    assert(t.readOptimized().filter(col("o_orderpriority") === "0-UPDATED").count()
      === updates.filter(col("o_orderkey") % 13 =!= 0).count())
    assert(t.snapshot().filter(col("o_orderkey") % 13 === 0).count() === 0)
    GraftTable.drop(dir)
  }

  test("precombine: highest ordering value wins within a batch") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    val low = orders.limit(50).withColumn("o_totalprice", lit(1.0))
    val high = orders.limit(50).withColumn("o_totalprice", lit(999.0))
    t.upsert(low.unionByName(high))
    val snap = t.snapshot()
    assert(snap.count() === 50)
    assert(snap.filter(col("o_totalprice") =!= 999.0).count() === 0)
    GraftTable.drop(dir)
  }

  test("mergeInto: matched update / matched delete / unmatched insert") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders.filter(col("o_orderkey") < 1000))
    val source = orders
      .withColumn("o_orderpriority", lit("MERGED"))
    t.mergeInto(source,
      updateCond = col("o_orderkey") % 2 === 0,
      deleteCond = col("o_orderkey") % 5 === 0,
      insertCond = col("o_orderkey") >= 1000)
    val snap = t.snapshot().cache()
    // deleted: matched keys divisible by 5
    assert(snap.filter(col("o_orderkey") < 1000 && col("o_orderkey") % 5 === 0).count() === 0)
    // updated: matched even keys (not %5)
    val updated = snap.filter(col("o_orderkey") < 1000 && col("o_orderkey") % 2 === 0
      && col("o_orderkey") % 5 =!= 0)
    assert(updated.filter(col("o_orderpriority") =!= "MERGED").count() === 0)
    // untouched: matched odd keys keep original priority
    val untouched = snap.filter(col("o_orderkey") < 1000 && col("o_orderkey") % 2 =!= 0
      && col("o_orderkey") % 5 =!= 0)
    assert(untouched.filter(col("o_orderpriority") === "MERGED").count() === 0)
    // inserted: all keys >= 1000
    assert(snap.filter(col("o_orderkey") >= 1000).count()
      === orders.filter(col("o_orderkey") >= 1000).count())
    snap.unpersist()
    GraftTable.drop(dir)
  }

  test("clustering: layout rewrite preserves data and commit times; z-order works") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    val c1 = t.bulkInsert(orders)
    val before = t.snapshot().select("o_orderkey", "o_totalprice").collect().toSet
    t.cluster(Seq("o_orderdate"))
    assert(t.snapshot().select("o_orderkey", "o_totalprice").collect().toSet === before)
    // commit times preserved -> incremental from c1 is still empty
    assert(t.incremental(c1).count() === 0)
    t.cluster(Seq("o_orderkey", "o_custkey"), zorder = true)
    assert(t.snapshot().select("o_orderkey", "o_totalprice").collect().toSet === before)
    // partition-scoped clustering touches only the selected partition
    val beforeIds = t.slices(None).map(s => (s.partition, s.fileId)).toSet
    t.cluster(Seq("o_orderkey"), partitionPred = _ == "o_orderstatus=P")
    val afterIds = t.slices(None).map(s => (s.partition, s.fileId)).toSet
    assert((beforeIds -- afterIds).forall(_._1 == "o_orderstatus=P"),
      "non-selected partitions must keep their file groups")
    assert(t.snapshot().select("o_orderkey", "o_totalprice").collect().toSet === before)
    GraftTable.drop(dir)
  }

  test("clean removes superseded file slices but keeps the live snapshot") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 3 === 0).withColumn("o_totalprice", lit(5.0)))
    t.upsert(orders.filter(col("o_orderkey") % 3 === 1).withColumn("o_totalprice", lit(6.0)))
    val rowsBefore = t.snapshot().count()
    t.clean(retainVersions = 1)
    assert(t.snapshot().count() === rowsBefore)
    // physical files: only live slices remain
    val live = t.slices(None).flatMap(s => s.baseFiles ++ s.logs.map(_._2)).map(_.path).toSet
    val onDisk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
    import scala.jdk.CollectionConverters._
    val dataFiles = onDisk.asScala.filter(p => p.toString.endsWith(".parquet"))
      .map(p => java.nio.file.Paths.get(dir).relativize(p).toString).toSet
    assert(dataFiles === live)
    GraftTable.drop(dir)
  }

  test("incremental over a cleaned window: fails fast, or full-scan fallback") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", lit(5.0)))
    val c2 = t.timeline.completed().last._1
    t.upsert(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", lit(6.0)))
    // v1 retention physically deletes the bases the (0, c1] window needs
    t.clean(retainVersions = 1)
    val err = intercept[IllegalStateException] { t.incremental("0").collect() }
    assert(err.getMessage.contains("cleaned") &&
      err.getMessage.contains("fallback"))
    // fallback: snapshot-as-of-to filtered to commit range — here the full
    // window, so it must equal the live snapshot
    val fb = t.incremental("0", fallbackFullScan = true)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val snap = t.snapshot().select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(fb === snap)
    // a window whose files all survived still takes the precise file read
    val sinceC2 = t.incremental(c2).select("o_orderkey").collect()
    assert(sinceC2.length === orders.filter(col("o_orderkey") % 3 === 0).count())
    // the read-door option wires through
    val doorFb = spark.read.format("graft")
      .option("graft.query.type", "incremental")
      .option("graft.begin.instanttime", "0")
      .option("graft.incremental.fallback.fullscan", "true")
      .load(dir)
    assert(doorFb.count() === t.snapshot().count())
    intercept[Exception] {
      spark.read.format("graft")
        .option("graft.query.type", "incremental")
        .option("graft.begin.instanttime", "0")
        .load(dir).collect() }
    GraftTable.drop(dir)
  }

  test("rollback undoes the last commit; savepoint/restore rewinds") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    val saved = t.savepoint()
    t.upsert(orders.limit(20).withColumn("o_orderpriority", lit("X")))
    assert(t.snapshot().filter(col("o_orderpriority") === "X").count() === 20)
    t.rollback()
    assert(t.snapshot().filter(col("o_orderpriority") === "X").count() === 0)
    t.upsert(orders.limit(10).withColumn("o_orderpriority", lit("Y")))
    t.upsert(orders.limit(10).withColumn("o_orderpriority", lit("Z")))
    t.restore(saved)
    val snap = t.snapshot()
    assert(snap.count() === orders.count())
    assert(snap.filter(col("o_orderpriority").isin("X", "Y", "Z")).count() === 0)
    GraftTable.drop(dir)
  }

  test("key generators: complex key and timestamp partitioning") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("li", CopyOnWrite,
      keyFields = Seq("l_orderkey", "l_linenumber"),
      precombineField = Some("l_extendedprice"),
      partitioning = PartitionByTimestamp("l_shipdate", "yyyy-MM"),
      targetFileSizeRows = 2000))
    val li = Tables.lineitem(spark, sf)
    t.bulkInsert(li)
    assert(t.snapshot().count() === li.count())
    assert(t.showPartitions().collect().map(_.getString(0)).forall(_.startsWith("dt=")))
    // upsert one specific line item by its compound key
    val one = li.filter(col("l_orderkey") === li.select(min("l_orderkey")).collect()(0).getLong(0))
      .limit(1).withColumn("l_quantity", lit(77.0))
    t.upsert(one)
    assert(t.snapshot().filter(col("l_quantity") === 77.0).count() === 1)
    assert(t.snapshot().count() === li.count())
    GraftTable.drop(dir)
  }

  test("bucket index: expression-only tagging upserts correctly") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir, index = BucketIndex(8))
    t.bulkInsert(orders)
    val updates = orders.filter(col("o_orderkey") % 11 === 0)
      .withColumn("o_orderpriority", lit("B-UPD"))
    t.upsert(updates)
    val snap = t.snapshot()
    assert(snap.count() === orders.count())
    assert(snap.filter(col("o_orderpriority") === "B-UPD").count() === updates.count())
    // all file ids are bucket-shaped
    assert(t.slices(None).forall(_.fileId.matches("b\\d{5}")))
    GraftTable.drop(dir)
  }

  test("bucket index: mergeInto classifies NEW keys in existing buckets as inserts") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir, index = BucketIndex(4))
    t.bulkInsert(orders)
    // new keys land in buckets that all already exist (4 buckets, many keys):
    // group-level tagging would call them "matched"; with updateCond false
    // they must still be INSERTED, and deleteCond must not tombstone them
    val newKeys = orders.filter(col("o_orderkey") % 10 === 3)
      .withColumn("o_orderkey", col("o_orderkey") + 50000000L)
    t.mergeInto(newKeys,
      updateCond = lit(false), deleteCond = lit(false), insertCond = lit(true))
    val snap = keys(t.snapshot())
    assert(keys(newKeys).subsetOf(snap), "new keys dropped by merge classification")
    assert(snap.size === (orders.count() + newKeys.count()))
    GraftTable.drop(dir)
  }

  test("time travel works between the archival boundary and the checkpoint") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    val c2 = t.upsert(orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_orderpriority", lit("V2")))
    val c3 = t.delete(orders.filter(col("o_orderkey") % 7 === 0))
    // cluster rewrites every group AFTER c2: the pre-cluster files are dead
    // at checkpoint time and only reconstructable via boundary-live carry
    t.cluster(Seq("o_orderkey"))
    assert(t.archive(keepLast = 2) > 0)
    // t=c2 is between the newest archived instant and the checkpoint
    val atC2 = t.snapshot(asOf = Some(c2))
    assert(atC2.count() === orders.count(), "time travel across checkpoint lost rows")
    assert(atC2.filter(col("o_orderpriority") === "V2").count() ===
      orders.filter(col("o_orderkey") % 5 === 0).count())
    // current snapshot unaffected
    assert(t.snapshot().count() === orders.count() - keys(orders.filter(col("o_orderkey") % 7 === 0)).size)
    // travel PAST the archival boundary must fail fast, not return garbage
    intercept[IllegalArgumentException] { t.snapshot(asOf = Some("0")).count() }
    intercept[IllegalArgumentException] { t.incrementalCDC("0").count() }
    assert(c3.nonEmpty)
    GraftTable.drop(dir)
  }

  test("footer stats cover timestamp columns; archival checkpoint does not conflict") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    // o_orderdate is a timestamp: stats must be recorded (regression: footer
    // extraction used to drop INT64 timestamps -> no pruning possible)
    val withStats = t.slices(None).flatMap(_.baseFiles)
      .filter(_.colStats.contains("o_orderdate"))
    assert(withStats.nonEmpty, "timestamp column has no footer stats")
    val Array(mn, mx) = withStats.head.colStats("o_orderdate")
    assert(mn.matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}") && mn <= mx, s"$mn..$mx")
    // pruning on the timestamp column returns exactly the matching rows
    val lo = "1996-01-01 00:00:00"; val hi = "1996-12-31 23:59:59"
    val pruned = t.snapshotPruned("o_orderdate", lo, hi)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val expected = orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    assert(pruned.count() === expected.count())
    // a checkpoint between a writer's start and commit is NOT a conflict
    val seen = t.timeline.completed().map(_._1).toSet
    t.upsert(orders.limit(10))
    t.archive(keepLast = 1)
    assert(!t.detectConflict(seen, Set("F|b00000"), Set.empty) ||
      t.timeline.metas(None).exists(m => !seen.contains(m.instant) &&
        m.operation != "checkpoint" && m.files.exists(f => s"${f.partition}|${f.fileId}" == "F|b00000")),
      "archival checkpoint alone must not trigger writer conflicts")
    GraftTable.drop(dir)
  }

  test("file lock: stale locks are broken; release is token-guarded") {
    val dir = tmp()
    Files.createDirectories(java.nio.file.Paths.get(dir, ".graft"))
    val lock = java.nio.file.Paths.get(dir, ".graft", ".lock")
    // a "crashed writer" left a stale lock: acquisition must break it
    Files.write(lock, "dead-token".getBytes("UTF-8"))
    Files.setLastModifiedTime(lock, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis() - 20 * 60 * 1000))
    val lp = new FileLockProvider(dir, timeoutMs = 5000)
    var ran = false
    lp.withLock { ran = true }
    assert(ran)
    assert(!Files.exists(lock), "lock not released after stale break")
    // a FRESH foreign lock: acquisition times out and the foreign lock
    // must survive (release is token-guarded, never deletes others' locks)
    Files.write(lock, "other-holder".getBytes("UTF-8"))
    val lp2 = new FileLockProvider(dir, timeoutMs = 300, staleMs = 60 * 60 * 1000)
    intercept[ConcurrentWriteException] { lp2.withLock { fail("must not acquire") } }
    assert(Files.exists(lock) &&
      new String(Files.readAllBytes(lock), "UTF-8") == "other-holder")
    Files.deleteIfExists(lock)
  }

  test("bloom sidecars are built by the write job itself — zero extra Spark jobs") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val counter = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { counter.incrementAndGet(); () }
    }
    // job-start events post asynchronously; poll until the count stops moving
    def jobsDuring(body: => Unit): Int = {
      spark.sparkContext.addSparkListener(listener)
      try {
        counter.set(0)
        body
        var last = -1
        var stable = 0
        while (stable < 5) {
          Thread.sleep(100)
          val c = counter.get()
          if (c == last) stable += 1 else { stable = 0; last = c }
        }
        last
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    def mk(dir: String, index: IndexType): GraftTable =
      GraftTable.create(spark, dir, TableConfig("jobs_t", CopyOnWrite,
        keyFields = Seq("o_orderkey"), precombineField = Some("o_totalprice"),
        partitioning = PartitionByColumns(Seq("o_orderstatus")),
        index = index, targetFileSizeRows = 200))
    val (dStats, dBucket) = (tmp(), tmp())
    val (tStats, tBucket) = (mk(dStats, StatsIndex), mk(dBucket, BucketIndex(8)))
    val df = orders
    // bucket tables never build blooms — same op, same data. The stats path
    // legitimately runs ONE more job (its insert-planning broadcast join;
    // bucket assigns file ids by pure expression). A separate bloom pass
    // (the round-5 regression) would make the delta 2 — pin it at 1.
    val statsJobs = jobsDuring(tStats.bulkInsert(df))
    val bucketJobs = jobsDuring(tBucket.bulkInsert(df))
    assert(tStats.slices(None).forall(_.baseFiles.forall(_.hasBloom)),
      "stats-index commit must produce bloom sidecars")
    assert(tBucket.slices(None).forall(_.baseFiles.forall(!_.hasBloom)))
    assert(statsJobs === bucketJobs + 1,
      s"bloom sidecar build added Spark jobs: $statsJobs vs $bucketJobs")
    // global_sort skips sidecars: disjoint ranges already prune to ~1 file
    val dGs = tmp()
    val tGs = mk(dGs, StatsIndex)
    tGs.bulkInsert(df, sortMode = "global_sort")
    assert(tGs.slices(None).forall(_.baseFiles.forall(!_.hasBloom)),
      "global_sort layout must not pay for bloom sidecars")
    GraftTable.drop(dStats); GraftTable.drop(dBucket); GraftTable.drop(dGs)
  }

  test("bloom index prunes candidate files where key ranges prune nothing") {
    val dir = tmp()
    // tiny target size -> many file groups per partition; hash assignment
    // makes every file's [keyMin,keyMax] span ~the whole key space, so
    // range pruning alone keeps everything
    val t = GraftTable.create(spark, dir, TableConfig("bloomy", CopyOnWrite,
      keyFields = Seq("o_orderkey"), precombineField = Some("o_totalprice"),
      partitioning = PartitionByColumns(Seq("o_orderstatus")),
      targetFileSizeRows = 50))
    t.bulkInsert(orders)
    val all = t.slices(None)
    assert(all.size > 15, s"need many groups, got ${all.size}")
    assert(all.forall(_.baseFiles.forall(_.hasBloom)), "base files missing blooms")
    val batch = orders.orderBy("o_orderkey").limit(3)
    val keyed = batch
      .withColumn(GraftTable.KEY, t.config.keyExpr)
      .withColumn(GraftTable.PART, t.config.partitioning.pathExpr)
    val touchedParts = keyed.select(GraftTable.PART).distinct()
      .collect().map(_.getString(0)).toSet
    val rangeOnly = all.count(s => touchedParts.contains(s.partition))
    assert(rangeOnly > 6, s"expected many range-only candidates, got $rangeOnly")
    val cands = t.candidateSlices(keyed, all)
    assert(cands.size <= 6,
      s"blooms kept ${cands.size} of $rangeOnly range candidates for 3 keys")
    // no false negatives: the upsert must REPLACE the existing rows
    t.upsert(batch.withColumn("o_totalprice", lit(77.0)))
    assert(t.snapshot().count() === orders.count(), "bloom pruning duplicated keys")
    val k = batch.select("o_orderkey").collect().map(_.getLong(0))
    assert(t.snapshot().filter(col("o_orderkey").isin(k: _*))
      .filter(col("o_totalprice") =!= 77.0).count() === 0)
    GraftTable.drop(dir)
  }

  test("compaction strategy: IO budget compacts only the worst-log groups") {
    val dir = tmp()
    val t = ordersTable(MergeOnRead, dir)
    t.bulkInsert(orders)
    // uneven log debt: groups holding keys %4==0 get three log rounds,
    // everything %40==1 gets one
    for (i <- 1 to 3)
      t.upsert(orders.filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_totalprice", lit(i.toDouble)))
    t.upsert(orders.filter(col("o_orderkey") % 40 === 1)
      .withColumn("o_totalprice", lit(9.0)))
    def logged = t.slices(None).filter(_.logs.nonEmpty)
    val before = logged
    assert(before.size > 2, s"need several log-bearing groups, got ${before.size}")
    // replicate the strategy's IO estimate to find the single worst group
    def io(s: FileSlice) =
      2 * s.baseFiles.map(_.bytes).sum + s.logs.map(_._2.bytes).sum
    def logBytes(s: FileSlice) = s.logs.map(_._2.bytes).sum
    val worst = before.maxBy(s => (logBytes(s), s.partition, s.fileId))
    // a threshold above every group's log size selects nothing
    assert(t.compact(strategy =
      LogSizeBounded(minLogBytes = before.map(logBytes).max + 1)).isEmpty)
    // budget for exactly the worst group
    assert(t.compact(strategy = LogSizeBounded(maxIOBytes = io(worst))).nonEmpty)
    val after = logged.map(s => (s.partition, s.fileId)).toSet
    assert(!after.contains((worst.partition, worst.fileId)),
      "the worst-log group was not compacted")
    assert(after === before.map(s => (s.partition, s.fileId)).toSet -
      ((worst.partition, worst.fileId)),
      "budgeted compaction touched groups beyond the worst one")
    // correctness unchanged: latest values win everywhere
    val snap = t.snapshot()
    assert(snap.count() === orders.count())
    assert(snap.filter(col("o_orderkey") % 40 === 1)
      .filter(col("o_totalprice") =!= 9.0).count() === 0)
    assert(snap.filter(col("o_orderkey") % 4 === 0)
      .filter(col("o_totalprice") =!= 3.0).count() === 0)
    GraftTable.drop(dir)
  }

  test("clean KeepLatestCommits: retained commits stay readable, older fail fast") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    val instants = (1 to 5).map { i =>
      t.upsert(orders.filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_totalprice", lit(i.toDouble)))
    }
    val total = orders.count()
    t.clean(KeepLatestCommits(3))
    // every commit inside the window is still time-travelable, bit-correct
    for ((ins, i) <- instants.drop(2).zipWithIndex) {
      val snap = t.snapshot(asOf = Some(ins))
      assert(snap.count() === total)
      assert(snap.filter(col("o_orderkey") % 4 === 0)
        .filter(col("o_totalprice") =!= (i + 3).toDouble).count() === 0,
        s"as-of $ins lost its version")
    }
    // older than the window: fails fast, not mid-scan on a missing file
    val e = intercept[IllegalArgumentException] { t.snapshot(asOf = Some(instants.head)) }
    assert(e.getMessage.contains("clean retention boundary"))
    // physical proof: superseded pre-window versions are gone from disk
    import scala.jdk.CollectionConverters._
    val onDisk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
      .asScala.count(_.toString.endsWith(".parquet"))
    val referenced = t.timeline.metas(None).flatMap(_.files).map(_.path).distinct.size
    assert(onDisk < referenced, "clean deleted nothing")
    GraftTable.drop(dir)
  }

  test("clean KeepLatestByHours: everything older than the cutoff collapses to one version") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    val mid = t.upsert(orders.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", lit(1.0)))
    t.upsert(orders.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", lit(2.0)))
    // a huge window retains everything
    t.clean(KeepLatestByHours(1000.0))
    assert(t.snapshot(asOf = Some(mid)).count() === orders.count())
    // a zero-hour window keeps only the latest state (cutoff = now)
    t.clean(KeepLatestByHours(0.0))
    val snap = t.snapshot()
    assert(snap.count() === orders.count())
    assert(snap.filter(col("o_orderkey") % 4 === 0)
      .filter(col("o_totalprice") =!= 2.0).count() === 0)
    intercept[IllegalArgumentException] { t.snapshot(asOf = Some(mid)) }
    GraftTable.drop(dir)
  }

  test("clean KeepLatestCommits spares savepointed instants") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", lit(1.0)))
    val saved = t.savepoint() // protects the state after the first upsert
    for (i <- 2 to 5)
      t.upsert(orders.filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_totalprice", lit(i.toDouble)))
    t.clean(KeepLatestCommits(2))
    // the savepointed instant is outside the window but still readable
    val snap = t.snapshot(asOf = Some(saved))
    assert(snap.count() === orders.count())
    assert(snap.filter(col("o_orderkey") % 4 === 0)
      .filter(col("o_totalprice") =!= 1.0).count() === 0)
    GraftTable.drop(dir)
  }

  test("concurrent ingest + async services: no lost rows, only clean conflicts") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir, index = BucketIndex(4))
    t.lockProvider = new InProcessLockProvider(dir) // single-JVM stress
    t.bulkInsert(orders)
    val services = new AsyncTableServices(t)
    val errors = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val writerOk = new java.util.concurrent.atomic.AtomicInteger(0)
    // 12 writer tasks race 4-wide against archive+clean on the service pool
    val futures = (0 until 12).map { i =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            t.upsert(orders.filter(col("o_orderkey") % 4 === i % 4)
              .withColumn("o_orderpriority", lit(s"W$i")))
            writerOk.incrementAndGet()
          } catch {
            case _: ConcurrentWriteException => // acceptable: loser reschedules
            case e: Throwable => errors.add(s"writer $i: $e")
          }
      })
    }
    val svc = Seq(services.archiveAsync(keepLast = 6), services.cleanAsync(1))
    futures.foreach(_.get())
    svc.foreach(f => scala.concurrent.Await.ready(f,
      scala.concurrent.duration.Duration(60, "s")))
    pool.shutdown(); services.close()
    assert(errors.isEmpty, errors.toString)
    assert(writerOk.get() > 0, "every writer conflicted — stress test vacuous")
    // table is intact and readable after the storm
    val snap = t.snapshot()
    assert(snap.count() === orders.count(), "rows lost under concurrency")
    GraftTable.drop(dir)
  }

  test("clean after archive keeps the live base files (carried versions rank by origInstant)") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    // rewrite every group AFTER what will become the boundary, so the
    // checkpoint carries dead-now files recorded at a LATER instant
    t.upsert(orders.withColumn("o_orderpriority", lit("V2")))
    t.upsert(orders.withColumn("o_orderpriority", lit("V3")))
    t.cluster(Seq("o_orderkey"))
    assert(t.archive(keepLast = 1) > 0)
    t.clean(retainVersions = 1)
    // if clean ranked carried old versions above the real latest base,
    // the live files would be gone and this read would crash
    val snap = t.snapshot()
    assert(snap.count() === orders.count())
    assert(snap.filter(col("o_orderpriority") === "V3").count() === orders.count())
    GraftTable.drop(dir)
  }

  test("mergeInto re-inserts tombstoned keys (COW and MOR)") {
    for (tt <- Seq(CopyOnWrite, MergeOnRead)) {
      val dir = tmp()
      val t = ordersTable(tt, dir)
      t.bulkInsert(orders)
      val victims = orders.filter(col("o_orderkey") % 9 === 0)
      t.delete(victims)
      assert(t.snapshot().count() === orders.count() - victims.count())
      // matched rows would be dropped by updateCond=false; a deleted key is
      // NOT matched (its latest version is a tombstone) -> insert branch
      t.mergeInto(victims.withColumn("o_orderpriority", lit("RESURRECTED")),
        updateCond = lit(false), deleteCond = lit(false), insertCond = lit(true))
      val snap = t.snapshot()
      assert(snap.count() === orders.count(), s"$tt: tombstoned keys not re-inserted")
      assert(snap.filter(col("o_orderpriority") === "RESURRECTED").count() === victims.count())
      GraftTable.drop(dir)
    }
  }

  test("null keys fail the write; null partition values get the hive default segment") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    // null key -> loud failure, not silent collapse/duplication
    val nullKey = orders.limit(5)
      .withColumn("o_orderkey", lit(null).cast("long"))
    val e = intercept[Exception] { t.bulkInsert(nullKey) }
    assert(e.getMessage != null)
    // null partition value -> stable __HIVE_DEFAULT_PARTITION__ path, and
    // a re-upsert of the same key UPDATES it (no tag-join null mismatch)
    val nullPart = orders.limit(10)
      .withColumn("o_orderstatus", lit(null).cast("string"))
    val t2 = ordersTable(CopyOnWrite, tmp())
    t2.bulkInsert(nullPart)
    assert(t2.slices(None).forall(_.partition == "o_orderstatus=__HIVE_DEFAULT_PARTITION__"))
    t2.upsert(nullPart.withColumn("o_orderpriority", lit("NULLP-UPD")))
    val snap = t2.snapshot()
    assert(snap.count() === 10, "null-partition upsert duplicated records")
    assert(snap.filter(col("o_orderpriority") === "NULLP-UPD").count() === 10)
    GraftTable.drop(dir)
  }

  test("sql update evaluates all assignments against the old row (swap works)") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    GraftSql.update(t,
      Map("o_custkey" -> col("o_totalprice").cast("long"),
          "o_totalprice" -> col("o_custkey").cast("double")),
      col("o_orderkey") === 42)
    // both assignments must read the OLD row: sequential application would
    // make the new price equal floor(old price), not the old custkey
    val orig = orders.filter(col("o_orderkey") === 42).collect()(0)
    val upd = t.snapshot().filter(col("o_orderkey") === 42).collect()(0)
    assert(upd.getAs[Long]("o_custkey") === orig.getAs[Double]("o_totalprice").toLong)
    assert(upd.getAs[Double]("o_totalprice") === orig.getAs[Long]("o_custkey").toDouble)
    GraftTable.drop(dir)
  }

  test("schema evolution: new column appears, old rows read as null") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders.filter(col("o_orderkey") % 2 === 0))
    val withNew = orders.filter(col("o_orderkey") % 2 === 1)
      .withColumn("o_channel", lit("web"))
    t.upsert(withNew)
    val snap = t.snapshot()
    assert(snap.columns.contains("o_channel"))
    assert(snap.filter(col("o_channel") === "web").count()
      === orders.filter(col("o_orderkey") % 2 === 1).count())
    assert(snap.filter(col("o_channel").isNull).count()
      === orders.filter(col("o_orderkey") % 2 === 0).count())
    GraftTable.drop(dir)
  }

  test("schema merge: container nullability mismatch is the same type, not a string fold") {
    // a Dataset built from Scala tuples/case classes types its arrays
    // containsNull=false where the parquet-read table says true; the
    // merge must union the nullability, NOT take widen's conflicting-
    // types fallback — which used to silently turn an array<float>
    // embedding column into strings on the first in-memory upsert
    import spark.implicits._
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("emb_merge",
      CopyOnWrite, keyFields = Seq("vec_id"), precombineField = None))
    // seed THROUGH parquet so the table schema carries containsNull=true
    val pq = tmp()
    Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(pq)
    t.bulkInsert(spark.read.parquet(pq))
    // the in-memory batch: containsNull=false
    t.upsert(Seq((3L, Array(5.0f, 6.0f))).toDF("vec_id", "embedding"))
    val snap = t.snapshot()
    assert(snap.schema("embedding").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = true),
      s"got ${snap.schema("embedding").dataType}")
    assert(snap.select(org.apache.spark.sql.functions.aggregate(
      col("embedding"), lit(0.0f), (acc, x) => acc + x).as("s"))
      .collect().map(_.getFloat(0)).sorted === Array(3.0f, 7.0f, 11.0f),
      "array payload must survive the merge intact")
    GraftTable.drop(dir)
    GraftTable.drop(pq)
  }

  test("schema merge: map and nested-struct nullability union, payload intact") {
    // same premise as the array case for the other two container kinds:
    // literal-built batches type map values valueContainsNull=false and
    // struct fields nullable=false where the table side says true — the
    // merge must union nullability element-wise, not string-fold
    import spark.implicits._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("cont_merge",
      CopyOnWrite, keyFields = Seq("vec_id"), precombineField = None))
    val loose = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("attrs", MapType(StringType, FloatType,
        valueContainsNull = true)),
      StructField("meta", StructType(Seq(
        StructField("a", LongType, nullable = true),
        StructField("b", StringType, nullable = true))))))
    t.bulkInsert(spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Map("p" -> 1.0f), Row(5L, "u")),
        Row(2L, Map("q" -> 2.0f), Row(6L, "v"))),
      loose))
    // literal-built batch: valueContainsNull=false / nullable=false
    t.upsert(Seq(3L).toDF("vec_id")
      .withColumn("attrs", map(lit("r"), lit(3.0f)))
      .withColumn("meta", struct(lit(7L).as("a"), lit("w").as("b"))))
    val snap = t.snapshot()
    assert(snap.schema("attrs").dataType ===
      MapType(StringType, FloatType, valueContainsNull = true),
      s"got ${snap.schema("attrs").dataType}")
    assert(snap.schema("meta").dataType ===
      StructType(Seq(
        StructField("a", LongType, nullable = true),
        StructField("b", StringType, nullable = true))),
      s"got ${snap.schema("meta").dataType}")
    val rows = snap.selectExpr("vec_id", "map_values(attrs)[0]",
        "meta.a", "meta.b")
      .collect().map(r => (r.getLong(0), r.getFloat(1), r.getLong(2),
        r.getString(3))).sortBy(_._1)
    assert(rows === Array((1L, 1.0f, 5L, "u"), (2L, 2.0f, 6L, "v"),
      (3L, 3.0f, 7L, "w")),
      "map and struct payloads must survive the merge intact")
    GraftTable.drop(dir)
  }

  test("column-stats pruning: snapshotPruned reads matching slices only") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("o2", CopyOnWrite,
      keyFields = Seq("o_orderkey"), precombineField = None,
      partitioning = NonPartitioned, targetFileSizeRows = 200))
    t.bulkInsert(orders)
    t.cluster(Seq("o_orderkey"))  // sort by key so file ranges are disjoint
    val lo = "100"; val hi = "200"
    val pruned = t.snapshotPruned("o_orderkey", lo, hi)
      .filter(col("o_orderkey").between(100, 200))
    val full = t.snapshot().filter(col("o_orderkey").between(100, 200))
    assert(pruned.count() === full.count())
    GraftTable.drop(dir)
  }

  test("per-file stats stay partition-scoped when fileIds repeat across partitions") {
    // one insert commit writes g<instant>-00000 into BOTH partitions — the
    // basenames are identical, so stats must be matched by full relative path
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("dup_fid", CopyOnWrite,
      keyFields = Seq("k"), precombineField = None,
      partitioning = PartitionByColumns(Seq("p")), targetFileSizeRows = 1000))
    import TestSpark.spark.implicits._
    val rows = ((1 to 50).map(i => (f"a$i%03d", "A", i)) ++
                (1 to 50).map(i => (f"b$i%03d", "B", i))).toDF("k", "p", "v")
    t.insert(rows)
    val byPart = t.slices(None).groupBy(_.partition)
    val aFiles = byPart("p=A").flatMap(_.baseFiles)
    val bFiles = byPart("p=B").flatMap(_.baseFiles)
    assert(aFiles.forall(f => f.keyMin.startsWith("a") && f.keyMax.startsWith("a")),
      s"partition A key range polluted: ${aFiles.map(f => (f.keyMin, f.keyMax))}")
    assert(bFiles.forall(f => f.keyMin.startsWith("b") && f.keyMax.startsWith("b")),
      s"partition B key range polluted: ${bFiles.map(f => (f.keyMin, f.keyMax))}")
    // with polluted ranges this upsert would be mis-tagged as an insert and
    // duplicate the key
    t.upsert(Seq(("b010", "B", 999)).toDF("k", "p", "v"))
    assert(t.snapshot().count() === 100)
    assert(t.snapshot().filter(col("k") === "b010" && col("v") === 999).count() === 1)
    GraftTable.drop(dir)
  }

  test("concurrent writers hitting the same bucket groups: winners commit, losers conflict, no lost rows") {
    val dir = tmp()
    GraftTable.create(spark, dir, TableConfig("cc", CopyOnWrite,
      keyFields = Seq("k"), precombineField = None,
      partitioning = NonPartitioned, index = BucketIndex(2),
      targetFileSizeRows = 10000))
    import TestSpark.spark.implicits._
    import scala.collection.parallel.CollectionConverters._
    // 4 independent writer instances race disjoint key sets into the same 2
    // deterministic bucket groups: without written-group conflict detection
    // + the commit lock, two writers commit two bases for one fileId and the
    // lower instant's rows silently vanish
    val outcomes = (0 until 4).par.map { i =>
      val t = GraftTable.load(spark, dir)
      val rows = (1 to 25).map(j => (f"w$i-k$j%03d", j)).toDF("k", "v")
      try { t.insert(rows); (i, true) }
      catch { case _: ConcurrentWriteException => (i, false) }
    }.toList
    val succeeded = outcomes.filter(_._2).map(_._1)
    assert(succeeded.nonEmpty, "at least one writer must commit")
    val t = GraftTable.load(spark, dir)
    val snapKeys = t.snapshot().select("k").as[String].collect().toSet
    for (i <- succeeded)
      assert((1 to 25).forall(j => snapKeys.contains(f"w$i-k$j%03d")),
        s"writer $i committed but lost rows")
    assert(snapKeys.size === succeeded.size * 25,
      "failed writers must contribute no rows")
  }

  test("archival keeps write-time schemas: widened columns read correctly from carried files") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("evo_arch", CopyOnWrite,
      keyFields = Seq("k"), precombineField = None,
      partitioning = NonPartitioned, targetFileSizeRows = 1000))
    import TestSpark.spark.implicits._
    // v written as int, later widened to string — the carried file must be
    // read with its original int schema, then cast
    t.bulkInsert(Seq(("a", 7), ("b", 8)).toDF("k", "v"))
    t.upsert(Seq(("c", "nine")).toDF("k", "v"))
    for (i <- 1 to 5) t.upsert(Seq((s"x$i", s"s$i")).toDF("k", "v"))
    assert(t.archive(keepLast = 2) > 0)
    val snap = t.snapshot().select("k", "v").as[(String, String)].collect().toMap
    assert(snap("a") === "7" && snap("b") === "8" && snap("c") === "nine")
    GraftTable.drop(dir)
  }

  test("re-archiving a checkpoint re-carries its files: data survives repeated archival") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("rearch", CopyOnWrite,
      keyFields = Seq("k"), precombineField = None,
      partitioning = NonPartitioned, targetFileSizeRows = 1000))
    import TestSpark.spark.implicits._
    for (i <- 1 to 5) t.upsert(Seq((f"k$i%02d", i)).toDF("k", "v"))
    assert(t.archive(keepLast = 2) > 0)
    for (i <- 6 to 10) t.upsert(Seq((f"k$i%02d", i)).toDF("k", "v"))
    assert(t.archive(keepLast = 2) > 0) // archives the first checkpoint too
    val snap = t.snapshot()
    assert(snap.count() === 10)
    assert(snap.select("k").as[String].collect().toSet
      === (1 to 10).map(i => f"k$i%02d").toSet)
    GraftTable.drop(dir)
  }

  test("incrementalCDC: i/u/d with before/after images; layout churn emits no changes") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("cdc", MergeOnRead,
      keyFields = Seq("k"), precombineField = None,
      partitioning = NonPartitioned, targetFileSizeRows = 1000))
    import TestSpark.spark.implicits._
    val c1 = t.bulkInsert(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v"))
    t.upsert(Seq(("b", 20), ("d", 4)).toDF("k", "v")) // update b, insert d
    t.delete(Seq(("c", 0)).toDF("k", "v"))            // delete c (MOR tombstone)
    val cdc = t.incrementalCDC(c1)
      .select(col(GraftTable.KEY).as("k"), col("op"),
        col("before.v").as("bv"), col("after.v").as("av"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(cdc === Map(
      "b" -> (("u", Some(2), Some(20))),
      "c" -> (("d", Some(3), None)),
      "d" -> (("i", None, Some(4)))))
    // pure layout churn (compact + cluster) emits no change rows
    val c3 = t.latestDataInstant.get
    t.compact()
    t.cluster(Seq("k"))
    assert(t.incrementalCDC(c3).count() === 0)
    GraftTable.drop(dir)
  }

  test("commits landing >threshold files read footers on executors; stats identical") {
    import TestSpark.spark.implicits._
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("bigcommit", CopyOnWrite,
      keyFields = Seq("k"), precombineField = None, targetFileSizeRows = 50))
    // one commit, ~130 file groups — crosses DistributedFooterScanThreshold
    val n = 6500
    t.bulkInsert((0 until n).map(i => (f"k$i%05d", i.toLong)).toDF("k", "v"))
    val files = t.slices(None).flatMap(_.baseFiles)
    assert(files.size > GraftTable.DistributedFooterScanThreshold,
      s"fixture too small: ${files.size} files")
    assert(files.map(_.rows).sum === n)
    // recorded stats must equal a direct driver-side footer read
    val conf = spark.sessionState.newHadoopConf()
    files.take(5).foreach { f =>
      val st = FooterStats.read(conf,
        java.nio.file.Paths.get(dir, f.path), Set(GraftTable.KEY, "v"),
        spark.sessionState.conf.sessionLocalTimeZone)
      assert(st.rows === f.rows, f.path)
      assert(st.bytes === f.bytes, f.path)
      assert(st.minMax.get(GraftTable.KEY).map(_._1).contains(f.keyMin), f.path)
      assert(st.minMax.get(GraftTable.KEY).map(_._2).contains(f.keyMax), f.path)
      assert(f.colStats.get("v").map(_.toSeq) ===
        st.minMax.get("v").map(p => Seq(p._1, p._2)), f.path)
    }
    // and the stats keep doing their job: selective key probe prunes files
    val probe = Seq("k00001").toDF("k")
      .withColumn(GraftTable.KEY, col("k"))
      .withColumn(GraftTable.PART, lit(""))
    assert(t.candidateSlices(probe, t.slices(None)).size < files.size / 2)
    assert(t.snapshot().count() === n)
    GraftTable.drop(dir)
  }

  test("bootstrapInPlace adopts existing parquet without rewriting; upserts work after") {
    val dir = tmp()
    val src = orders.filter(col("o_orderkey") <= 2000)
    val cnt = src.count()
    src.write.mode("overwrite").parquet(dir) // a pre-existing plain parquet lake
    import scala.jdk.CollectionConverters._
    def dataFiles() = java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p)).toMap
    val before = dataFiles()
    val t = GraftTable.bootstrapInPlace(spark, dir, TableConfig("boot", CopyOnWrite,
      keyFields = Seq("o_orderkey"), precombineField = None,
      partitioning = NonPartitioned, targetFileSizeRows = 100000))
    // snapshot sees all rows, derived meta columns present
    val snap = t.snapshot()
    assert(snap.count() === cnt)
    assert(snap.filter(col(GraftTable.KEY).isNull).count() === 0)
    // bootstrap itself rewrote nothing
    assert(dataFiles() === before, "bootstrap must not touch data files")
    // stats flowed from footers
    assert(t.slices(None).flatMap(_.baseFiles).map(_.rows).sum === cnt)
    // upserts against bootstrapped groups merge correctly
    val upd = src.filter(col("o_orderkey") % 10 === 0).withColumn("o_totalprice", lit(1.5))
    t.upsert(upd)
    assert(t.snapshot().count() === cnt)
    assert(t.snapshot().filter(col("o_totalprice") === 1.5).count() === upd.count())
    GraftTable.drop(dir)
  }

  test("bootstrapInPlace distributes the footer scan as a Spark job; FileMeta identical") {
    import TestSpark.spark.implicits._
    // two partitions, several files each — enough to compare the paths
    def writeSrc(dir: String): Unit = {
      val df = (0 until 60).map(i => (s"k$i", if (i % 2 == 0) "e" else "o", i))
        .toDF("k", "pv", "v")
      df.filter(col("pv") === "e").repartition(3).write.parquet(s"$dir/pv=e")
      df.filter(col("pv") === "o").repartition(3).write.parquet(s"$dir/pv=o")
    }
    val cfg = TableConfig("bootdist", CopyOnWrite, keyFields = Seq("k"),
      precombineField = None, partitioning = PartitionByColumns(Seq("pv")),
      targetFileSizeRows = 1000)
    val dirDriver = tmp(); writeSrc(dirDriver)
    val dirDist = tmp(); writeSrc(dirDist)
    // driver path (threshold above file count)
    val tD = GraftTable.bootstrapInPlace(spark, dirDriver, cfg,
      distributeOver = 1000)
    // distributed path (threshold 0 forces the Spark job) — pin that a job
    // actually launched
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val tX = try {
      val t = GraftTable.bootstrapInPlace(spark, dirDist, cfg.copy(name = "bootdist2"),
        distributeOver = 0)
      // listener events deliver async; wait for at least one job to register
      val deadline = System.nanoTime + 10_000_000_000L
      while (jobs < 1 && System.nanoTime < deadline) Thread.sleep(50)
      t
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs >= 1, "distributed bootstrap must launch a Spark job")
    // identical FileMeta (modulo the file-name hash parquet embeds): same
    // partitions, rows, key ranges and colStats per sorted position
    def metas(t: GraftTable) = t.slices(None).flatMap(_.baseFiles)
      .sortBy(_.path)
      .map(f => (f.partition, f.rows, f.keyMin, f.keyMax,
        f.colStats.toSeq.map { case (c, a) => (c, a.toSeq) }.sortBy(_._1)))
    assert(metas(tX) === metas(tD))
    assert(tX.snapshot().count() === 60)
    // executor-side validation failures still fail fast, before table state
    val dirBad = tmp()
    Seq(("k1", 1)).toDF("k", "v").write.parquet(s"$dirBad/pv=e")
    intercept[Exception] {
      GraftTable.bootstrapInPlace(spark, dirBad, cfg.copy(name = "bootbad3"),
        distributeOver = 0)
    }
    assert(!Files.exists(java.nio.file.Paths.get(dirBad, ".graft")))
    GraftTable.drop(dirDriver); GraftTable.drop(dirDist); GraftTable.drop(dirBad)
  }

  test("bootstrapInPlace adopts a hive-partitioned layout; escaped segments and upserts agree") {
    val dir = tmp()
    import TestSpark.spark.implicits._
    // values exercising hive-path escaping ('#' -> %23) and a raw space
    val rows = Seq(("k1", "a b", 1), ("k2", "a b", 2), ("k3", "c#d", 3), ("k4", "c#d", 4))
    val df = rows.toDF("k", "pv", "v")
    // hive layout written by hand WITH the partition column materialized in
    // the files (bootstrap requires it; spark partitionBy would drop it)
    df.filter(col("pv") === "a b").write.parquet(s"$dir/pv=a b")
    df.filter(col("pv") === "c#d").write.parquet(s"$dir/pv=c%23d")
    val t = GraftTable.bootstrapInPlace(spark, dir, TableConfig("bootp", CopyOnWrite,
      keyFields = Seq("k"), precombineField = None,
      partitioning = PartitionByColumns(Seq("pv")), targetFileSizeRows = 1000))
    assert(t.snapshot().count() === 4)
    // recorded partitions are the DERIVED (decoded) form, matching pathExpr
    assert(t.slices(None).map(_.partition).toSet === Set("pv=a b", "pv=c#d"))
    // upserting existing keys must tag the bootstrapped groups (no dupes)
    t.upsert(Seq(("k1", "a b", 10), ("k3", "c#d", 30)).toDF("k", "pv", "v"))
    val snap = t.snapshot()
    assert(snap.count() === 4, "re-upserted keys duplicated: partition derivation disagrees")
    assert(snap.filter(col("k") === "k1").select("v").head.getInt(0) === 10)
    assert(snap.filter(col("k") === "k3").select("v").head.getInt(0) === 30)
    GraftTable.drop(dir)
  }

  test("bootstrapInPlace fails fast when directory layout disagrees with the partitioning") {
    val dir = tmp()
    import TestSpark.spark.implicits._
    val df = Seq(("k1", "x", "y", 1)).toDF("k", "a", "b", "v")
    // directory says a=x/b=y but the config orders the columns (b, a)
    df.write.parquet(s"$dir/a=x/b=y")
    intercept[IllegalArgumentException] {
      GraftTable.bootstrapInPlace(spark, dir, TableConfig("bootbad", CopyOnWrite,
        keyFields = Seq("k"), precombineField = None,
        partitioning = PartitionByColumns(Seq("b", "a")), targetFileSizeRows = 1000))
    }
    // failed bootstrap left the source untouched — no .graft dir
    assert(!Files.exists(java.nio.file.Paths.get(dir, ".graft")))
    GraftTable.drop(dir)
  }

  test("upsert tagging with supplementary-plane keys does not duplicate") {
    val dir = tmp()
    import TestSpark.spark.implicits._
    val t = GraftTable.create(spark, dir, TableConfig("emoji", CopyOnWrite,
      keyFields = Seq("k"), precombineField = None,
      partitioning = NonPartitioned, targetFileSizeRows = 1000))
    // existing file's key range is a BMP char that Java's UTF-16 order
    // sorts ABOVE the incoming batch max (an emoji) but code-point /
    // UTF-8 order sorts BELOW — the old comparison excluded the file
    // from tagging candidates and re-inserted its key
    t.bulkInsert(Seq(("\uFFFD", 1)).toDF("k", "v"))
    t.upsert(Seq(("\uFFFD", 2), ("\uD83D\uDE00", 3)).toDF("k", "v"))
    val snap = t.snapshot()
    assert(snap.count() === 2, "supplementary-plane range comparison duplicated a key")
    assert(snap.filter(col("k") === "\uFFFD").select("v").head.getInt(0) === 2)
    GraftTable.drop(dir)
  }

  test("code-point order matches UTF-8 byte order where Java string order does not") {
    assert(CodePointOrder.compare("\uFFFD", "\uD83D\uDE00") < 0) // U+FFFD < U+1F600
    assert("\uFFFD".compareTo("\uD83D\uDE00") > 0)               // Java disagrees
    assert(CodePointOrder.compare("abc", "abd") < 0)
    assert(CodePointOrder.compare("ab", "abc") < 0)
    assert(CodePointOrder.compare("abc", "abc") === 0)
  }

  test("file lock: heartbeat keeps a long critical section alive past staleMs") {
    val dir = tmp()
    Files.createDirectories(java.nio.file.Paths.get(dir, ".graft"))
    val lock = java.nio.file.Paths.get(dir, ".graft", ".lock")
    val holder = new FileLockProvider(dir, timeoutMs = 5000, pollMs = 5, staleMs = 300)
    val stolen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val thief = new Thread(() => {
      // same staleMs: would break the lock if the holder did not heartbeat
      val lp = new FileLockProvider(dir, timeoutMs = 700, pollMs = 5, staleMs = 300)
      try lp.withLock { stolen.set(true) }
      catch { case _: ConcurrentWriteException => /* expected: times out */ }
    })
    holder.withLock {
      holder.assertHeld()
      thief.start()
      Thread.sleep(1000) // critical section 3x longer than staleMs
      holder.assertHeld() // still ours: heartbeat kept it fresh
      assert(!stolen.get(), "lock was stale-broken while actively held")
    }
    thief.join(5000)
    assert(!Files.exists(lock), "lock not released")
    GraftTable.drop(dir)
  }

  test("async table services: compaction off the ingest path, conflicts fail cleanly") {
    val dir = tmp()
    val t = ordersTable(MergeOnRead, dir)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", lit(9.0)))
    val services = new AsyncTableServices(t)
    try {
      import scala.concurrent.Await
      import scala.concurrent.duration._
      val fut = services.compactAsync()
      val done = try Await.result(fut, 120.seconds)
      catch { case _: ConcurrentWriteException => None } // lost a race: fine
      if (done.isDefined) assert(t.slices(None).forall(_.logs.isEmpty))
      assert(t.snapshot().count() === orders.count())
    } finally services.close()
    GraftTable.drop(dir)
  }

  test("syncViews registers rt/ro SQL views") {
    val dir = tmp()
    val t = ordersTable(MergeOnRead, dir)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderpriority", lit("SQLV")))
    GraftSql.syncViews(t, "orders_sync")
    assert(spark.sql("SELECT count(*) FROM orders_sync").collect()(0).getLong(0)
      === orders.count())
    assert(spark.sql("SELECT count(*) FROM orders_sync_rt WHERE o_orderpriority = 'SQLV'")
      .collect()(0).getLong(0) === orders.filter(col("o_orderkey") % 2 === 0).count())
    // read-optimized view doesn't see the uncompacted log updates
    assert(spark.sql("SELECT count(*) FROM orders_sync_ro WHERE o_orderpriority = 'SQLV'")
      .collect()(0).getLong(0) === 0)
    GraftTable.drop(dir)
  }

  test("introspection: commits, fsview, partitions, write amplification") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    t.upsert(orders.limit(30).withColumn("o_totalprice", lit(2.0)))
    assert(t.showCommits().count() === 2)
    assert(t.showFileSystemView().count() > 0)
    assert(t.showPartitions().count() === 3)
    assert(t.statsWriteAmplification() >= 1.0)
    // metadata table round-trips the live file view as parquet
    t.syncMetadataTable()
    val md = t.metadataTable()
    assert(md.count() === t.slices(None).map(s => s.baseFiles.size + s.logs.size).sum)
    assert(md.columns.contains("key_min") && md.columns.contains("col_stats"))
    GraftTable.drop(dir)
  }

  test("upsertPartial: null keeps, omitted inherits, tombstoned keys insert fresh (COW + MOR)") {
    for (tt <- Seq(CopyOnWrite, MergeOnRead)) {
      val dir = tmp()
      val t = ordersTable(tt, dir)
      t.bulkInsert(orders)
      t.delete(orders.filter(col("o_orderkey") === 13))
      // narrow source: no o_custkey / o_orderdate at all; price NULL except %20
      val src = orders.filter(col("o_orderkey") % 10 === 3 || col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("o_orderkey") % 20 === 0, lit(7.5)).as("o_totalprice"),
          lit("PART_UPD").as("o_orderpriority"))
      t.upsertPartial(src)
      val snap = t.snapshot().cache()
      assert(snap.count() === orders.count()) // key 13 resurrected, no dupes
      // %20 rows took the provided price; other touched rows kept theirs
      assert(snap.filter(col("o_orderkey") % 20 === 0 && col("o_totalprice") =!= 7.5).count() === 0)
      val kept = snap.filter(col("o_orderkey") % 10 === 3 && col("o_orderkey") =!= 13)
        .join(orders.select(col("o_orderkey"), col("o_totalprice").as("exp")), "o_orderkey")
      assert(kept.filter(col("o_totalprice") =!= col("exp")).count() === 0)
      // omitted columns inherited for live keys
      val inh = snap.filter(col("o_orderkey") % 10 === 3 && col("o_orderkey") =!= 13)
      assert(inh.filter(col("o_custkey").isNull || col("o_orderdate").isNull).count() === 0)
      // the tombstoned key came back via the INSERT path: nothing inherited
      val res = snap.filter(col("o_orderkey") === 13).collect()
      assert(res.length === 1 && res(0).isNullAt(res(0).fieldIndex("o_custkey"))
        && res(0).getString(res(0).fieldIndex("o_orderpriority")) === "PART_UPD")
      snap.unpersist()
      GraftTable.drop(dir)
    }
  }

  test("payload = partial_update routes every upsert front door through partial semantics") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir,
      TableConfig("orders_lake", CopyOnWrite, keyFields = Seq("o_orderkey"),
        precombineField = Some("o_totalprice"),
        partitioning = PartitionByColumns(Seq("o_orderstatus")),
        payload = PartialUpdate))
    t.bulkInsert(orders)
    // plain upsert() with a narrow, partially-null frame inherits values
    t.upsert(orders.filter(col("o_orderkey") % 10 === 3)
      .select(col("o_orderkey"), col("o_orderstatus"),
        lit(null).cast("double").as("o_totalprice"),
        lit("ROUTED").as("o_orderpriority")))
    val snap = t.snapshot().cache()
    assert(snap.count() === orders.count())
    val touched = snap.filter(col("o_orderkey") % 10 === 3)
    assert(touched.filter(col("o_orderpriority") =!= "ROUTED").count() === 0)
    // null price + omitted custkey/date inherited from the stored rows
    assert(touched.filter(col("o_totalprice").isNull ||
      col("o_custkey").isNull || col("o_orderdate").isNull).count() === 0)
    snap.unpersist()
    // SQL UPDATE under this payload: SET x = NULL keeps the stored value
    // (hudi's partial-payload behavior, documented on PartialUpdate)
    GraftSql.update(t,
      Map("o_totalprice" -> lit(null).cast("double")),
      col("o_orderkey") % 10 === 3)
    assert(t.snapshot().filter(col("o_orderkey") % 10 === 3 &&
      col("o_totalprice").isNull).count() === 0)
    GraftTable.drop(dir)
  }

  test("upsertGlobal: key moves partition (old row tombstoned), in-place updates and inserts still work") {
    for (tt <- Seq(CopyOnWrite, MergeOnRead)) {
      val dir = tmp()
      val t = ordersTable(tt, dir)
      t.bulkInsert(orders)
      val moved = orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_orderstatus", lit("X"))
        .withColumn("o_totalprice", lit(1.25))
      val bumped = orders.filter(col("o_orderkey") % 10 =!= 0 && col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", lit(2.5))
      val news = orders.filter(col("o_orderkey") % 100 === 3)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      t.upsertGlobal(moved.unionByName(bumped).unionByName(news))
      val snap = t.snapshot().cache()
      assert(snap.count() === orders.count() + news.count())
      // moved keys exist ONLY in partition X — old partition's copy is gone
      assert(snap.filter(col("o_orderkey") % 10 === 0 && col("o_orderkey") < 10000000L
        && col("o_orderstatus") =!= "X").count() === 0)
      assert(snap.filter(col("o_orderstatus") === "X").count() === moved.count())
      assert(snap.filter(col("o_orderstatus") === "X" && col("o_totalprice") =!= 1.25).count() === 0)
      assert(snap.filter(col("o_totalprice") === 2.5).count() === bumped.count())
      // a second move back: X empties out again
      t.upsertGlobal(moved.withColumn("o_orderstatus", lit("F")))
      val snap2 = t.snapshot()
      assert(snap2.filter(col("o_orderstatus") === "X").count() === 0)
      assert(snap2.count() === orders.count() + news.count())
      snap.unpersist()
      GraftTable.drop(dir)
    }
  }

  test("upsertGlobal updatePartitionPath=false: record updates in place, no move, no tombstone") {
    for (tt <- Seq(CopyOnWrite, MergeOnRead)) {
      val dir = tmp()
      val t = ordersTable(tt, dir)
      t.bulkInsert(orders)
      val homeOf = t.snapshot().filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col(GraftTable.PART))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // incoming rows claim partition X, but must stay in their home partition
      val incoming = orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_orderstatus", lit("X"))
        .withColumn("o_totalprice", lit(3.75))
      val news = orders.filter(col("o_orderkey") % 100 === 7)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
        .withColumn("o_orderstatus", lit("X"))
      t.upsertGlobal(incoming.unionByName(news), updatePartitionPath = false)
      val snap = t.snapshot().cache()
      assert(snap.count() === orders.count() + news.count())
      // matched rows: values updated, PHYSICAL partition unchanged
      val after = snap.filter(col("o_orderkey") % 10 === 0 &&
          col("o_orderkey") < 10000000L)
        .select(col("o_orderkey"), col(GraftTable.PART), col("o_totalprice"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(after.forall(_._3 === 3.75), "values must update")
      assert(after.forall { case (k, p, _) => p === homeOf(k) },
        "a matched record must stay in its home partition")
      assert(snap.filter(col(GraftTable.PART) === "o_orderstatus=X" &&
        col("o_orderkey") < 10000000L).count() === 0,
        "only genuinely new keys may land in partition X")
      // unmatched (new) keys insert into THEIR OWN partition as usual
      assert(snap.filter(col("o_orderkey") >= 10000000L &&
        col(GraftTable.PART) =!= "o_orderstatus=X").count() === 0)
      snap.unpersist()
      GraftTable.drop(dir)
    }
  }

  test("upsertGlobal: within-batch duplicate keys across partitions collapse by precombine") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders.filter(col("o_orderkey") <= 100))
    val a = orders.filter(col("o_orderkey") <= 10)
      .withColumn("o_orderstatus", lit("A")).withColumn("o_totalprice", lit(1.0))
    val b = orders.filter(col("o_orderkey") <= 10)
      .withColumn("o_orderstatus", lit("B")).withColumn("o_totalprice", lit(9.0))
    t.upsertGlobal(a.unionByName(b)) // higher precombine (9.0, partition B) wins
    val snap = t.snapshot()
    val dup = snap.groupBy("o_orderkey").count().filter(col("count") > 1)
    assert(dup.count() === 0)
    val won = snap.filter(col("o_orderkey") <= 10)
    assert(won.filter(col("o_orderstatus") =!= "B").count() === 0)
    GraftTable.drop(dir)
  }
}
