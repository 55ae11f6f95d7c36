package graft.table

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-table-served file listings (ref: hudi HoodieBackedTableMetadata
  * read path + HoodieBackedTableMetadataWriter.update): cold listings read
  * parquet segments, not N JSON documents; syncs after the first are
  * O(new commits) delta appends; staleness (rollback) fails soft to the
  * JSON fold. */
class MdtListingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_mdt_").toString

  private def batch(from: Int, n: Int) = (from until from + n)
    .map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "p", "v")

  private def build(dir: String, tt: TableType): GraftTable = {
    val t = GraftTable.create(spark, dir, TableConfig("mdt", tt,
      keyFields = Seq("id"), precombineField = Some("v"),
      partitioning = PartitionByColumns(Seq("p")), targetFileSizeRows = 10))
    t.bulkInsert(batch(0, 40))
    t.upsert(batch(10, 10).withColumn("v", col("v") + 1000))
    t.delete(batch(0, 5))
    t
  }

  private def fsView(t: GraftTable): Set[(String, String, String, Int, Int, Long)] =
    t.showFileSystemView()
      .as[(String, String, String, Int, Int, Long)].collect().toSet

  private def segDirs(dir: String): Seq[String] = {
    val d = Paths.get(dir, ".graft", "metadata", "files")
    if (!Files.isDirectory(d)) Nil
    else Files.list(d).iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("seg_")).toSeq.sorted
  }

  for (tt <- Seq(CopyOnWrite, MergeOnRead))
    test(s"MDT-served slices identical to the JSON fold (${tt.name})") {
      val dir = tmp()
      val t = build(dir, tt)
      t.syncMetadataTable()
      // post-sync commits of every fold-relevant shape: upsert (+ MOR log),
      // delete, insert_overwrite tombstones
      t.upsert(batch(20, 5).withColumn("v", col("v") + 7))
      t.insertOverwrite(batch(300, 6).withColumn("p", lit("p1")))
      val served = GraftTable.load(spark, dir)
      val viewServed = fsView(served)
      val snapServed = served.snapshot().select("id", "v")
        .as[(Long, Long)].collect().toSet
      // force the JSON fold by hiding the metadata dir
      val md = Paths.get(dir, ".graft", "metadata")
      val hidden = Paths.get(dir, ".graft", "metadata_hidden")
      Files.move(md, hidden)
      val json = GraftTable.load(spark, dir)
      assert(fsView(json) === viewServed, "slice views diverge")
      assert(json.snapshot().select("id", "v").as[(Long, Long)]
        .collect().toSet === snapServed, "snapshots diverge")
      Files.move(hidden, md)
      GraftTable.drop(dir)
    }

  test("cold listing reads parquet segments, not N JSON file lists") {
    val dir = tmp()
    val t = build(dir, CopyOnWrite)
    for (i <- 0 until 6) t.upsert(batch(40 + i * 5, 5))
    assert(t.archive(keepLast = 3) > 0) // manifest-backed checkpoint
    t.syncMetadataTable() // covers everything incl. the checkpoint
    t.upsert(batch(200, 5)) // exactly one post-sync commit
    val expected = t.snapshot().select("id", "v").as[(Long, Long)].collect().toSet

    val cold = GraftTable.load(spark, dir)
    assert(cold.slices(None).nonEmpty)
    // the ONLY JSON bodies parsed are the post-sync commit(s); the
    // checkpoint's manifest is never touched — the listing came from
    // metadata-table parquet
    assert(cold.timeline.jsonMetaReads <= 1,
      s"cold listing parsed ${cold.timeline.jsonMetaReads} JSON metas")
    assert(cold.timeline.manifestLoads === 0,
      "cold listing hydrated the checkpoint manifest")
    assert(cold.snapshot().select("id", "v").as[(Long, Long)]
      .collect().toSet === expected)
    GraftTable.drop(dir)
  }

  test("second sync appends an O(commit) delta segment; base untouched") {
    val dir = tmp()
    val t = build(dir, CopyOnWrite)
    t.syncMetadataTable()
    val Seq(base) = segDirs(dir)
    // a commit, then an incremental sync
    t.upsert(batch(100, 4).withColumn("p", lit("p0")))
    t.syncMetadataTable()
    val after = segDirs(dir)
    assert(after.size === 2 && after.contains(base), s"segments: $after")
    val delta = after.filterNot(_ == base).head
    val deltaRows = spark.read.parquet(
      Paths.get(dir, ".graft", "metadata", "files", delta).toString)
    // the delta carries exactly the new commit's records: its file(s) plus
    // tombstones for the group(s) the COW upsert rewrote — never a
    // re-export of the table
    val total = deltaRows.count()
    assert(total > 0 && total <= 8, s"delta has $total rows")
    assert(deltaRows.filter(col("kind") === "file").count() >= 1)
    // a sync with nothing new appends nothing
    t.syncMetadataTable()
    assert(segDirs(dir) === after)
    // the table keeps answering identically through the delta
    assert(t.snapshot().filter(col("id") >= 100L && col("id") < 104L).count() === 4)
    GraftTable.drop(dir)
  }

  test("rollback makes segments stale: listings fail soft, next sync rebuilds") {
    val dir = tmp()
    val t = build(dir, CopyOnWrite)
    t.upsert(batch(60, 5))
    t.syncMetadataTable()
    val before = segDirs(dir).size
    t.rollback() // the covered head commit leaves the timeline
    // fail-soft: the JSON fold serves; ids 60..64 are gone
    val t2 = GraftTable.load(spark, dir)
    assert(t2.snapshot().filter(col("id") >= 60L).count() === 0)
    // resync detects staleness and rebuilds one fresh base
    t2.syncMetadataTable()
    val rebuilt = segDirs(dir)
    assert(rebuilt.size === 1 && !(segDirs(dir).size == before &&
      rebuilt.forall(s => segDirs(dir).contains(s)) && before != 1))
    val t3 = GraftTable.load(spark, dir)
    assert(t3.snapshot().filter(col("id") >= 60L).count() === 0)
    assert(fsView(t3) === fsView(t2))
    GraftTable.drop(dir)
  }

  test("archive-before-sync: uncovered folded commits replay into the segments") {
    val dir = tmp()
    val t = build(dir, CopyOnWrite)
    t.syncMetadataTable() // base covers the first three commits
    // commits the sync never sees before they get archived — including a
    // replacecommit whose replaced-group TOMBSTONES matter: if the
    // checkpoint is skipped as zero rows, these adds and tombstones are
    // silently dropped from the segments (resurrected groups / lost rows)
    t.upsert(batch(50, 6))
    t.insertOverwrite(batch(400, 6).withColumn("p", lit("p2")))
    t.upsert(batch(60, 4))
    assert(t.archive(keepLast = 1) > 0) // folds the uncovered commits
    t.syncMetadataTable()
    val expected = t.snapshot().select("id", "v").as[(Long, Long)].collect().toSet
    val expectedView = fsView(t)
    val cold = GraftTable.load(spark, dir)
    assert(cold.snapshot().select("id", "v").as[(Long, Long)]
      .collect().toSet === expected)
    // the listing came from the SEGMENTS: a fail-soft JSON fold would have
    // had to hydrate the checkpoint's manifest
    assert(cold.timeline.manifestLoads === 0,
      "cold listing fell back to the JSON fold (manifest hydrated)")
    assert(fsView(cold) === expectedView)
    // and the pure segment fold (no JSON supplement) agrees on live groups
    val mdtGroups = cold.metadataTable().select("partition", "file_id")
      .as[(String, String)].collect().toSet
    val liveGroups = expectedView.map(v => (v._1, v._2))
    assert(liveGroups.subsetOf(mdtGroups),
      s"missing from segments: ${liveGroups -- mdtGroups}")
    GraftTable.drop(dir)
  }

  for (tt <- Seq(CopyOnWrite, MergeOnRead))
    test(s"partition-scoped lookup folds ONE partition's rows, not the table (${tt.name})") {
      val dir = tmp()
      // 8 partitions so the one-partition pin has teeth
      def wb(from: Int, n: Int) = (from until from + n)
        .map(i => (i.toLong, s"p${i % 8}", i * 2L)).toDF("id", "p", "v")
      val t = GraftTable.create(spark, dir, TableConfig("mdt_pr", tt,
        keyFields = Seq("id"), precombineField = Some("v"),
        partitioning = PartitionByColumns(Seq("p")), targetFileSizeRows = 10))
      t.bulkInsert(wb(0, 160))
      t.upsert(wb(40, 40).withColumn("v", col("v") + 1000))
      t.insertOverwrite(wb(500, 12).withColumn("p", lit("p2")))
      t.syncMetadataTable()
      t.upsert(wb(200, 16)) // post-sync JSON commits must prune too
      val want = t.snapshot(partitionPred = _ == "p=p1").select("id", "v")
        .as[(Long, Long)].collect().toSet
      assert(want.nonEmpty)

      // cold instance: nothing memoized — the pruned path must not fold
      // the full listing on the driver
      val cold = GraftTable.load(spark, dir)
      val pruned = cold.slicesPruned(_ == "p=p1")
      val foldedRows = cold.mdtRowsFolded
      val segTotal = spark.read.parquet(Paths.get(dir, ".graft", "metadata",
        "files").toString + "/seg_*").count()
      assert(foldedRows > 0, "pruned path did not serve from segments")
      assert(foldedRows * 4 <= segTotal,
        s"pruned lookup folded $foldedRows of $segTotal segment rows")
      // identical slices vs the full fold (projected: FileMeta holds
      // Array-typed col stats, which compare by reference)
      def skey(s: FileSlice) = (s.partition, s.fileId, s.baseInstant,
        s.baseFiles.map(_.path).sorted, s.logs.map(_._2.path).sorted)
      val full = cold.slices(None).filter(_.partition == "p=p1")
      assert(pruned.map(skey).sortBy(_.toString)
        === full.map(skey).sortBy(_.toString),
        "pruned fold diverges from the full fold")

      // a cold partition-filtered snapshot answers through the pruned path
      val cold2 = GraftTable.load(spark, dir)
      assert(cold2.snapshot(partitionPred = _ == "p=p1").select("id", "v")
        .as[(Long, Long)].collect().toSet === want)
      assert(cold2.mdtRowsFolded > 0 && cold2.mdtRowsFolded * 4 <= segTotal,
        s"cold snapshot folded ${cold2.mdtRowsFolded} of $segTotal rows")
      GraftTable.drop(dir)
    }

  test("compaction, clustering and archival stay correct through MDT-served listings") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("mdt_svc", MergeOnRead,
      keyFields = Seq("id"), precombineField = Some("v"),
      partitioning = PartitionByColumns(Seq("p")), targetFileSizeRows = 10))
    t.bulkInsert(batch(0, 30))
    t.syncMetadataTable()
    t.upsert(batch(5, 10).withColumn("v", col("v") + 500)) // MOR log
    val want = t.snapshot().select("id", "v").as[(Long, Long)].collect().toSet
    t.compact()
    assert(t.snapshot().select("id", "v").as[(Long, Long)].collect().toSet === want)
    t.syncMetadataTable() // cover the compaction replacecommit
    t.cluster(Seq("v"))
    assert(t.snapshot().select("id", "v").as[(Long, Long)].collect().toSet === want)
    t.archive(keepLast = 2)
    assert(t.snapshot().select("id", "v").as[(Long, Long)].collect().toSet === want)
    val cold = GraftTable.load(spark, dir)
    assert(cold.snapshot().select("id", "v").as[(Long, Long)].collect().toSet === want)
    GraftTable.drop(dir)
  }
}
