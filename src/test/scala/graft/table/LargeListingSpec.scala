package graft.table

import java.nio.file.Files
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Large-file-count posture: the closest local[] gets to the 100 TB
 * listing story. A table with thousands of file groups must (a) serve a
 * cold listing from metadata-table segments with O(post-sync) JSON
 * parses and zero manifest hydrations, (b) tag an upsert without folding
 * the JSON timeline, (c) archive through a DISTRIBUTED columnar manifest
 * that slim consumers never load, and (d) answer a one-partition lookup
 * by folding only that partition's rows. The group count is kept at 2k
 * to bound suite wall-clock; every pin scales with the count, not the
 * constant.
 */
class LargeListingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def skey(s: FileSlice) = (s.partition, s.fileId, s.baseInstant,
    s.baseFiles.map(_.path).sorted, s.logs.map(_._2.path).sorted)

  test("2k file groups: cold listings, tagging, archive and pruned lookups stay bounded") {
    val dir = Files.createTempDirectory("graft_large_").toString
    val n = 2000
    val parts = 50
    val t = GraftTable.create(spark, dir, TableConfig("large", CopyOnWrite,
      keyFields = Seq("id"), precombineField = Some("v"),
      partitioning = PartitionByColumns(Seq("p")),
      targetFileSizeRows = 1)) // one row per file group -> n groups
    t.bulkInsert((0 until n).map(i => (i.toLong, s"p${i % parts}", i.toLong))
      .toDF("id", "p", "v"))
    val groups = t.slices(None).size
    assert(groups >= n / 2, s"expected thousands of file groups, got $groups")
    t.syncMetadataTable()
    t.upsert(Seq((1L, "p1", 1000L), (51L, "p1", 1051L)).toDF("id", "p", "v"))

    // (a) cold listing: segments serve all n+ groups; the only JSON body
    // parsed is the post-sync upsert; no manifest exists yet to hydrate
    val cold = GraftTable.load(spark, dir)
    assert(cold.slices(None).size === groups)
    assert(cold.timeline.jsonMetaReads <= 2,
      s"cold listing parsed ${cold.timeline.jsonMetaReads} JSON metas for $n groups")
    assert(cold.timeline.manifestLoads === 0)

    // (b) tagging an upsert on the cold instance stays MDT-served: the
    // listing for the write comes from segments, not an O(commits) JSON
    // fold — and the whole write completes against n groups
    cold.upsert(Seq((2L, "p2", 2000L)).toDF("id", "p", "v"))
    assert(cold.timeline.jsonMetaReads <= 4,
      s"tagging folded JSON metas: ${cold.timeline.jsonMetaReads}")

    // (d) one-partition lookup folds ~n/parts rows, never the table
    val pruned = GraftTable.load(spark, dir)
    val oneP = pruned.slicesPruned(_ == "p=p3")
    assert(oneP.nonEmpty &&
      oneP.map(skey).sortBy(_.toString) ===
        pruned.slices(None).filter(_.partition == "p=p3")
          .map(skey).sortBy(_.toString))
    assert(pruned.mdtRowsFolded * parts <= 3L * groups,
      s"one-partition lookup folded ${pruned.mdtRowsFolded} of >=$groups rows")

    // (c) archive: the checkpoint carries ~n live files as a COLUMNAR
    // manifest (slim JSON stays O(schemas)); slim consumers (conflict
    // checks, schema folds) never hydrate it
    val t2 = GraftTable.load(spark, dir)
    t2.upsert(Seq((3L, "p3", 3000L)).toDF("id", "p", "v"))
    assert(t2.archive(keepLast = 1) > 0)
    val slimJson = Files.readAllBytes(java.nio.file.Paths.get(dir, ".graft",
      "timeline").toFile.listFiles()
      .filter(_.getName.endsWith(".json")).map(_.toPath)
      .maxBy(_.getFileName.toString)).length
    assert(slimJson < 64 * 1024,
      s"checkpoint JSON is $slimJson bytes — carried files not columnar?")
    val afterArch = GraftTable.load(spark, dir)
    assert(afterArch.snapshot(partitionPred = _ == "p=p1")
      .select("id").as[Long].collect().toSet.contains(51L))
    // resync covers the checkpoint; cold open keeps zero hydrations
    afterArch.syncMetadataTable()
    val cold2 = GraftTable.load(spark, dir)
    assert(cold2.slices(None).size >= groups)
    assert(cold2.timeline.manifestLoads === 0,
      "cold open after archive hydrated the checkpoint manifest")
    GraftTable.drop(dir)
  }

  test("1e5-row listing scale: pruned lookup O(matching), tagging bounded, archival manifest distributed") {
    val dir = Files.createTempDirectory("graft_xlarge_").toString
    val n = 100000
    val parts = 200
    val t = GraftTable.create(spark, dir, TableConfig("xlarge", CopyOnWrite,
      keyFields = Seq("id"), precombineField = Some("v"),
      partitioning = PartitionByColumns(Seq("p")),
      targetFileSizeRows = 1)) // ~1 row per file group -> ~6e4 groups
    t.bulkInsert((0 until n).map(i => (i.toLong, s"p${i % parts}", i.toLong))
      .toDF("id", "p", "v"))
    val groups = t.slices(None).size
    assert(groups >= n / 2, s"expected tens of thousands of file groups, got $groups")
    t.syncMetadataTable()
    assert(t.syncBloomMetadata() >= groups) // blooms into MDT segments

    // one-partition lookup folds ~groups/parts of the MDT rows, never the
    // table — the closest local[] proxy for a partition-pruned listing
    // over a 100 TB table's metadata
    val pruned = GraftTable.load(spark, dir)
    val oneP = pruned.slicesPruned(_ == "p=p7")
    assert(oneP.nonEmpty &&
      oneP.map(skey).sortBy(_.toString) ===
        pruned.slices(None).filter(_.partition == "p=p7")
          .map(skey).sortBy(_.toString))
    assert(pruned.mdtRowsFolded * parts <= 3L * groups,
      s"one-partition lookup folded ${pruned.mdtRowsFolded} of $groups rows")

    // upsert tagging against 1e5 groups: the cold instance serves the
    // write's listing from MDT segments (no O(commits) JSON fold), and the
    // write completes rewriting only its own file groups
    val cold = GraftTable.load(spark, dir)
    cold.upsert(Seq((7L, "p7", 777L), (207L, "p7", 978L)).toDF("id", "p", "v"))
    assert(cold.timeline.jsonMetaReads <= 4,
      s"tagging folded JSON metas: ${cold.timeline.jsonMetaReads}")
    assert(GraftTable.load(spark, dir).snapshot(partitionPred = _ == "p=p7")
      .filter(col("id") === 7L).select("v").as[Long].collect().toSeq ===
      Seq(777L))

    // the batched bloom lookup plan stays a semi-join (no literal IN list)
    // even at 1e5 candidate file names — the Catalyst planning cliff pin
    // at the full group count
    val candidates = (1 to n).map(i => s"f$i.parquet")
    val plan = cold.mdtBloomLookup(cold.bloomSegs(), candidates)
      .queryExecution.optimizedPlan
    val inLiterals = plan.expressions.flatMap(_.collect {
      case i: org.apache.spark.sql.catalyst.expressions.In => i.list.size
      case i: org.apache.spark.sql.catalyst.expressions.InSet => i.hset.size
    })
    assert(inLiterals.forall(_ < 100), s"literal IN list sizes: $inLiterals")

    // archival at 1e5 live files: the checkpoint manifest is columnar and
    // distributed; the slim JSON stays O(schemas), slim consumers never
    // hydrate the 1e5-row manifest
    assert(GraftTable.load(spark, dir).archive(keepLast = 1) > 0)
    val slimJson = Files.readAllBytes(java.nio.file.Paths.get(dir, ".graft",
      "timeline").toFile.listFiles()
      .filter(_.getName.endsWith(".json")).map(_.toPath)
      .maxBy(_.getFileName.toString)).length
    assert(slimJson < 64 * 1024,
      s"checkpoint JSON is $slimJson bytes — carried files not columnar?")
    // resync covers the checkpoint; the cold open then serves 6e4+ groups
    // with zero manifest hydrations
    GraftTable.load(spark, dir).syncMetadataTable()
    val cold2 = GraftTable.load(spark, dir)
    assert(cold2.slices(None).size >= groups)
    assert(cold2.timeline.manifestLoads === 0,
      "cold open after archive hydrated the checkpoint manifest")
    GraftTable.drop(dir)
  }
}
