package graft.table

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Columnar checkpoint manifests: the archival checkpoint stores its
  * carried file set as parquet (ref: hudi's metadata-table principle —
  * no monolithic driver-parsed listing document), the JSON meta keeps a
  * pointer, and slim consumers never load it. */
class ManifestSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_manifest_").toString

  private def build(dir: String): GraftTable = {
    val t = GraftTable.create(spark, dir, TableConfig("mft", CopyOnWrite,
      keyFields = Seq("id"), partitioning = PartitionByColumns(Seq("p")),
      targetFileSizeRows = 10))
    def batch(from: Int, n: Int) = (from until from + n)
      .map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "p", "v")
    t.bulkInsert(batch(0, 40))
    t.upsert(batch(10, 10).withColumn("v", col("v") + 1000))
    t.upsert(batch(50, 10))
    t.delete(batch(0, 5))
    t
  }

  test("archival writes a parquet manifest; the checkpoint JSON carries no file list") {
    val dir = tmp()
    val t = build(dir)
    val expected = t.snapshot().select("id", "v").as[(Long, Long)].collect().toSet
    assert(t.archive(keepLast = 1) > 0)
    val tl = Paths.get(dir, ".graft", "timeline")
    val ckptJson = Files.list(tl).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".commit.json"))
      .map(p => (p, new String(Files.readAllBytes(p), "UTF-8")))
      .filter(_._2.contains("\"checkpoint\""))
    assert(ckptJson.size === 1)
    val (jsonPath, json) = ckptJson.head
    val instant = jsonPath.getFileName.toString.split('.')(0)
    assert(json.contains("\"manifest\""), "checkpoint lacks manifest pointer")
    assert(json.contains("\"files\":[]"),
      "checkpoint JSON still inlines the carried file set")
    assert(json.length < 64 * 1024, s"slim checkpoint is ${json.length}B")
    val manifestDir = Paths.get(dir, ".graft", "timeline", "manifests", instant)
    assert(Files.isDirectory(manifestDir), "no manifest parquet written")
    // the manifest round-trips full FileMeta fidelity
    val m = spark.read.parquet(manifestDir.toString)
    assert(m.columns.toSet === Set("path", "fileId", "partition", "rows",
      "isLog", "bytes", "keyMin", "keyMax", "colStats", "origInstant",
      "external", "hasBloom"))
    assert(m.count() > 0)
    // snapshot unchanged through archival
    assert(t.snapshot().select("id", "v").as[(Long, Long)].collect().toSet === expected)
    GraftTable.drop(dir)
  }

  test("cold open: slim consumers never hydrate; slices loads the manifest once") {
    val dir = tmp()
    val t = build(dir)
    val expected = t.snapshot().select("id", "v").as[(Long, Long)].collect().toSet
    val boundaryTravel = {
      t.timeline.refresh()
      t.timeline.completed().map(_._1).dropRight(1).last
    }
    assert(t.archive(keepLast = 2) > 0)
    val travelExpected = t.snapshot(asOf = Some(boundaryTravel))
      .select("id", "v").as[(Long, Long)].collect().toSet

    // COLD instance: schema + checkpoint-watermark reads stay slim
    val t2 = GraftTable.load(spark, dir)
    assert(t2.schemaAt(None).nonEmpty)
    graft.streaming.ContinuousIngest.lastCheckpoint(t2)
    assert(t2.timeline.manifestLoads === 0,
      "slim consumers hydrated the checkpoint manifest")
    // listing hydrates the manifest exactly once, then memoizes
    assert(t2.snapshot().select("id", "v").as[(Long, Long)].collect().toSet === expected)
    assert(t2.timeline.manifestLoads === 1)
    t2.snapshot().count()
    assert(t2.timeline.manifestLoads === 1, "manifest re-read on every listing")
    // time travel into the carried window still works cold
    assert(t2.snapshot(asOf = Some(boundaryTravel))
      .select("id", "v").as[(Long, Long)].collect().toSet === travelExpected)
    GraftTable.drop(dir)
  }

  test("writes on top of a manifest-backed checkpoint keep merging correctly") {
    val dir = tmp()
    val t = build(dir)
    assert(t.archive(keepLast = 1) > 0)
    val t2 = GraftTable.load(spark, dir)
    t2.upsert(Seq((12L, "p0", 9999L)).toDF("id", "p", "v"))
    val snap = t2.snapshot()
    assert(snap.filter(col("id") === 12L).select("v").as[Long].collect().toSeq === Seq(9999L))
    // re-archival folds the manifest-backed checkpoint into a new one
    assert(t2.archive(keepLast = 1) > 0)
    val t3 = GraftTable.load(spark, dir)
    assert(t3.snapshot().filter(col("id") === 12L).select("v").as[Long]
      .collect().toSeq === Seq(9999L))
    assert(t3.snapshot().count() === snap.count())
    GraftTable.drop(dir)
  }
}
