package graft.table

import java.nio.file.{Files, Paths}
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Async metadata indexing (ref: HoodieIndexer, RFC-45 `indexing` action)
  * and the metadata-table blooms partition (ref: MetadataPartitionType
  * BLOOM_FILTERS): schedule pins the pre-bloom file set, run backfills
  * out-of-band, and tagging reads candidate blooms in one batched scan. */
class AsyncIndexSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_aidx_").toString

  /** Simulate files written before bloom-on-write: drop sidecars + clear
    * the recorded hasBloom flags (same trick as IndexDdlSpec). */
  private def stripBlooms(path: String): Unit = {
    Files.walk(Paths.get(path)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".bloom"))
      .foreach(Files.deleteIfExists(_))
    Files.list(Paths.get(path, ".graft", "timeline")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json")).foreach { p =>
        val s = new String(Files.readAllBytes(p), "UTF-8")
        Files.write(p, s.replace("\"hasBloom\":true", "\"hasBloom\":false")
          .getBytes("UTF-8"))
      }
  }

  private def sidecarCount(t: GraftTable): Int =
    t.slices(None).flatMap(_.baseFiles).count(f =>
      Files.isRegularFile(Paths.get(t.basePath, KeyBloom.sidecar(f.path))))

  private def mkTable(dir: String, n: Int = 300): GraftTable = {
    val t = GraftTable.create(spark, dir, TableConfig("aidx", CopyOnWrite,
      keyFields = Seq("id"), precombineField = Some("v"),
      targetFileSizeRows = 50))
    t.upsert((1 to n).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    t
  }

  test("schedule pins the pre-bloom set; run backfills it; interleaved files land in the next plan") {
    val dir = tmp()
    mkTable(dir)
    stripBlooms(dir)
    val t = GraftTable.load(spark, dir)
    val preBloom = t.slices(None).flatMap(_.baseFiles).map(_.path).toSet
    assert(preBloom.size >= 4)

    val plan = t.scheduleIndex().get
    // double-schedule returns None: every pre-bloom path is claimed
    assert(t.scheduleIndex().isEmpty, "paths double-claimed by a second plan")
    // interleaved write AFTER the plan, stripped so it needs indexing too
    t.upsert((1001 to 1100).map(i => (i.toLong, s"n$i")).toDF("id", "v"))
    stripBlooms(dir)
    val t2 = GraftTable.load(spark, dir)
    val allNow = t2.slices(None).flatMap(_.baseFiles).map(_.path).toSet
    assert(allNow.size > preBloom.size)

    assert(t2.runIndex(plan).nonEmpty)
    // exactly the PLANNED files got sidecars; interleaved ones are pending.
    // (upserted planned groups were rewritten -> gone from live; the
    // surviving planned paths must all be bloomed)
    val planned = preBloom.intersect(allNow)
    assert(planned.nonEmpty)
    planned.foreach { p =>
      assert(Files.isRegularFile(Paths.get(dir, KeyBloom.sidecar(p))),
        s"planned file $p not backfilled")
    }
    (allNow -- preBloom).foreach { p =>
      assert(!Files.isRegularFile(Paths.get(dir, KeyBloom.sidecar(p))),
        s"unplanned file $p was indexed by the old plan")
    }
    assert(t2.bloomIndexName.nonEmpty, "run must set the index marker")
    // a plan executes once
    intercept[IllegalArgumentException] { t2.runIndex(plan) }
    // the next plan picks up the interleaved files
    val plan2 = t2.scheduleIndex().get
    assert(t2.runIndex(plan2).nonEmpty)
    assert(sidecarCount(t2) === allNow.size, "second plan left files unindexed")
    // pendingPlans is empty again (show parity comes from the same data)
    assert(t2.pendingPlans().isEmpty)
    // drop index also clears the metadata-table blooms partition
    t2.syncBloomMetadata()
    assert(Files.isDirectory(t2.mdtBloomsDir))
    t2.dropBloomIndex()
    assert(!Files.isDirectory(t2.mdtBloomsDir))
    GraftTable.drop(dir)
  }

  test("CALL run_index schedule/run + show_indexing state transitions") {
    spark.sql("DROP TABLE IF EXISTS graft.t_aidx")
    spark.sql("""CREATE TABLE graft.t_aidx (id BIGINT, v STRING) USING graft
      |TBLPROPERTIES ('graft.recordkey.field' = 'id',
      |  'graft.precombine.field' = 'v',
      |  'graft.target.file.rows' = '50')""".stripMargin)
    val vals = (1 to 300).map(i => s"(${i}L, 'v$i')")
    spark.sql(s"INSERT INTO graft.t_aidx VALUES ${vals.mkString(", ")}")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/t_aidx"
    stripBlooms(path)
    val plan = spark.sql("CALL graft.run_index(table => 't_aidx', op => 'schedule')")
      .collect()(0).getString(0)
    assert(plan != null)
    val st1 = spark.sql("CALL graft.show_indexing(table => 't_aidx')").collect()
    assert(st1.length === 1 && st1(0).getString(1) === "REQUESTED")
    assert(st1(0).getInt(2) > 0, "planned file count missing")
    val ran = spark.sql(
      s"CALL graft.run_index(table => 't_aidx', op => 'run', instant => '$plan')")
      .collect()(0).getString(0)
    assert(ran != null)
    val st2 = spark.sql("CALL graft.show_indexing(table => 't_aidx')").collect()
    assert(st2.length === 1 && st2(0).getString(1) === "COMPLETED")
    assert(st2(0).getInt(3) === st2(0).getInt(2), "indexed != planned")
    // op => 'run' with nothing pending schedules+runs in one call; with
    // nothing to index at all it returns null
    val idle = spark.sql("CALL graft.run_index(table => 't_aidx', op => 'run')")
      .collect()(0)
    assert(idle.isNullAt(0))
    spark.sql("DROP TABLE graft.t_aidx")
  }

  test("metadata-table blooms: tagging prunes with every sidecar deleted (one batched read)") {
    val dir = tmp()
    val t = mkTable(dir, 600)
    val all = t.slices(None)
    assert(all.size >= 8)
    assert(all.forall(_.baseFiles.forall(_.hasBloom)))
    // fold sidecars into the metadata table, then DELETE every sidecar:
    // any successful bloom pruning afterwards can only have come from the
    // single batched metadata read — zero per-file opens
    assert(t.syncBloomMetadata() === all.flatMap(_.baseFiles).size)
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".bloom"))
      .foreach(Files.deleteIfExists(_))
    def cands(probeKeys: Seq[Long]): Int = {
      val probe = probeKeys.toDF("id")
        .withColumn(GraftTable.KEY, col("id").cast("string"))
        .withColumn(GraftTable.PART, lit(""))
      t.candidateSlices(probe, t.slices(None)).size
    }
    val pruned = cands(Seq(1L, 2L, 3L))
    assert(pruned < all.size / 2,
      s"MDT blooms kept $pruned of ${all.size} candidates for 3 keys")
    // no false negatives through the MDT path: upsert replaces, not dupes
    t.upsert(Seq((1L, "upd1"), (2L, "upd2")).toDF("id", "v"))
    assert(t.snapshot().count() === 600)
    assert(t.snapshot().filter(col("id") === 1).select("v")
      .as[String].collect().toSeq === Seq("upd1"))
    GraftTable.drop(dir)
  }

  test("flat pre-segment bloom layout is migrated, not orphaned") {
    val dir = tmp()
    val t = mkTable(dir, 300)
    // simulate the OLD layout: flat parquet (+ _SUCCESS) directly under the
    // blooms dir, no seg_* subdirectories — bloomSegs() can't see these
    val bd = Paths.get(dir, ".graft", "metadata", "blooms")
    Files.createDirectories(bd)
    Files.write(bd.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
    Files.write(bd.resolve("_SUCCESS"), Array.emptyByteArray)
    assert(t.bloomSegs().isEmpty)
    val n = t.syncBloomMetadata()
    assert(n === t.slices(None).flatMap(_.baseFiles).count(_.hasBloom))
    // the flat files are gone (migrated into a proper segment), nothing
    // orphaned alongside the seg_ dirs
    val flat = Files.list(bd).iterator().asScala
      .filter(Files.isRegularFile(_)).map(_.getFileName.toString).toSeq
    assert(flat.isEmpty, s"orphaned flat files: $flat")
    assert(t.bloomSegs().size === 1)
    GraftTable.drop(dir)
  }

  test("bloom metadata sync is incremental: new files append a segment, old segments untouched") {
    val dir = tmp()
    val t = mkTable(dir, 300)
    val nFiles = t.slices(None).flatMap(_.baseFiles).size
    assert(t.syncBloomMetadata() === nFiles) // first sync folds everything
    val segsBefore = t.bloomSegs().map(_.getFileName.toString)
    assert(segsBefore.size === 1)
    // nothing new -> nothing written
    assert(t.syncBloomMetadata() === 0)
    assert(t.bloomSegs().map(_.getFileName.toString) === segsBefore)
    // new commit -> only ITS files are folded, as a fresh segment
    t.upsert((1000 until 1050).map(i => (i.toLong, s"n$i")).toDF("id", "v"))
    val nowFiles = t.slices(None).flatMap(_.baseFiles)
      .filter(_.hasBloom).size
    val appended = t.syncBloomMetadata()
    assert(appended > 0 && appended <= nowFiles - nFiles + 2,
      s"incremental sync folded $appended files (had $nFiles, now $nowFiles)")
    val segsAfter = t.bloomSegs().map(_.getFileName.toString)
    assert(segsAfter.size === 2 && segsBefore.forall(segsAfter.contains))
    GraftTable.drop(dir)
  }

  test("bloom candidate lookup plan carries no literal list proportional to candidates") {
    val dir = tmp()
    val t = mkTable(dir, 100)
    t.syncBloomMetadata()
    val candidates = (1 to 20000).map(i => s"f$i.parquet")
    val plan = t.mdtBloomLookup(t.bloomSegs(), candidates)
      .queryExecution.optimizedPlan
    // the candidate set reaches the scan as a broadcast join relation, not
    // as a 20k-literal In() predicate (the Catalyst planning cliff)
    val inLiterals = plan.expressions.flatMap(_.collect {
      case i: org.apache.spark.sql.catalyst.expressions.In => i.list.size
      case i: org.apache.spark.sql.catalyst.expressions.InSet => i.hset.size
    })
    assert(inLiterals.forall(_ < 100), s"literal IN list sizes: $inLiterals")
    assert(plan.toString.contains("Join LeftSemi"), plan.toString.take(500))
    GraftTable.drop(dir)
  }
}
