package graft.catalog

import java.nio.file.{Files, Paths}
import graft.TestSpark
import graft.table.{GraftTable, KeyBloom}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** CREATE/DROP INDEX DDL (ref: hudi-spark/.../command/IndexCommands
  * .scala:28) over [[GraftV2Table]]'s SupportsIndex: backfilling bloom
  * sidecars for a table whose files predate bloom-on-write, and tagging
  * consulting them afterwards. */
class IndexDdlSpec extends AnyFunSuite {
  import TestSpark.spark

  private def sql(q: String) = spark.sql(q)

  test("CREATE INDEX backfills sidecars on a pre-bloom table; DROP INDEX removes them") {
    sql("DROP TABLE IF EXISTS graft.t_idx")
    // tiny files -> many groups; hash layout makes every key range span the
    // key space, so only blooms can prune
    sql("""CREATE TABLE graft.t_idx (id BIGINT, v STRING) USING graft
          |TBLPROPERTIES ('graft.recordkey.field' = 'id',
          |  'graft.precombine.field' = 'v',
          |  'graft.target.file.rows' = '50')""".stripMargin)
    val vals = (1 to 600).map(i => s"(${i}L, 'v$i')")
    sql(s"INSERT INTO graft.t_idx VALUES ${vals.mkString(", ")}")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/t_idx"

    // simulate a table written BEFORE bloom-on-write existed: drop every
    // sidecar and clear the hasBloom flags recorded in the timeline
    Files.walk(Paths.get(path)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".bloom"))
      .foreach(Files.deleteIfExists(_))
    Files.list(Paths.get(path, ".graft", "timeline")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json")).foreach { p =>
        val s = new String(Files.readAllBytes(p), "UTF-8")
        Files.write(p, s.replace("\"hasBloom\":true", "\"hasBloom\":false")
          .getBytes("UTF-8"))
      }
    val t0 = GraftTable.load(spark, path)
    val all = t0.slices(None)
    assert(all.size >= 8, s"need many groups, got ${all.size}")
    assert(all.forall(_.baseFiles.forall(!_.hasBloom)))

    def cands(t: GraftTable): Int = {
      import org.apache.spark.sql.functions._
      val probe = spark.range(1, 4).select(col("id"))
        .withColumn(GraftTable.KEY, col("id").cast("string"))
        .withColumn(GraftTable.PART, lit(""))
      t.candidateSlices(probe, t.slices(None)).size
    }
    // pre-index: ranges prune nothing, no blooms -> every slice is a candidate
    assert(cands(t0) === all.size, "expected range pruning to keep everything")

    sql("CREATE INDEX rk_bloom ON graft.t_idx (id)")
    val t1 = GraftTable.load(spark, path)
    assert(t1.bloomIndexName.contains("rk_bloom"))
    assert(all.flatMap(_.baseFiles).forall(f =>
      Files.isRegularFile(Paths.get(path, KeyBloom.sidecar(f.path)))),
      "backfill left files without sidecars")
    val pruned = cands(t1)
    assert(pruned < all.size / 2,
      s"blooms kept $pruned of ${all.size} candidates for 3 keys")
    // no false negatives: upserting existing keys must not duplicate
    sql("INSERT INTO graft.t_idx VALUES (1L, 'upd1'), (2L, 'upd2')")
    assert(sql("SELECT count(*) AS c FROM graft.t_idx").collect()(0).getLong(0) === 600)
    assert(sql("SELECT v FROM graft.t_idx WHERE id = 1").collect()(0)
      .getString(0) === "upd1")

    // duplicate CREATE INDEX is refused
    intercept[Exception] { sql("CREATE INDEX another ON graft.t_idx (id)") }
    // non-key columns are refused
    sql("DROP INDEX rk_bloom ON graft.t_idx")
    intercept[Exception] { sql("CREATE INDEX bad ON graft.t_idx (v)") }
    // DROP removed marker and sidecars
    val t2 = GraftTable.load(spark, path)
    assert(t2.bloomIndexName.isEmpty)
    assert(t2.slices(None).flatMap(_.baseFiles).forall(f =>
      !Files.isRegularFile(Paths.get(path, KeyBloom.sidecar(f.path)))))
    intercept[Exception] { sql("DROP INDEX rk_bloom ON graft.t_idx") }
    sql("DROP TABLE graft.t_idx")
  }
}
