package graft.table

import java.nio.file.Files
import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Debezium envelope image used across tests (top-level for the encoder). */
case class DbzImg(id: Long, v: String)

/** Debezium-shaped CDC ingest: op/before/after envelopes applied with
  * LSN ordering over an event_time MOR table must converge to the source
  * state under out-of-order replay. */
class DebeziumIngestSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_dbz_").toString

  private def mk(dir: String): GraftTable =
    GraftTable.create(spark, dir, TableConfig("dbz", MergeOnRead,
      keyFields = Seq("id"), precombineField = Some("lsn"),
      payload = EventTimeOrdered))

  private def env(rows: Seq[(String, Option[DbzImg], Option[DbzImg], Long)]) =
    rows.toDF("op", "before", "after", "lsn")

  test("out-of-order replay incl. delete-then-reinsert converges to source state") {
    val dir = tmp()
    val t = mk(dir)
    // source truth: k1: c(v1,1) u(v2,2) d(3) c(v3,4) → alive as v3
    //               k2: c(w1,5) u(w2,6)             → alive as w2
    //               k3: c(x1,7) d(8)                → deleted
    // replayed scrambled across batches:
    DebeziumIngest(t, env(Seq(
      ("c", None, Some(DbzImg(1, "v1")), 1L),
      ("c", None, Some(DbzImg(2, "w1")), 5L))))
    // reinsert (lsn 4) and the OLDER update (lsn 2) in one batch: the
    // batch precombine must pick lsn 4
    DebeziumIngest(t, env(Seq(
      ("c", None, Some(DbzImg(1, "v3")), 4L),
      ("u", Some(DbzImg(1, "v1")), Some(DbzImg(1, "v2")), 2L),
      ("c", None, Some(DbzImg(3, "x1")), 7L))))
    // the delete (lsn 3) arrives AFTER the reinsert it preceded at the
    // source — it must LOSE against the stored lsn-4 row
    DebeziumIngest(t, env(Seq(
      ("d", Some(DbzImg(1, "v2")), None, 3L),
      ("d", Some(DbzImg(3, "x1")), None, 8L),
      ("u", Some(DbzImg(2, "w1")), Some(DbzImg(2, "w2")), 6L))))
    // a stale update older than everything stored changes nothing
    DebeziumIngest(t, env(Seq(
      ("u", Some(DbzImg(2, "w1")), Some(DbzImg(2, "w0")), 4L))))
    val state = t.snapshot().select("id", "v", "lsn").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(state === Seq((1L, "v3", 4L), (2L, "w2", 6L)),
      s"converged to $state")
    // compaction folds the log history without changing the answer
    t.compact()
    assert(t.snapshot().select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ===
      Seq((1L, "v3"), (2L, "w2")))
    GraftTable.drop(dir)
  }

  test("snapshot reads, tombstone-only batches, and guardrails") {
    val dir = tmp()
    val t = mk(dir)
    // 'r' (snapshot read) rows upsert like creates
    assert(DebeziumIngest(t, env(Seq(
      ("r", None, Some(DbzImg(10, "s1")), 1L)))).nonEmpty)
    // Kafka-compaction tombstones (both images null) are dropped; a batch
    // of only tombstones commits nothing
    assert(DebeziumIngest(t, env(Seq(("d", None, None, 2L)))).isEmpty)
    assert(t.snapshot().count() === 1)
    // unknown ops fail the batch
    intercept[Exception] {
      DebeziumIngest(t, env(Seq(("z", None, Some(DbzImg(11, "bad")), 3L)))) }
    // misconfigured tables are rejected up front
    val plain = GraftTable.create(spark, tmp(), TableConfig("plain", MergeOnRead,
      keyFields = Seq("id"), precombineField = Some("lsn")))
    intercept[IllegalArgumentException] {
      DebeziumIngest(plain, env(Seq(("c", None, Some(DbzImg(1, "a")), 1L)))) }
    val wrongPc = GraftTable.create(spark, tmp(), TableConfig("wpc", MergeOnRead,
      keyFields = Seq("id"), precombineField = Some("v"),
      payload = EventTimeOrdered))
    intercept[IllegalArgumentException] {
      DebeziumIngest(wrongPc, env(Seq(("c", None, Some(DbzImg(1, "a")), 1L)))) }
    GraftTable.drop(dir)
  }

  test("AWS DMS Op-column ingest: full-load, I/U/D, Op never lands") {
    val dir = tmp()
    // DMS ships full images; arrival order (OverwriteLatest) as in the ref
    val t = GraftTable.create(spark, dir, TableConfig("dms", CopyOnWrite,
      keyFields = Seq("id")))
    def rows(rs: (Long, String, String)*) =
      rs.toDF("id", "v", "Op")
    // initial full load: empty/null Op upserts
    DebeziumIngest.applyDms(t, Seq((1L, "a", null.asInstanceOf[String]),
      (2L, "b", "")).toDF("id", "v", "Op"))
    // ongoing replication: insert, update, delete
    DebeziumIngest.applyDms(t, rows((3L, "c", "I"), (1L, "a2", "U")))
    DebeziumIngest.applyDms(t, rows((2L, "b", "D")))
    val state = t.snapshot().select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(state === Seq((1L, "a2"), (3L, "c")))
    // the Op column is consumed, not written
    assert(!t.snapshot().columns.contains("Op"))
    // delete-then-reinsert lands on the reinsert (arrival order)
    DebeziumIngest.applyDms(t, rows((2L, "b2", "I")))
    assert(t.snapshot().filter($"id" === 2L).select("v").collect()
      .map(_.getString(0)).toSeq === Seq("b2"))
    // unknown ops fail the batch; a missing Op column is rejected up front
    intercept[Exception] { DebeziumIngest.applyDms(t, rows((9L, "x", "Z"))) }
    intercept[IllegalArgumentException] {
      DebeziumIngest.applyDms(t, Seq((9L, "x")).toDF("id", "v")) }
    GraftTable.drop(dir)
  }

  test("Maxwell JSON ingest: table regex, DDL rows ignored, delete ts override") {
    import org.apache.spark.sql.types._
    val dir = tmp()
    // event-time ordering on update_time: a replayed stale delete must lose
    val t = GraftTable.create(spark, dir, TableConfig("maxw", MergeOnRead,
      keyFields = Seq("id"), precombineField = Some("update_time"),
      payload = EventTimeOrdered))
    val dataSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("update_time", StringType)))
    def mx(db: String, tbl: String, tpe: String, ts: Long, data: String) =
      s"""{"database":"$db","table":"$tbl","type":"$tpe","ts":$ts,"data":$data}"""
    def batch(recs: String*) = recs.toDF("value")

    // epoch base 1704067200 = 2024-01-01 00:00:00 UTC — envelope ts and
    // update_time strings stay one consistent clock, as in a real binlog
    val B = 1704067200L
    // inserts + an off-target table + a DDL row (ignored, not failed)
    DebeziumIngest.applyMaxwell(t, batch(
      mx("shop", "orders", "insert", B + 100,
        """{"id":1,"v":"a","update_time":"2024-01-01 00:01:40"}"""),
      mx("shop", "orders", "insert", B + 101,
        """{"id":2,"v":"b","update_time":"2024-01-01 00:01:41"}"""),
      mx("shop", "other", "insert", B + 102,
        """{"id":9,"v":"x","update_time":"2024-01-01 00:01:42"}"""),
      mx("shop", "orders", "table-create", B + 103, """{}""")),
      dataSchema, tableRegex = "orders", databaseRegex = Some("shop"))
    assert(t.snapshot().count() === 2)

    // update, then a DELETE whose image carries the STALE update_time —
    // the envelope ts (epoch seconds) must override it (date_string)
    DebeziumIngest.applyMaxwell(t, batch(
      mx("shop", "orders", "update", B + 200,
        """{"id":1,"v":"a2","update_time":"2024-01-01 00:03:20"}"""),
      mx("shop", "orders", "delete", B + 300,
        """{"id":2,"v":"b","update_time":"2024-01-01 00:01:41"}""")),
      dataSchema, tableRegex = "orders")
    val st = t.snapshot().select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(st === Seq((1L, "a2")))
    // the delete's recorded update_time is the RENDERED envelope ts
    // ("2024-01-01 00:05:00"), so a replayed image OLDER than the delete
    // loses (event-time ordering)...
    DebeziumIngest.applyMaxwell(t, batch(
      mx("shop", "orders", "insert", B + 150,
        """{"id":2,"v":"stale","update_time":"2024-01-01 00:02:30"}""")),
      dataSchema, tableRegex = "orders")
    assert(t.snapshot().filter($"id" === 2L).count() === 0,
      "stale replayed image resurrected a deleted row")
    // ...while a genuinely newer reinsert wins
    DebeziumIngest.applyMaxwell(t, batch(
      mx("shop", "orders", "insert", B + 400,
        """{"id":2,"v":"fresh","update_time":"2024-01-01 00:06:40"}""")),
      dataSchema, tableRegex = "orders")
    assert(t.snapshot().filter($"id" === 2L).select("v").collect()
      .map(_.getString(0)).toSeq === Seq("fresh"))

    // epoch_millis precombine type: ts*1000 overrides on delete
    val dir2 = tmp()
    val t2 = GraftTable.create(spark, dir2, TableConfig("maxw2", MergeOnRead,
      keyFields = Seq("id"), precombineField = Some("update_time"),
      payload = EventTimeOrdered))
    val ms = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("update_time", LongType)))
    DebeziumIngest.applyMaxwell(t2, batch(
      mx("d", "t", "insert", 1, """{"id":1,"v":"a","update_time":5000}""")),
      ms, tableRegex = "t", precombineType = "epoch_millis")
    DebeziumIngest.applyMaxwell(t2, batch(
      mx("d", "t", "delete", 9, """{"id":1,"v":"a","update_time":5000}""")),
      ms, tableRegex = "t", precombineType = "epoch_millis")
    assert(t2.snapshot().count() === 0)
    // delete recorded at ts*1000 = 9000 > 5000: stale replay loses
    DebeziumIngest.applyMaxwell(t2, batch(
      mx("d", "t", "insert", 2, """{"id":1,"v":"old","update_time":7000}""")),
      ms, tableRegex = "t", precombineType = "epoch_millis")
    assert(t2.snapshot().count() === 0)
    GraftTable.drop(dir); GraftTable.drop(dir2)
  }
}
