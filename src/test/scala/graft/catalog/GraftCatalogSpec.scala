package graft.catalog

import graft.TestSpark
import graft.table.GraftTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-string surface over catalog-identified graft tables: CREATE TABLE
  * (AS SELECT), INSERT INTO/OVERWRITE, SELECT (fast path), and the
  * row-level MERGE INTO / UPDATE / DELETE commands. */
class GraftCatalogSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def sql(q: String) = spark.sql(q)

  private def fresh(name: String): String = {
    sql(s"DROP TABLE IF EXISTS graft.$name")
    name
  }

  private def createOrders(name: String, rows: Int = 20): Unit = {
    sql(s"""CREATE TABLE graft.$name (
           |  id BIGINT, status STRING, price DOUBLE, note STRING)
           |USING graft PARTITIONED BY (status)
           |TBLPROPERTIES (
           |  'graft.recordkey.field' = 'id',
           |  'graft.precombine.field' = 'price')""".stripMargin)
    val vals = (1 to rows).map(i =>
      s"(${i}L, '${if (i % 2 == 0) "O" else "F"}', ${i * 10}.0, 'n$i')")
    sql(s"INSERT INTO graft.$name VALUES ${vals.mkString(", ")}")
  }

  test("CREATE TABLE + INSERT INTO + SELECT round trip; data-only schema") {
    val n = fresh("t_basic")
    createOrders(n)
    val back = sql(s"SELECT * FROM graft.$n")
    assert(back.count() === 20)
    // SQL surface exposes the logical schema only — no meta columns
    assert(back.columns.toSeq === Seq("id", "status", "price", "note"))
    assert(sql(s"SELECT sum(id) AS s FROM graft.$n").collect()(0).getLong(0) === 210)
    // INSERT INTO with precombine = upsert: same key replaces
    sql(s"INSERT INTO graft.$n VALUES (1L, 'F', 999.0, 'replaced')")
    assert(sql(s"SELECT count(*) AS c FROM graft.$n").collect()(0).getLong(0) === 20)
    assert(sql(s"SELECT note FROM graft.$n WHERE id = 1").collect()(0).getString(0) === "replaced")
  }

  test("SELECT through the catalog takes the native fast path with pushdown") {
    val n = fresh("t_plan")
    createOrders(n)
    val q = sql(s"SELECT id, price FROM graft.$n WHERE id = 7")
    val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("GraftFileIndex"), "catalog read missed the fast path:\n" + p)
    assert(p.contains("PushedFilters:") && p.contains("EqualTo(id,7)"),
      "filter not pushed through the catalog read:\n" + p)
    assert(q.collect() === Array(Row(7L, 70.0)))
  }

  test("UPDATE ... SET ... WHERE via literal SQL") {
    val n = fresh("t_upd")
    createOrders(n)
    sql(s"UPDATE graft.$n SET price = price * 2, note = 'bumped' WHERE id <= 3")
    val rows = sql(s"SELECT id, price, note FROM graft.$n WHERE id <= 4 ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq ===
      Seq((1L, 20.0, "bumped"), (2L, 40.0, "bumped"), (3L, 60.0, "bumped"), (4L, 40.0, "n4")))
    // key / partition columns are immutable
    intercept[Exception] { sql(s"UPDATE graft.$n SET id = id + 1 WHERE id = 9") }
    intercept[Exception] { sql(s"UPDATE graft.$n SET status = 'X' WHERE id = 9") }
  }

  test("DELETE FROM ... WHERE via literal SQL") {
    val n = fresh("t_del")
    createOrders(n)
    sql(s"DELETE FROM graft.$n WHERE id % 5 = 0")
    assert(sql(s"SELECT count(*) AS c FROM graft.$n").collect()(0).getLong(0) === 16)
    assert(sql(s"SELECT count(*) AS c FROM graft.$n WHERE id % 5 = 0")
      .collect()(0).getLong(0) === 0)
  }

  test("MERGE INTO: update with inheritance, delete, conditional insert, clause order") {
    val n = fresh("t_merge")
    createOrders(n)
    // source: updates for 1..4 (with odd/even split), delete for 10, new keys 21/22
    Seq(
      (1L, "F", 111.0, "m1"), (2L, "O", 222.0, "m2"),
      (3L, "F", 333.0, "m3"), (4L, "O", 444.0, "m4"),
      (10L, "O", 0.0, "kill"),
      (21L, "F", 210.0, "new21"), (22L, "O", 220.0, "skipped-by-cond")
    ).toDF("id", "status", "price", "note").createOrReplaceTempView("merge_src")
    sql(s"""MERGE INTO graft.$n t USING merge_src s ON t.id = s.id
           |WHEN MATCHED AND s.note = 'kill' THEN DELETE
           |WHEN MATCHED AND s.id % 2 = 1 THEN UPDATE SET price = s.price
           |WHEN MATCHED THEN UPDATE SET price = s.price + 0.5, note = s.note
           |WHEN NOT MATCHED AND s.id <= 21 THEN INSERT *""".stripMargin)
    val got = sql(s"SELECT id, price, note FROM graft.$n WHERE id IN (1,2,3,4,10,21,22) ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got === Seq(
      (1L, 111.0, "n1"),   // first-wins: odd clause updates price only, note inherited
      (2L, 222.5, "m2"),   // even clause: price+0.5, note replaced
      (3L, 333.0, "n3"),
      (4L, 444.5, "m4"),
      (21L, 210.0, "new21"))) // 10 deleted, 22 failed insert condition
    assert(sql(s"SELECT count(*) AS c FROM graft.$n").collect()(0).getLong(0) === 20)
  }

  test("MERGE INTO: NOT MATCHED BY SOURCE update and delete") {
    val n = fresh("t_merge_nbs")
    createOrders(n, rows = 6)
    Seq((1L, "F", 1.0), (2L, "O", 2.0)).toDF("id", "status", "price")
      .createOrReplaceTempView("nbs_src")
    sql(s"""MERGE INTO graft.$n t USING nbs_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET price = s.price
           |WHEN NOT MATCHED BY SOURCE AND t.id >= 6 THEN DELETE
           |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET note = 'untouched'""".stripMargin)
    val got = sql(s"SELECT id, price, note FROM graft.$n ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got === Seq(
      (1L, 1.0, "n1"), (2L, 2.0, "n2"),
      (3L, 30.0, "untouched"), (4L, 40.0, "untouched"), (5L, 50.0, "untouched")))
  }

  test("MERGE INTO scans the target snapshot exactly once") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def scansOf(mergeSql: String): (GraftMergeCommand, Int) = {
      val parsed = spark.sessionState.sqlParser.parsePlan(mergeSql)
      // analysis only — the command must NOT run, we inspect its batch plan
      val cmd = spark.sessionState.executePlan(parsed).analyzed.collectFirst {
        case c: GraftMergeCommand => c
      }.getOrElse(fail("MERGE did not resolve to GraftMergeCommand"))
      val batch = cmd.classify(spark)._3
      val scans = batch.queryExecution.analyzed.collect {
        case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] &&
          l.relation.asInstanceOf[HadoopFsRelation].location.rootPaths
            .exists(_.toString.contains(cmd.path)) => l
      }
      (cmd, scans.size)
    }
    val n = fresh("t_onescan")
    createOrders(n)
    Seq("s1" -> (1 to 5), "s2" -> (18 to 25)).foreach { case (v, r) =>
      r.map(i => (i.toLong, if (i % 2 == 0) "O" else "F", i * 100.0, s"m$i"))
        .toDF("id", "status", "price", "note").createOrReplaceTempView(v)
    }
    // matched + not-matched clauses: pruned candidate scan, still ONE
    val (_, nA) = scansOf(
      s"""MERGE INTO graft.$n t USING s1 s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET price = s.price
         |WHEN NOT MATCHED THEN INSERT (id, status, price, note)
         |  VALUES (s.id, s.status, s.price, s.note)""".stripMargin)
    assert(nA === 1, s"matched/not-matched MERGE scanned the snapshot $nA times")
    // NOT MATCHED BY SOURCE forces the full snapshot — still ONE scan
    val (_, nB) = scansOf(
      s"""MERGE INTO graft.$n t USING s2 s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET price = s.price
         |WHEN NOT MATCHED THEN INSERT (id, status, price, note)
         |  VALUES (s.id, s.status, s.price, s.note)
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(nB === 1, s"by-source MERGE scanned the snapshot $nB times")
  }

  test("MERGE INTO requires key equality in ON") {
    val n = fresh("t_merge_bad")
    createOrders(n, rows = 3)
    Seq((1L, 5.0)).toDF("id", "price").createOrReplaceTempView("bad_src")
    val e = intercept[Exception] {
      sql(s"""MERGE INTO graft.$n t USING bad_src s ON t.price = s.price
             |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e.getMessage.contains("key"))
  }

  test("SQL time travel: VERSION AS OF reads the old state, DML on it is rejected") {
    val n = fresh("t_tt")
    createOrders(n, rows = 4)
    val v1 = GraftTable.load(spark, s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/$n")
      .timeline.completed().last._1
    sql(s"UPDATE graft.$n SET price = 0.0 WHERE id = 1")
    assert(sql(s"SELECT price FROM graft.$n WHERE id = 1").collect()(0).getDouble(0) === 0.0)
    val old = sql(s"SELECT price FROM graft.$n VERSION AS OF '$v1' WHERE id = 1")
    assert(old.collect()(0).getDouble(0) === 10.0)
    intercept[Exception] {
      sql(s"DELETE FROM graft.$n VERSION AS OF '$v1' WHERE id = 1")
    }
    GraftTable.drop(s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/$n")
  }

  test("CREATE TABLE AS SELECT, INSERT OVERWRITE") {
    val n = fresh("t_ctas")
    createOrders(n, rows = 10)
    val c = fresh("t_ctas_out")
    sql(s"""CREATE TABLE graft.$c USING graft
           |TBLPROPERTIES ('graft.recordkey.field' = 'id')
           |AS SELECT id, price FROM graft.$n WHERE id <= 4""".stripMargin)
    assert(sql(s"SELECT count(*) AS c FROM graft.$c").collect()(0).getLong(0) === 4)
    sql(s"INSERT OVERWRITE graft.$c SELECT id, price FROM graft.$n WHERE id > 8")
    assert(sql(s"SELECT sum(id) AS s FROM graft.$c").collect()(0).getLong(0) === 19)
  }

  test("SHOW PARTITIONS / ALTER TABLE DROP PARTITION / TRUNCATE TABLE as literal SQL") {
    val n = fresh("t_partddl")
    createOrders(n)
    val parts = sql(s"SHOW PARTITIONS graft.$n").collect().map(_.getString(0)).sorted
    assert(parts.toSeq === Seq("status=F", "status=O"))
    sql(s"ALTER TABLE graft.$n DROP PARTITION (status='F')")
    assert(sql(s"SELECT count(*) AS c FROM graft.$n").collect()(0).getLong(0) === 10)
    assert(sql(s"SHOW PARTITIONS graft.$n").collect().map(_.getString(0)).toSeq
      === Seq("status=O"))
    // IF EXISTS tolerates a missing partition; without it the drop errors
    sql(s"ALTER TABLE graft.$n DROP IF EXISTS PARTITION (status='Z')")
    intercept[Exception] { sql(s"ALTER TABLE graft.$n DROP PARTITION (status='Z')") }
    sql(s"TRUNCATE TABLE graft.$n")
    assert(sql(s"SELECT count(*) AS c FROM graft.$n").collect()(0).getLong(0) === 0)
    // still writable after truncate
    sql(s"INSERT INTO graft.$n VALUES (100, 'O', 1.0, 'post')")
    assert(sql(s"SELECT note FROM graft.$n").collect().map(_.getString(0)).toSeq
      === Seq("post"))
  }

  test("ALTER TABLE ADD COLUMNS: schema-only commit, old rows read null") {
    val n = fresh("t_alter_add")
    createOrders(n, rows = 4)
    sql(s"ALTER TABLE graft.$n ADD COLUMNS (score DOUBLE, tag STRING)")
    assert(sql(s"SELECT * FROM graft.$n").columns.toSeq ===
      Seq("id", "status", "price", "note", "score", "tag"))
    // the ALTER itself wrote no data file — just a timeline instant
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/$n"
    val last = GraftTable.load(spark, path).timeline.metas(None).last
    assert(last.operation === "alter_schema" && last.files.isEmpty)
    // pre-ALTER rows surface nulls; post-ALTER writes carry values
    sql(s"INSERT INTO graft.$n VALUES (99L, 'O', 5.0, 'new', 0.5, 'x')")
    val rows = sql(
      s"SELECT id, score, tag FROM graft.$n WHERE id IN (1, 99) ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq ===
      Seq((1L, None, None), (99L, Some(0.5), Some("x"))))
    // destructive schema changes are rejected
    intercept[Exception] { sql(s"ALTER TABLE graft.$n DROP COLUMN note") }
    intercept[Exception] { sql(s"ALTER TABLE graft.$n RENAME COLUMN note TO memo") }
  }

  test("ALTER COLUMN TYPE widens in place; narrowing and key types rejected") {
    val n = fresh("t_alter_widen")
    createOrders(n, rows = 3)
    sql(s"ALTER TABLE graft.$n ADD COLUMNS (qty INT)")
    sql(s"INSERT INTO graft.$n VALUES (50L, 'O', 1.0, 'q', 7)")
    sql(s"ALTER TABLE graft.$n ALTER COLUMN qty TYPE BIGINT")
    // data written as INT reads back under the widened type
    assert(sql(s"SELECT qty FROM graft.$n WHERE id = 50").collect()(0).getLong(0) === 7L)
    intercept[Exception] { // DOUBLE -> FLOAT is narrowing
      sql(s"ALTER TABLE graft.$n ALTER COLUMN price TYPE FLOAT") }
    intercept[Exception] { // record-key type defines identity, even widening
      sql(s"ALTER TABLE graft.$n ALTER COLUMN id TYPE DOUBLE") }
  }

  test("time travel to before an ALTER shows the pre-ALTER schema") {
    val n = fresh("t_alter_tt")
    createOrders(n, rows = 3)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/$n"
    val v1 = GraftTable.load(spark, path).timeline.completed().last._1
    sql(s"ALTER TABLE graft.$n ADD COLUMNS (score DOUBLE)")
    assert(sql(s"SELECT * FROM graft.$n VERSION AS OF '$v1'").columns.toSeq ===
      Seq("id", "status", "price", "note"))
    assert(sql(s"SELECT * FROM graft.$n").columns.toSeq ===
      Seq("id", "status", "price", "note", "score"))
  }

  test("schema-on-read: RENAME/DROP COLUMN resolve old files by column id") {
    val n = fresh("t_sor")
    sql(s"""CREATE TABLE graft.$n (
           |  id BIGINT, status STRING, price DOUBLE, note STRING, tag STRING)
           |USING graft PARTITIONED BY (status)
           |TBLPROPERTIES (
           |  'graft.recordkey.field' = 'id',
           |  'graft.precombine.field' = 'price',
           |  'graft.schema.on.read' = 'true')""".stripMargin)
    sql(s"INSERT INTO graft.$n VALUES (1L, 'O', 10.0, 'keep', 'x1'), " +
      "(2L, 'F', 20.0, 'old-note', 'x2')")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/$n"
    val v1 = GraftTable.load(spark, path).timeline.completed().last._1
    // RENAME: schema-only commit; files written under the OLD name must
    // serve the renamed column by id
    sql(s"ALTER TABLE graft.$n RENAME COLUMN note TO comment")
    assert(sql(s"SELECT * FROM graft.$n").columns.toSeq ===
      Seq("id", "status", "price", "comment", "tag"))
    assert(sql(s"SELECT comment FROM graft.$n WHERE id = 2")
      .collect()(0).getString(0) === "old-note")
    // writes after the rename use the new name; both epochs read coherently
    sql(s"INSERT INTO graft.$n VALUES (3L, 'O', 30.0, 'new-note', 'x3')")
    assert(sql(s"SELECT id, comment FROM graft.$n ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "keep"), (2L, "old-note"), (3L, "new-note")))
    // DROP then re-ADD under the same name: fresh column id — old values
    // must NOT resurrect
    sql(s"ALTER TABLE graft.$n DROP COLUMN tag")
    assert(!sql(s"SELECT * FROM graft.$n").columns.contains("tag"))
    sql(s"ALTER TABLE graft.$n ADD COLUMNS (tag STRING)")
    assert(sql(s"SELECT tag FROM graft.$n").collect().forall(_.isNullAt(0)),
      "dropped-then-readded column resurrected old values")
    // time travel before the ALTERs shows the original schema AND data
    val old = sql(s"SELECT * FROM graft.$n VERSION AS OF '$v1'")
    assert(old.columns.toSeq === Seq("id", "status", "price", "note", "tag"))
    assert(old.where("id = 2").select("note", "tag").collect()(0) ===
      Row("old-note", "x2"))
    // upserts still route correctly after the evolution
    sql(s"INSERT INTO graft.$n VALUES (2L, 'F', 99.0, 'bumped', 't2')")
    assert(sql(s"SELECT count(*) AS c FROM graft.$n").collect()(0).getLong(0) === 3)
    assert(sql(s"SELECT comment, tag FROM graft.$n WHERE id = 2").collect()(0) ===
      Row("bumped", "t2"))
  }

  test("ALTER guards: gate, identity columns, reserved/duplicate names, NOT NULL") {
    val n = fresh("t_alter_guard")
    createOrders(n, rows = 2) // no schema.on.read property
    intercept[Exception] { sql(s"ALTER TABLE graft.$n RENAME COLUMN note TO c") }
    intercept[Exception] { sql(s"ALTER TABLE graft.$n DROP COLUMN note") }
    sql(s"ALTER TABLE graft.$n SET TBLPROPERTIES ('graft.schema.on.read' = 'true')")
    // identity columns stay frozen even with the gate open
    intercept[Exception] { sql(s"ALTER TABLE graft.$n RENAME COLUMN id TO id2") }
    intercept[Exception] { sql(s"ALTER TABLE graft.$n DROP COLUMN status") }
    // reserved meta names and case-insensitive duplicates are rejected
    intercept[Exception] {
      sql(s"ALTER TABLE graft.$n ADD COLUMNS (_graft_record_key STRING)") }
    intercept[Exception] { sql(s"ALTER TABLE graft.$n ADD COLUMNS (NOTE STRING)") }
    intercept[Exception] { sql(s"ALTER TABLE graft.$n RENAME COLUMN note TO PRICE") }
    // SET NOT NULL advertises a guarantee reads never enforce — rejected
    intercept[Exception] {
      sql(s"ALTER TABLE graft.$n ALTER COLUMN note SET NOT NULL") }
    // any→string DDL casts are NOT widening (merge fallback does not apply)
    sql(s"ALTER TABLE graft.$n ADD COLUMNS (ts TIMESTAMP, flag BOOLEAN)")
    intercept[Exception] { sql(s"ALTER TABLE graft.$n ALTER COLUMN ts TYPE STRING") }
    intercept[Exception] { sql(s"ALTER TABLE graft.$n ALTER COLUMN flag TYPE STRING") }
    // numeric→string stays legal (non-identity column)
    sql(s"ALTER TABLE graft.$n ADD COLUMNS (qty INT)")
    sql(s"INSERT INTO graft.$n VALUES " +
      "(9L, 'O', 90.0, 'n9', CAST(NULL AS TIMESTAMP), NULL, 7)")
    sql(s"ALTER TABLE graft.$n ALTER COLUMN qty TYPE STRING")
    assert(sql(s"SELECT qty FROM graft.$n WHERE id = 9").collect()(0)
      .getString(0) === "7")
    // rename still works after the property flip, end to end
    sql(s"ALTER TABLE graft.$n RENAME COLUMN note TO remark")
    assert(sql(s"SELECT remark FROM graft.$n WHERE id = 1")
      .collect()(0).getString(0) === "n1")
  }

  test("ALTER TABLE before the first write updates the declared schema") {
    val n = fresh("t_alter_decl")
    sql(s"""CREATE TABLE graft.$n (id BIGINT, v STRING) USING graft
           |TBLPROPERTIES ('graft.recordkey.field' = 'id')""".stripMargin)
    sql(s"ALTER TABLE graft.$n ADD COLUMNS (extra INT)")
    sql(s"INSERT INTO graft.$n VALUES (1L, 'a', 5)")
    assert(sql(s"SELECT id, v, extra FROM graft.$n").collect().toSeq ===
      Seq(Row(1L, "a", 5)))
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES re-persists the write config") {
    val n = fresh("t_alter_props")
    createOrders(n, rows = 2)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/$n"
    sql(s"""ALTER TABLE graft.$n SET TBLPROPERTIES (
           |  'graft.target.file.rows' = '12345',
           |  'graft.merge.payload' = 'event_time')""".stripMargin)
    val cfg = GraftTable.load(spark, path).config
    assert(cfg.targetFileSizeRows === 12345L)
    assert(cfg.payload === graft.table.EventTimeOrdered)
    sql(s"ALTER TABLE graft.$n UNSET TBLPROPERTIES ('graft.merge.payload')")
    assert(GraftTable.load(spark, path).config.payload === graft.table.OverwriteLatest)
    // structural properties are immutable once the table exists
    intercept[Exception] {
      sql(s"ALTER TABLE graft.$n SET TBLPROPERTIES ('graft.recordkey.field' = 'note')") }
  }

  test("CTAS honors graft.bulkinsert.sort.mode = global_sort") {
    val n = fresh("t_ctas_gs")
    sql(s"""CREATE TABLE graft.$n USING graft
           |TBLPROPERTIES ('graft.recordkey.field' = 'id',
           |  'graft.target.file.rows' = '50',
           |  'graft.bulkinsert.sort.mode' = 'global_sort')
           |AS SELECT id * 37 % 500 AS id, id AS v FROM range(500)""".stripMargin)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/$n"
    val files = GraftTable.load(spark, path).timeline.metas(None).last.files
    assert(files.size >= 8, s"expected ~10 files, got ${files.size}")
    val ranges = files.map(f => (f.keyMin, f.keyMax)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"overlapping file key ranges: $ranges")
      case _ =>
    }
    assert(sql(s"SELECT count(DISTINCT id) AS c FROM graft.$n")
      .collect()(0).getLong(0) === 500)
    // a bad sort mode fails BEFORE the table is created — no empty table
    // left registered behind a failed CTAS
    val bad = fresh("t_ctas_bad")
    intercept[Exception] {
      sql(s"""CREATE TABLE graft.$bad USING graft
             |TBLPROPERTIES ('graft.recordkey.field' = 'id',
             |  'graft.bulkinsert.sort.mode' = 'zorder_typo')
             |AS SELECT id FROM range(10)""".stripMargin)
    }
    assert(sql("SHOW TABLES IN graft").collect()
      .forall(r => r.getString(1) != bad), "failed CTAS left a table behind")
  }

  test("SHOW CREATE TABLE / DESCRIBE EXTENDED render the graft config") {
    val n = fresh("t_showcreate")
    createOrders(n, rows = 2)
    val ddl = sql(s"SHOW CREATE TABLE graft.$n").collect()(0).getString(0)
    assert(ddl.contains("USING graft"), ddl)
    assert(ddl.contains("'graft.recordkey.field' = 'id'"), ddl)
    assert(ddl.contains("'graft.precombine.field' = 'price'"), ddl)
    assert(ddl.contains("PARTITIONED BY (status)"), ddl)
    val desc = sql(s"DESCRIBE TABLE EXTENDED graft.$n").collect()
      .map(r => s"${r.getString(0)}|${r.getString(1)}").mkString("\n")
    assert(desc.contains("graft.table.type") && desc.contains("cow"), desc)
  }

  test("graft.sql.insert.mode: upsert default, strict fails on dup key, non-strict appends") {
    val n = fresh("t_insmode")
    sql(s"""CREATE TABLE graft.$n (id BIGINT, v STRING) USING graft
      |TBLPROPERTIES ('graft.recordkey.field' = 'id',
      |  'graft.precombine.field' = 'v')""".stripMargin)
    sql(s"INSERT INTO graft.$n VALUES (1L, 'a'), (2L, 'b')")
    // default with precombine = upsert: same key converges, no dup
    sql(s"INSERT INTO graft.$n VALUES (1L, 'a2')")
    assert(sql(s"SELECT count(*) AS c FROM graft.$n").collect()(0).getLong(0) === 2)
    assert(sql(s"SELECT v FROM graft.$n WHERE id = 1").collect()(0).getString(0) === "a2")
    // strict: an existing key fails the whole statement, nothing lands
    spark.conf.set("graft.sql.insert.mode", "strict")
    try {
      val e = intercept[Exception] { sql(s"INSERT INTO graft.$n VALUES (2L, 'x'), (9L, 'n')") }
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .exists(_.getMessage.contains("strict insert")), e.getMessage)
      assert(sql(s"SELECT count(*) AS c FROM graft.$n").collect()(0).getLong(0) === 2)
      // fresh keys pass strict
      sql(s"INSERT INTO graft.$n VALUES (3L, 'c')")
      assert(sql(s"SELECT count(*) AS c FROM graft.$n").collect()(0).getLong(0) === 3)
      // non-strict: duplicates append (the reference's plain-insert mode)
      spark.conf.set("graft.sql.insert.mode", "non-strict")
      sql(s"INSERT INTO graft.$n VALUES (1L, 'dup')")
      assert(sql(s"SELECT count(*) AS c FROM graft.$n WHERE id = 1")
        .collect()(0).getLong(0) === 2)
    } finally spark.conf.unset("graft.sql.insert.mode")
    sql(s"DROP TABLE graft.$n")
  }

  test("SHOW CREATE TABLE round-trips timestamp keygen input type/format") {
    val n = fresh("t_tskeygen")
    sql(s"""CREATE TABLE graft.$n (id BIGINT, ts BIGINT, v STRING)
      USING graft TBLPROPERTIES (
        'graft.recordkey.field' = 'id',
        'graft.partition.timestamp.col' = 'ts',
        'graft.partition.timestamp.format' = 'yyyy/MM/dd',
        'graft.partition.timestamp.type' = 'epoch_millis')""")
    val ddl = sql(s"SHOW CREATE TABLE graft.$n").collect()(0).getString(0)
    assert(ddl.contains("'graft.partition.timestamp.type' = 'epoch_millis'"), ddl)
    assert(ddl.contains("'graft.partition.timestamp.format' = 'yyyy/MM/dd'"), ddl)
    // re-running the emitted DDL creates a table with the SAME partition
    // interpretation: an epoch-millis value must land in its date dir
    val n2 = fresh("t_tskeygen2")
    sql(ddl.replaceFirst("CREATE TABLE \\S+", s"CREATE TABLE graft.$n2")
      .replaceAll("LOCATION '[^']*'", ""))
    sql(s"INSERT INTO graft.$n2 VALUES (1, 1700000000000, 'a')")
    val loc2 = sql(s"DESCRIBE TABLE EXTENDED graft.$n2").collect()
      .find(_.getString(0) == "Location").get.getString(1)
    val parts = GraftTable.load(spark, loc2).slices(None).map(_.partition).distinct
    assert(parts === Seq("dt=2023/11/14"), parts.toString)
    sql(s"DROP TABLE graft.$n"); sql(s"DROP TABLE graft.$n2")
  }

  test("catalog ops: SHOW TABLES, DROP, external LOCATION registration") {
    val n = fresh("t_cat")
    createOrders(n, rows = 2)
    assert(sql("SHOW TABLES IN graft").collect().map(_.getString(1)).contains(n))
    // register an existing path-based table under a name
    val ext = java.nio.file.Files.createTempDirectory("graft_ext_").toString
    GraftTable.create(spark, ext, graft.table.TableConfig(
      "ext", graft.table.CopyOnWrite, Seq("k")))
      .bulkInsert(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val e = fresh("t_ext")
    sql(s"CREATE TABLE graft.$e USING graft LOCATION '$ext'")
    assert(sql(s"SELECT count(*) AS c FROM graft.$e").collect()(0).getLong(0) === 2)
    // LOCATION-registered tables are EXTERNAL: DROP only unregisters the
    // link, lake data survives (Hive/Spark external semantics — and a MOR
    // sync registers _rt/_ro over ONE base path, so a data-deleting drop
    // through either link would destroy the other)
    sql(s"DROP TABLE graft.$e")
    assert(!sql("SHOW TABLES IN graft").collect().map(_.getString(1)).contains(e))
    assert(GraftTable.exists(ext)) // data intact
    // warehouse-resident (managed) tables DO drop their data
    sql(s"DROP TABLE graft.$n")
    assert(!sql("SHOW TABLES IN graft").collect().map(_.getString(1)).contains(n))
  }
}
