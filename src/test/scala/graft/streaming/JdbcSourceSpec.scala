package graft.streaming

import java.nio.file.Files
import java.sql.DriverManager
import graft.TestSpark
import graft.table._
import org.scalatest.funsuite.AnyFunSuite

/** JDBC incremental source (ref: hudi-utilities JdbcSource) driven against
  * an in-process embedded Derby database: exactly-once across restart,
  * bounded batches, checkpoint recovery from the archived timeline. */
class JdbcSourceSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("graft_jdbc_").toString
  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val opts = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  private def exec(sqls: String*): Unit = {
    val c = DriverManager.getConnection(url)
    try sqls.foreach { s => val st = c.createStatement(); try st.execute(s) finally st.close() }
    finally c.close()
  }

  test("incremental pull: bounded batches, restart resume, checkpoint survives archival") {
    exec("CREATE TABLE SRC (ID BIGINT PRIMARY KEY, V VARCHAR(20))")
    try {
      exec((1 to 5).map(i => s"INSERT INTO SRC VALUES ($i, 'v$i')"): _*)
      val dir = tmp()
      val t = GraftTable.create(spark, dir, TableConfig("jdbc_t", CopyOnWrite,
        keyFields = Seq("ID")))
      val src = new JdbcSource(spark, url, "SRC", Some("ID"),
        maxRowsPerPull = 2, options = opts)
      val ci1 = new ContinuousIngest(t, src.forTable(t),
        operation = "insert", compactEvery = 0)
      // 5 rows at 2/pull = 3 bounded cycles
      try assert(ci1.drain() === 3) finally ci1.close()
      assert(t.snapshot().count() === 5)
      assert(ContinuousIngest.lastCheckpointFor(t, "jdbc") === Some("5"))
      // restart: only the two new rows land (exactly-once, no re-pull)
      exec("INSERT INTO SRC VALUES (6, 'v6')", "INSERT INTO SRC VALUES (7, 'v7')")
      val ci2 = new ContinuousIngest(t, src.forTable(t),
        operation = "insert", compactEvery = 0)
      try assert(ci2.drain() === 1) finally ci2.close()
      assert(t.snapshot().count() === 7)
      assert(t.snapshot().select("ID").distinct().count() === 7, "duplicated rows")
      // archive every checkpointed commit; resume must read the archived
      // timeline, not restart from scratch
      t.archive(keepLast = 1)
      val ci3 = new ContinuousIngest(t, src.forTable(t),
        operation = "insert", compactEvery = 0)
      try assert(ci3.drain() === 0, "archived checkpoint lost -> re-ingest") finally ci3.close()
      exec("INSERT INTO SRC VALUES (8, 'v8')")
      val ci4 = new ContinuousIngest(t, src.forTable(t),
        operation = "insert", compactEvery = 0)
      try assert(ci4.drain() === 1) finally ci4.close()
      assert(t.snapshot().count() === 8)
      GraftTable.drop(dir)
    } finally exec("DROP TABLE SRC")
  }

  test("string checkpoint column quotes the pushed predicate") {
    exec("CREATE TABLE SRCS (NAME VARCHAR(20) PRIMARY KEY, V INT)")
    try {
      exec("INSERT INTO SRCS VALUES ('a''quote', 1)",
        "INSERT INTO SRCS VALUES ('b', 2)", "INSERT INTO SRCS VALUES ('c', 3)")
      val src = new JdbcSource(spark, url, "SRCS", Some("NAME"),
        maxRowsPerPull = 1, options = opts)
      // pull 1: a'quote; pull 2 resumes > "a'quote" (escaped) -> b
      val (ck1, b1) = src.pull(None).get
      assert(ck1 === "a'quote" && b1.count() === 1)
      val (ck2, b2) = src.pull(Some(ck1)).get
      assert(ck2 === "b" && b2.count() === 1)
      assert(src.pull(Some("c")).isEmpty)
    } finally exec("DROP TABLE SRCS")
  }

  test("full-fetch fallback without a checkpoint column upserts idempotently") {
    exec("CREATE TABLE SRCF (ID BIGINT PRIMARY KEY, V VARCHAR(20))")
    try {
      exec("INSERT INTO SRCF VALUES (1, 'a')", "INSERT INTO SRCF VALUES (2, 'b')")
      val dir = tmp()
      val t = GraftTable.create(spark, dir, TableConfig("jdbcf_t", CopyOnWrite,
        keyFields = Seq("ID")))
      val src = new JdbcSource(spark, url, "SRCF", None, options = opts)
      val ci = new ContinuousIngest(t, src.forTable(t),
        operation = "upsert", compactEvery = 0)
      try {
        assert(ci.step().isDefined)
        assert(t.snapshot().count() === 2)
        exec("UPDATE SRCF SET V = 'a2' WHERE ID = 1")
        assert(ci.step().isDefined) // full fetch never reports dry
        assert(t.snapshot().count() === 2)
        import spark.implicits._
        assert(t.snapshot().filter(org.apache.spark.sql.functions.col("ID") === 1)
          .select("V").as[String].collect().toSeq === Seq("a2"))
      } finally ci.close()
      GraftTable.drop(dir)
    } finally exec("DROP TABLE SRCF")
  }
}
