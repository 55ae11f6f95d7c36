package graft.streaming

import java.nio.file.Files
import graft.{Tables, TestSpark}
import graft.table._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DeltaStreamer-style continuous ingest: pull-transform-upsert cycles with
  * the source checkpoint in commit metadata, compaction scheduled on the
  * ingest thread and executed off it (the schedule/execute split). */
class ContinuousIngestSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def tmp(): String = Files.createTempDirectory("graft_ci_").toString

  test("onBatchCommitted: hook sees the transformed batch post-commit; a hook failure fails the step AFTER the commit") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("ci_hook", CopyOnWrite,
      keyFields = Seq("o_orderkey")))
    val batch = Tables.orders(spark, sf).filter(col("o_orderkey") < 100)
      .select("o_orderkey", "o_totalprice")
    var hookSeen: Option[(String, Long)] = None
    var src1 = List(("cp1", batch))
    val ok = new ContinuousIngest(t,
      () => src1.headOption.map { b => src1 = src1.tail; b },
      transforms = Seq(_.withColumn("o_totalprice", lit(0L))),
      compactEvery = 0,
      onBatchCommitted = (instant, df) => hookSeen = Some((instant, df.count())))
    try {
      val instant = ok.step()
      assert(instant.isDefined)
      // the hook received the TRANSFORM OUTPUT (post-SQL), tied to the commit
      assert(hookSeen.map(_._1) === instant, "hook instant must be the commit's")
      assert(hookSeen.map(_._2) === Some(batch.count()))
    } finally ok.close()
    // a throwing hook fails the step, but the commit (and its checkpoint)
    // already landed — the documented contract hook consumers reconcile from
    var src2 = List(("cp2", batch.withColumn("o_orderkey", col("o_orderkey") + 1000)))
    val bad = new ContinuousIngest(t,
      () => src2.headOption.map { b => src2 = src2.tail; b },
      compactEvery = 0,
      onBatchCommitted = (_, _) => sys.error("hook down"))
    try {
      val before = t.snapshot().count()
      intercept[RuntimeException](bad.step())
      assert(GraftTable.load(spark, dir).snapshot().count() === before + batch.count(),
        "the commit must precede (and survive) the hook failure")
      assert(ContinuousIngest.lastCheckpoint(GraftTable.load(spark, dir)) ===
        Some("cp2"), "checkpoint rides the commit, so the batch never replays")
    } finally bad.close()
    GraftTable.drop(dir)
  }

  test("ingest loop: batches land exactly once, checkpoint resumes, compaction keeps up") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("ci_t", MergeOnRead,
      keyFields = Seq("o_orderkey"), precombineField = Some("o_totalprice"),
      partitioning = PartitionByColumns(Seq("o_orderstatus")),
      targetFileSizeRows = 400))
    t.bulkInsert(Tables.orders(spark, sf))
    val total = Tables.orders(spark, sf).count()

    // a 4-batch source: each batch re-upserts a key slice with a marker
    var cursor = 0
    val batches = (1 to 4).map(i => (s"ckpt-$i",
      Tables.orders(spark, sf).filter(col("o_orderkey") % 4 === i % 4)
        .withColumn("o_orderpriority", lit(s"B$i"))))
    val source = () => {
      if (cursor >= batches.length) None
      else { val b = batches(cursor); cursor += 1; Some(b) }
    }

    val ci = new ContinuousIngest(t, source,
      transformerSql = Some("SELECT * FROM <SRC> WHERE o_orderkey IS NOT NULL"),
      compactEvery = 2)
    try {
      assert(ci.drain() === 4) // source dries up after 4 batches
      // exactly-once shape: every batch's marker present, row count stable
      assert(t.snapshot().count() === total)
      for (i <- 1 to 4) {
        val expect = Tables.orders(spark, sf)
          .filter(col("o_orderkey") % 4 === i % 4).count()
        val got = t.snapshot().filter(col("o_orderpriority") === s"B$i").count()
        // batch i's slice may be re-marked by a later batch only if slices
        // collide — they don't (disjoint mod classes)
        assert(got === expect, s"batch $i: $got != $expect")
      }
      // the checkpoint token of the LAST ingested batch is recoverable
      assert(ContinuousIngest.lastCheckpoint(t) === Some("ckpt-4"))
    } finally ci.close()
    // after close() drains the async service, scheduled compactions have
    // executed: log debt is bounded by the batches since the last plan
    val pending = t.pendingPlans()
    assert(pending.isEmpty, s"unexecuted plans: $pending")
    assert(t.snapshot().count() === total)
    GraftTable.drop(dir)
  }

  test("service jobs carry the FAIR services pool; sparkConfigs writes the allocation file") {
    // allocation confs: FAIR mode + a parseable file declaring both pools
    val confs = SchedulerPools.sparkConfigs()
    assert(confs("spark.scheduler.mode") === "FAIR")
    val xml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(confs("spark.scheduler.allocation.file"))), "UTF-8")
    val parsed = scala.xml.XML.loadString(xml)
    assert((parsed \ "pool").map(_ \@ "name").toSet ===
      Set(SchedulerPools.IngestPool, SchedulerPools.ServicesPool))

    // jobs submitted by the service thread are tagged with the services
    // pool (observable via each job's submission properties)
    val pools = scala.collection.mutable.Set[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val p = js.properties.getProperty("spark.scheduler.pool")
        if (p != null) pools.synchronized { pools += p }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("ci_pool", MergeOnRead,
      keyFields = Seq("id"), precombineField = Some("seq")))
    import spark.implicits._
    t.bulkInsert(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("id", "seq", "v"))
    var n = 0
    val source = () => {
      n += 1
      if (n > 2) None
      else Some((s"p$n", Seq((1L, n + 1L, s"u$n")).toDF("id", "seq", "v")))
    }
    val ci = new ContinuousIngest(t, source, compactEvery = 1)
    try {
      assert(ci.drain() === 2)
      // drain the async compaction execution, then poll the listener bus
      scala.concurrent.Await.result(ci.lastService,
        scala.concurrent.duration.Duration(60, "s"))
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!pools.synchronized(pools(SchedulerPools.ServicesPool)) &&
          System.nanoTime() < deadline) Thread.sleep(50)
      assert(pools.synchronized(pools(SchedulerPools.ServicesPool)),
        s"no service job carried the pool; saw ${pools.synchronized(pools.toSet)}")
    } finally {
      ci.close()
      spark.sparkContext.removeSparkListener(listener)
    }
    GraftTable.drop(dir)
  }

  test("ingest loop cleans via the schedule/execute split, off the ingest thread") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("ci_c", CopyOnWrite,
      keyFields = Seq("id"), precombineField = Some("seq")))
    import spark.implicits._
    var cursor = 0
    // 10 re-upserts of the same keys → 10 base versions of the same group
    val source = () => {
      if (cursor >= 10) None
      else { cursor += 1
        Some((s"ck-$cursor", (1 to 50).map(i => (i.toLong, cursor.toLong)).toDF("id", "seq"))) }
    }
    val ci = new ContinuousIngest(t, source, operation = "upsert",
      compactEvery = 0, cleanRetainVersions = 2)
    try assert(ci.drain() === 10) finally ci.close()
    // the clean executed (plan + execution both recorded, nothing pending)
    t.timeline.refresh()
    assert(t.pendingPlans().isEmpty)
    val metas = t.timeline.metas(None)
    assert(metas.exists(_.action == "cleanreq"), "no clean plan scheduled")
    val execs = metas.filter(m => m.action == "clean" && m.extra.contains("planInstant"))
    assert(execs.nonEmpty, "clean plan never executed")
    assert(execs.flatMap(_.deletedPaths).nonEmpty, "scheduled clean deleted nothing")
    // table state intact: latest values, retained versions only
    assert(t.snapshot().count() === 50)
    assert(t.snapshot().agg(min(col("seq"))).collect()(0).getLong(0) === 10L)
    GraftTable.drop(dir)
  }

  test("restart resumes from the recorded checkpoint") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("ci_r", CopyOnWrite,
      keyFields = Seq("id")))
    import spark.implicits._
    def batchFrom(ck: Option[String]): Option[(String, org.apache.spark.sql.DataFrame)] = {
      val start = ck.map(_.stripPrefix("off-").toInt).getOrElse(0)
      if (start >= 20) None
      else Some((s"off-${start + 10}", (start until start + 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")))
    }
    // first process ingests one batch, then "crashes"
    val ci1 = new ContinuousIngest(t, () => batchFrom(ContinuousIngest.lastCheckpoint(t)),
      operation = "insert", compactEvery = 0)
    try assert(ci1.step().isDefined) finally ci1.close()
    assert(ContinuousIngest.lastCheckpoint(t) === Some("off-10"))
    // a fresh process resumes where the first left off — no replay, no gap
    val ci2 = new ContinuousIngest(t, () => batchFrom(ContinuousIngest.lastCheckpoint(t)),
      operation = "insert", compactEvery = 0)
    try assert(ci2.drain() === 1) finally ci2.close()
    assert(t.snapshot().count() === 20)
    assert(ContinuousIngest.lastCheckpoint(t) === Some("off-20"))
    GraftTable.drop(dir)
  }

  test("incremental curation: crawl batches quality-gate and dedup against the curated table before appending") {
    import spark.implicits._
    import graft.pipeline.Dedup
    import graft.functions.TextFunctions
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("curated", CopyOnWrite,
      keyFields = Seq("doc_id")))
    val good = (Seq.fill(30)("the quick brown fox jumps over") :+ "of that have with").mkString(" ")
    // three crawl "snapshots": batch 2 re-ships batch 1's content under new
    // ids; junk rows must fall to the quality gate
    val crawls = Seq(
      Seq((1L, good + " alpha"), (2L, good + " beta"), (3L, "junk")),
      Seq((11L, good + " alpha"), (12L, good + " gamma"), (13L, "junk two")),
      Seq((21L, good + " gamma"), (22L, good + " delta")))
    var shipped = 0
    val source = () =>
      if (shipped >= crawls.length) None
      else {
        val b = crawls(shipped); shipped += 1
        // curate INSIDE the pull: Gopher gate, then snapshot-over-snapshot
        // dedup against what the curated table already holds — the exact
        // composition a production crawl-to-lake loop runs
        val batch = b.toDF("doc_id", "text")
        val keep = TextFunctions.gopherColumns(col("text")).toMap.apply("keep")
        // before the first commit the table has no data schema yet
        val existing = if (t.timeline.completed().isEmpty) batch.limit(0)
                       else t.snapshot().select("doc_id", "text")
        val curated = Dedup.incremental(existing, batch.filter(keep === 1))
        Some((s"crawl-$shipped", curated))
      }
    val ci = new ContinuousIngest(t, source, operation = "insert", compactEvery = 0)
    try assert(ci.drain() === 3) finally ci.close()
    val rows = t.snapshot().select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    // batch 1: alpha+beta land, junk gated; batch 2: alpha already curated
    // -> only gamma lands; batch 3: gamma already curated -> only delta
    assert(rows.keySet === Set(1L, 2L, 12L, 22L), rows.keySet.toSeq.sorted)
    assert(ContinuousIngest.lastCheckpoint(t) === Some("crawl-3"))
    GraftTable.drop(dir)
  }

  test("transformer chain: flatten -> SQL -> SQL composes, restart resumes mid-chain") {
    import spark.implicits._
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("chain_tf", CopyOnWrite,
      keyFields = Seq("meta_id")))
    // nested-struct batches: data.{id, amount}
    def batch(from: Int, n: Int) = (from until from + n)
      .map(i => (i.toLong, i * 10L)).toDF("id", "amount")
      .select(struct(col("id"), col("amount")).as("data"))
    var shipped = 0
    val source = () =>
      if (shipped >= 2) None
      else { shipped += 1; Some((s"b-$shipped", batch(shipped * 10, 3))) }
    // chain: flatten (data.id -> data_id) -> SQL rename to meta_id -> SQL
    // derived column; a transform file exercises sqlFile
    val sqlF = Files.createTempFile("graft_tf_", ".sql")
    Files.write(sqlF,
      "SELECT meta_id, amount, amount * 2 AS amount2 FROM <SRC>".getBytes("UTF-8"))
    val transforms = Seq(
      Transformers.flatten,
      Transformers.sql("SELECT data_id AS meta_id, data_amount AS amount FROM <SRC>"),
      Transformers.sqlFile(sqlF.toString))
    val ci1 = new ContinuousIngest(t, source, transforms = transforms,
      operation = "insert", compactEvery = 0)
    try assert(ci1.step().isDefined) finally ci1.close()
    assert(t.snapshot().count() === 3)
    // restart with a fresh loop: resumes at batch 2, same chain
    val ci2 = new ContinuousIngest(t, source, transforms = transforms,
      operation = "insert", compactEvery = 0)
    try assert(ci2.drain() === 1) finally ci2.close()
    val rows = t.snapshot().select("meta_id", "amount", "amount2")
      .as[(Long, Long, Long)].collect().toSet
    assert(rows === (10 until 13).map(i => (i.toLong, i * 10L, i * 20L)).toSet ++
      (20 until 23).map(i => (i.toLong, i * 10L, i * 20L)).toSet, rows)
    GraftTable.drop(dir)
  }

  test("ingest housekeeping keeps the file-listing metadata table synced incrementally") {
    import spark.implicits._
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("mdt_ingest", CopyOnWrite,
      keyFields = Seq("id")))
    t.bulkInsert(Seq((0L, "seed")).toDF("id", "v"))
    t.syncMetadataTable() // opt in: segments exist -> the loop maintains them
    def segs() = {
      import scala.jdk.CollectionConverters._
      val d = java.nio.file.Paths.get(dir, ".graft", "metadata", "files")
      java.nio.file.Files.list(d).iterator()
        .asScala.map(_.getFileName.toString).filter(_.startsWith("seg_")).size
    }
    assert(segs() === 1)
    var shipped = 0
    val source = () =>
      if (shipped >= 2) None
      else { shipped += 1
        Some((s"b-$shipped", Seq((shipped.toLong, s"v$shipped")).toDF("id", "v"))) }
    // compactEvery=1 on a COW table: compaction never fires, houseEvery=2
    val ci = new ContinuousIngest(t, source, operation = "upsert", compactEvery = 1)
    try assert(ci.drain() === 2) finally ci.close()
    // the housekeeping sync appended ONE delta segment covering both
    // ingest commits — no rebuild, no per-commit full export
    assert(segs() === 2)
    // and a cold instance serves the synced listing correctly
    val cold = GraftTable.load(spark, dir)
    assert(cold.snapshot().count() === 3)
    GraftTable.drop(dir)
  }

  test("flatten names the colliding source columns instead of a duplicate-column write error") {
    import spark.implicits._
    // struct a.b and top-level a_b both flatten to `a_b`
    val df = Seq((1L, 2L)).toDF("b", "a_b")
      .select(struct(col("b")).as("a"), col("a_b"))
    val e = intercept[IllegalArgumentException] { Transformers.flatten(df) }
    assert(e.getMessage.contains("a_b"), e.getMessage)
    assert(e.getMessage.contains("duplicate"), e.getMessage)
    // non-colliding frames still flatten untouched
    val ok = Transformers.flatten(
      Seq((1L, 2L)).toDF("b", "c").select(struct(col("b")).as("a"), col("c")))
    assert(ok.columns.toSeq === Seq("a_b", "c"))
  }

  test("table-to-table replication: CommitFeed.forTable resumes exactly-once from the target") {
    import spark.implicits._
    val dirA = tmp(); val dirB = tmp()
    val a = GraftTable.create(spark, dirA, TableConfig("repl_src", CopyOnWrite,
      keyFields = Seq("id"), precombineField = Some("v")))
    val b = GraftTable.create(spark, dirB, TableConfig("repl_dst", CopyOnWrite,
      keyFields = Seq("id"), precombineField = Some("v")))
    a.upsert(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    a.upsert(Seq((3L, 30L)).toDF("id", "v"))
    // replicate: each source commit window becomes one target commit
    val ci1 = new ContinuousIngest(b,
      new CommitFeed(a, maxInstantsPerPoll = 1).forTable(b), compactEvery = 0)
    try assert(ci1.drain() === 2) finally ci1.close()
    assert(b.snapshot().select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
    // restart with a FRESH feed instance: nothing new -> no pull; new
    // source commits (update + insert) replicate without re-applying old
    a.upsert(Seq((2L, 21L), (4L, 40L)).toDF("id", "v"))
    val ci2 = new ContinuousIngest(b,
      new CommitFeed(a).forTable(b), compactEvery = 0)
    try assert(ci2.drain() === 1) finally ci2.close()
    val state = b.snapshot().select("id", "v").as[(Long, Long)].collect().toMap
    assert(state === Map(1L -> 10L, 2L -> 21L, 3L -> 30L, 4L -> 40L))
    assert(b.snapshot().count() === 4, "replication duplicated rows")
    // the meta columns of the SOURCE must not leak into the target write
    assert(ContinuousIngest.lastCheckpointFor(b, "incr").nonEmpty)
    GraftTable.drop(dirA); GraftTable.drop(dirB)
  }

  test("schema-provider transforms: conformTo casts/orders/nulls, dropColumns sheds") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // a messy upstream batch: wrong order, wrong types, extra + missing cols
    val batch = Seq(("7", 1.5, "secret", "x1"))
      .toDF("id", "score", "internal", "v")
    val declared = StructType.fromDDL("id BIGINT, v STRING, score DOUBLE, added STRING")
    val out = Transformers.chain(
      Transformers.dropColumns("internal"),
      Transformers.conformTo(declared))(batch)
    assert(out.schema.map(f => (f.name, f.dataType)) ===
      declared.map(f => (f.name, f.dataType)))
    val r = out.collect()(0)
    assert(r.getLong(0) === 7L && r.getString(1) === "x1" &&
      r.getDouble(2) === 1.5 && r.isNullAt(3))
    // failOnMissing is the broken-upstream tripwire
    intercept[IllegalArgumentException] {
      Transformers.conformTo(declared, failOnMissing = true)(
        Seq(1L).toDF("id"))
    }
    // schema file: DDL text and StructType JSON both parse
    val f1 = Files.createTempFile("graft_sch_", ".ddl")
    Files.write(f1, "id BIGINT, v STRING".getBytes("UTF-8"))
    val c1 = Transformers.conformToFile(f1.toString)(batch)
    assert(c1.columns.toSeq === Seq("id", "v"))
    val f2 = Files.createTempFile("graft_sch_", ".json")
    Files.write(f2, StructType.fromDDL("id BIGINT").json.getBytes("UTF-8"))
    assert(Transformers.conformToFile(f2.toString)(batch).columns.toSeq === Seq("id"))
  }

  test("SqlOnceSource: backfill runs exactly once across restarts") {
    import spark.implicits._
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("sqlsrc", CopyOnWrite,
      keyFields = Seq("id")))
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .createOrReplaceTempView("backfill_src")
    val src = new SqlOnceSource(spark, "SELECT * FROM backfill_src")
    val ci1 = new ContinuousIngest(t, src.forTable(t),
      operation = "insert", compactEvery = 0)
    try assert(ci1.drain() === 1) finally ci1.close()
    assert(t.snapshot().count() === 3)
    // a restarted job sees the completion marker and pulls nothing
    val ci2 = new ContinuousIngest(t, src.forTable(t),
      operation = "insert", compactEvery = 0)
    try assert(ci2.drain() === 0) finally ci2.close()
    assert(t.snapshot().count() === 3)
    GraftTable.drop(dir)
  }

  test("chained backfill -> live DFS: digit-prefixed inbox names still ingest") {
    import spark.implicits._
    val inbox = Files.createTempDirectory("graft_chain_inbox_").toString
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("chain_t", CopyOnWrite,
      keyFields = Seq("id")))
    Seq((100L, "bf")).toDF("id", "v").createOrReplaceTempView("chain_backfill")
    val bf = new ContinuousIngest(t,
      new SqlOnceSource(spark, "SELECT * FROM chain_backfill").forTable(t),
      operation = "insert", compactEvery = 0)
    try assert(bf.drain() === 1) finally bf.close()
    // timestamp-prefixed file names sort BELOW "sql-backfill-done" — the
    // namespaced checkpoints must not let the backfill marker shadow them
    val stage = s"$inbox/.stage"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val f = Files.list(java.nio.file.Paths.get(stage)).iterator()
    val pf = { var r: java.nio.file.Path = null
      while (f.hasNext) { val p = f.next(); if (p.toString.endsWith(".parquet")) r = p }
      r }
    Files.move(pf, java.nio.file.Paths.get(inbox, "20260814T000001.parquet"))
    val live = new ContinuousIngest(t,
      new DfsSource(spark, inbox).forTable(t),
      operation = "insert", compactEvery = 0)
    try assert(live.drain() === 1) finally live.close()
    assert(t.snapshot().count() === 3)
    // and a restarted backfill still sees its own completion marker even
    // though the NEWEST checkpoint now belongs to the dfs source
    val bf2 = new ContinuousIngest(t,
      new SqlOnceSource(spark, "SELECT * FROM chain_backfill").forTable(t),
      operation = "insert", compactEvery = 0)
    try assert(bf2.drain() === 0) finally bf2.close()
    GraftTable.drop(dir)
  }

  test("DfsSource: inbox files ingest oldest-first, name watermark survives restart") {
    import spark.implicits._
    val inbox = Files.createTempDirectory("graft_dfs_inbox_").toString
    val dir = tmp()
    val t = GraftTable.create(spark, dir, TableConfig("dfs_t", CopyOnWrite,
      keyFields = Seq("id")))
    // single-file drop with a deterministic monotone name (the contract
    // shipped inboxes follow; the staged dir emulates the shipper)
    def drop(name: String, ids: Range): Unit = {
      import scala.jdk.CollectionConverters._
      val stage = s"$inbox/.stage_$name"
      ids.map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val f = Files.list(java.nio.file.Paths.get(stage)).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.move(f, java.nio.file.Paths.get(inbox, s"$name.parquet"))
    }
    drop("f001", 0 until 5)
    drop("f002", 5 until 10)
    val src = new DfsSource(spark, inbox, maxFilesPerPull = 1)
    val ci1 = new ContinuousIngest(t, src.forTable(t),
      operation = "insert", compactEvery = 0)
    try assert(ci1.step().isDefined) finally ci1.close() // ingests f001 only
    assert(ContinuousIngest.lastCheckpoint(t) === Some("dfs:f001.parquet"))
    assert(ContinuousIngest.lastCheckpointFor(t, "dfs") === Some("f001.parquet"))
    assert(t.snapshot().count() === 5)
    // restart: resumes above the watermark; a new arrival also lands
    drop("f003", 10 until 12)
    val ci2 = new ContinuousIngest(t, src.forTable(t),
      operation = "insert", compactEvery = 0)
    try assert(ci2.drain() === 2) finally ci2.close()
    assert(t.snapshot().count() === 12)
    assert(ContinuousIngest.lastCheckpointFor(t, "dfs") === Some("f003.parquet"))
    // nothing new -> no pull, no empty commits
    val before = t.timeline.completed().size
    val ci3 = new ContinuousIngest(t, src.forTable(t),
      operation = "insert", compactEvery = 0)
    try assert(ci3.drain() === 0) finally ci3.close()
    assert(t.timeline.completed().size === before)
    GraftTable.drop(dir)
  }
}
