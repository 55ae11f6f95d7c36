package graft.table

import java.nio.file.Files
import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The schedule/execute split for table services (ref:
  * BaseHoodieWriteClient.scheduleCompaction + AsyncCompactService +
  * RunCompactionProcedure op => 'schedule' | 'run'): a plan pins target
  * file groups in a `compactionreq`/`clusteringreq` instant; ingest
  * continues; a later execution folds exactly the planned state, leaving
  * interleaved log files layered on top for the NEXT plan. */
class ScheduledServicesSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def tmp(): String = Files.createTempDirectory("graft_sched_").toString
  private def orders: DataFrame = Tables.orders(spark, sf)

  private def ordersTable(tableType: TableType, dir: String): GraftTable =
    GraftTable.create(spark, dir, TableConfig("orders_t", tableType,
      keyFields = Seq("o_orderkey"), precombineField = Some("o_totalprice"),
      partitioning = PartitionByColumns(Seq("o_orderstatus")),
      targetFileSizeRows = 400))

  test("scheduled compaction: plan survives interleaved ingest; " +
      "interleaved logs land in the next plan") {
    val dir = tmp()
    val t = ordersTable(MergeOnRead, dir)
    t.bulkInsert(orders)
    val batchA = orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_orderpriority", lit("A"))
    t.upsert(batchA)
    val planned = t.slices(None).filter(_.logs.nonEmpty)
      .map(s => (s.partition, s.fileId)).toSet
    val untouchedBases = t.slices(None).filter(s => !planned((s.partition, s.fileId)))
      .map(s => (s.partition, s.fileId) -> s.baseInstant).toMap

    val Some(plan) = t.scheduleCompaction(): @unchecked
    assert(t.pendingPlans().map(_._1) === Seq(plan))
    // the plan is NOT a data commit: readers and conflict detection are blind to it
    assert(t.snapshot().count() === orders.count())

    // interleaved ingest lands AFTER the plan
    val batchB = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderpriority", lit("B"))
    t.upsert(batchB)

    val Some(_) = t.runCompaction(plan): @unchecked
    val after = t.slices(None)
    for (s <- after; k = (s.partition, s.fileId)) {
      if (planned(k)) {
        // new base resolves AT the plan instant; only post-plan logs remain
        assert(s.baseInstant === plan, s"group $k base not at plan instant")
        assert(s.logs.forall(_._1 > plan), s"pre-plan log survived in $k")
      } else {
        // exactly the planned groups were compacted
        assert(s.baseInstant === untouchedBases(k), s"unplanned group $k rewritten")
      }
    }
    // interleaved batch-B logs are still readable (snapshot) but not folded (RO)
    assert(after.exists(_.logs.nonEmpty))
    assert(t.snapshot().filter(col("o_orderpriority") === "B").count() === batchB.count())
    assert(t.snapshot().filter(col("o_orderpriority") === "A").count()
      === batchA.count() - batchB.count())
    assert(t.readOptimized().filter(col("o_orderpriority") === "A").count()
      === batchA.count())
    assert(t.readOptimized().filter(col("o_orderpriority") === "B").count() === 0)
    // time travel to the plan instant: batch B does not exist yet
    assert(t.snapshot(Some(plan)).filter(col("o_orderpriority") === "B").count() === 0)
    assert(t.snapshot(Some(plan)).filter(col("o_orderpriority") === "A").count()
      === batchA.count())

    // the interleaved logs are exactly what the NEXT plan picks up
    val Some(plan2) = t.scheduleCompaction(): @unchecked
    val Some(_) = t.runCompaction(plan2): @unchecked
    assert(t.slices(None).forall(_.logs.isEmpty))
    assert(t.snapshot().count() === orders.count())
    assert(t.snapshot().filter(col("o_orderpriority") === "B").count() === batchB.count())

    // an executed plan cannot run twice; nothing stays pending
    intercept[IllegalArgumentException](t.runCompaction(plan))
    assert(t.pendingPlans().isEmpty)
    GraftTable.drop(dir)
  }

  test("scheduled compaction: a plan superseded by an inline compact executes as a no-op") {
    val dir = tmp()
    val t = ordersTable(MergeOnRead, dir)
    t.bulkInsert(orders)
    t.upsert(orders.limit(50).withColumn("o_totalprice", lit(1.0)))
    val Some(plan) = t.scheduleCompaction(): @unchecked
    val Some(_) = t.compact(): @unchecked // inline compaction wins the race
    assert(t.runCompaction(plan).isEmpty) // every planned group superseded
    assert(t.pendingPlans().isEmpty) // ...but the plan is marked executed
    intercept[IllegalArgumentException](t.runCompaction(plan))
    assert(t.snapshot().count() === orders.count())
    GraftTable.drop(dir)
  }

  test("scheduled clustering: groups touched since the plan are skipped, not lost") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    val Some(plan) = t.scheduleClustering(Seq("o_orderkey")): @unchecked
    // interleaved COW upsert rewrites some planned groups at newer instants
    val touched = orders.filter(col("o_orderstatus") === "F").limit(20)
      .withColumn("o_orderpriority", lit("TOUCHED"))
    t.upsert(touched)
    val rewritten = t.slices(None).filter(_.baseInstant > plan)
      .map(s => (s.partition, s.fileId)).toSet
    assert(rewritten.nonEmpty)

    val Some(_) = t.runClustering(plan): @unchecked
    val after = t.slices(None)
    // the interleaved write's groups survive untouched...
    assert(rewritten.subsetOf(after.map(s => (s.partition, s.fileId)).toSet))
    // ...while the unchanged planned groups were replaced by clustered ones
    assert(after.exists(_.fileId.startsWith("c")))
    assert(t.snapshot().count() === orders.count())
    assert(t.snapshot().filter(col("o_orderpriority") === "TOUCHED").count()
      === touched.count())
    assert(t.pendingPlans().isEmpty)
    GraftTable.drop(dir)
  }

  test("racing two executions of the SAME plan: exactly one commits, no duplicate rows") {
    val dir = tmp()
    val t = ordersTable(MergeOnRead, dir)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", lit(7.0)))
    val Some(plan) = t.scheduleCompaction(): @unchecked
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Option[String]]]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        gate.await()
        try results.add(Right(t.runCompaction(plan)))
        catch { case e: Throwable => results.add(Left(e)) }
        ()
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    val (failures, successes) = results.toArray.toSeq
      .map(_.asInstanceOf[Either[Throwable, Option[String]]])
      .partitionMap(identity)
    // exactly one execution lands; the loser dies on the already-executed
    // check or on the OCC same-plan conflict — never commits a second base
    assert(successes.count(_.isDefined) === 1,
      s"expected exactly one winning execution, got $results")
    assert(failures.forall(e => e.isInstanceOf[IllegalArgumentException] ||
      e.isInstanceOf[ConcurrentWriteException]), failures.map(_.getClass).toString)
    // one base generation at the plan instant per group — and no row dupes
    for (s <- t.slices(None) if s.baseInstant == plan)
      assert(s.baseFiles.map(_.path).distinct.size === s.baseFiles.size)
    assert(t.snapshot().count() === orders.count())
    assert(t.snapshot().groupBy(col("o_orderkey")).count()
      .filter(col("count") > 1).count() === 0, "duplicate keys after race")
    GraftTable.drop(dir)
  }

  test("soak: 8 ingest batches with a schedule+execute cycle after every one") {
    val dir = tmp()
    val t = ordersTable(MergeOnRead, dir)
    t.bulkInsert(orders)
    for (i <- 1 to 8) {
      t.upsert(orders.filter(col("o_orderkey") % 8 === i % 8)
        .withColumn("o_orderpriority", lit(s"S$i")))
      t.scheduleCompaction().foreach(p => t.runCompaction(p))
    }
    // every batch's marker survives on exactly its residue class
    for (i <- 1 to 8) {
      val expect = orders.filter(col("o_orderkey") % 8 === i % 8).count()
      assert(t.snapshot().filter(col("o_orderpriority") === s"S$i").count()
        === expect, s"batch $i lost rows")
    }
    assert(t.snapshot().count() === orders.count())
    assert(t.pendingPlans().isEmpty)
    assert(t.slices(None).forall(_.logs.isEmpty)) // every cycle folded its debt
    GraftTable.drop(dir)
  }

  test("archival keeps an executed plan executed (no pending-plan resurrection)") {
    val dir = tmp()
    val t = ordersTable(MergeOnRead, dir)
    t.bulkInsert(orders)
    t.upsert(orders.limit(40).withColumn("o_totalprice", lit(5.0)))
    val Some(plan) = t.scheduleCompaction(): @unchecked
    val Some(_) = t.runCompaction(plan): @unchecked
    // pad the timeline so the execution commit falls out of the keep window
    (1 to 3).foreach(i => t.upsert(orders.limit(5).withColumn("o_totalprice", lit(i.toDouble))))
    assert(t.archive(keepLast = 2) > 0)
    // the plan left the active timeline WITH its execution commit: it must
    // not read as pending again (which would pin its groups forever)
    assert(t.pendingPlans().isEmpty, "archived execution resurrected its plan")
    assert(!GraftSql.showCompaction(t).collect().exists(_.getString(1) == "REQUESTED"))
    assert(t.snapshot().count() === orders.count())
    GraftTable.drop(dir)
  }

  test("PartitionBounded compaction strategy folds only the latest partitions") {
    val dir = tmp()
    val t = ordersTable(MergeOnRead, dir)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", lit(9.0))) // logs in every partition
    val loggedParts = t.slices(None).filter(_.logs.nonEmpty).map(_.partition).distinct.sorted
    assert(loggedParts.size >= 2, "need multi-partition log debt for this test")
    val latest = loggedParts.max
    val Some(_) = t.compact(strategy = PartitionBounded(1)): @unchecked
    val after = t.slices(None)
    assert(after.filter(_.partition == latest).forall(_.logs.isEmpty),
      s"latest partition $latest still has logs")
    assert(after.exists(s => s.partition != latest && s.logs.nonEmpty),
      "older partitions should keep their log debt")
    assert(t.snapshot().count() === orders.count())
    // CALL surface: max_partitions routes to the strategy
    spark.sql("DROP TABLE IF EXISTS graft.p_daycompact")
    spark.sql("""CREATE TABLE graft.p_daycompact (
      |  id BIGINT, status STRING, price DOUBLE)
      |USING graft PARTITIONED BY (status)
      |TBLPROPERTIES (
      |  'graft.recordkey.field' = 'id',
      |  'graft.precombine.field' = 'price',
      |  'graft.table.type' = 'mor')""".stripMargin)
    val vals = (1 to 20).map(i => s"(${i}L, '${if (i % 2 == 0) "B" else "A"}', $i.0)")
    spark.sql(s"INSERT INTO graft.p_daycompact VALUES ${vals.mkString(", ")}")
    spark.sql(s"INSERT INTO graft.p_daycompact VALUES ${vals.mkString(", ")}") // logs A+B
    spark.sql("CALL graft.run_compaction(`table` => 'p_daycompact', `max_partitions` => 1)")
      .collect()
    val t2 = GraftTable.load(spark, spark.sql("DESCRIBE EXTENDED graft.p_daycompact")
      .filter(col("col_name") === "Location").select("data_type").collect()(0).getString(0))
    assert(t2.slices(None).filter(_.partition == "status=B").forall(_.logs.isEmpty))
    assert(t2.slices(None).exists(s => s.partition == "status=A" && s.logs.nonEmpty))
    spark.sql("DROP TABLE graft.p_daycompact")
    GraftTable.drop(dir)
  }

  test("scheduled clean: plan pins the doomed set; interleaved writes are untouched") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    t.upsert(orders.limit(60).withColumn("o_totalprice", lit(1.0)))
    t.upsert(orders.limit(60).withColumn("o_totalprice", lit(2.0)))

    val Some(plan) = t.scheduleClean(KeepLatestFileVersions(1)): @unchecked
    val planned = t.timeline.read(plan, "cleanreq").deletedPaths
    assert(planned.nonEmpty)
    // a plan is metadata only: nothing deleted yet
    assert(planned.forall(p => Files.exists(java.nio.file.Paths.get(dir, p))))
    assert(t.pendingPlans().map(_._1) === Seq(plan))

    // interleaved write creates ANOTHER old version the plan knows nothing about
    t.upsert(orders.limit(60).withColumn("o_totalprice", lit(3.0)))
    val preRunSlices = t.slices(None)

    val Some(_) = t.runClean(plan): @unchecked
    // exactly the planned files died; the interleaved write's versions live
    assert(planned.forall(p => !Files.exists(java.nio.file.Paths.get(dir, p))))
    assert(preRunSlices.flatMap(_.baseFiles).forall(f =>
      Files.exists(java.nio.file.Paths.get(dir, f.path))))
    assert(t.snapshot().count() === orders.count())
    assert(t.snapshot().filter(col("o_totalprice") === 3.0).count() === 60)
    assert(t.pendingPlans().isEmpty)
    intercept[IllegalArgumentException](t.runClean(plan))
    GraftTable.drop(dir)
  }

  test("scheduled clean: a savepoint created after the plan reprieves its files") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    val mid = t.timeline.completed().last._1
    t.upsert(orders.limit(60).withColumn("o_totalprice", lit(1.0)))
    t.upsert(orders.limit(60).withColumn("o_totalprice", lit(2.0)))

    val Some(plan) = t.scheduleClean(KeepLatestFileVersions(1)): @unchecked
    val midFiles = t.slices(Some(mid)).flatMap(_.baseFiles).map(_.path).toSet
    assert(t.timeline.read(plan, "cleanreq").deletedPaths.exists(midFiles),
      "plan should doom the mid-history version this test protects")
    t.savepoint(Some(mid)) // lands AFTER the plan
    t.runClean(plan)
    // savepointed bases survived execution; time travel still works
    assert(midFiles.forall(p => Files.exists(java.nio.file.Paths.get(dir, p))))
    assert(t.snapshot(Some(mid)).count() === orders.count())
    assert(t.snapshot(Some(mid)).filter(col("o_totalprice") === 2.0).count() === 0)
    assert(t.pendingPlans().isEmpty)
    GraftTable.drop(dir)
  }

  test("racing two executions of the SAME clean plan: exactly one commits") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    t.upsert(orders.limit(60).withColumn("o_totalprice", lit(1.0)))
    val Some(plan) = t.scheduleClean(KeepLatestFileVersions(1)): @unchecked
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Option[String]]]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        gate.await()
        try results.add(Right(t.runClean(plan)))
        catch { case e: Throwable => results.add(Left(e)) }
        ()
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    val (failures, successes) = results.toArray.toSeq
      .map(_.asInstanceOf[Either[Throwable, Option[String]]])
      .partitionMap(identity)
    assert(successes.count(_.isDefined) === 1,
      s"expected exactly one winning clean execution, got $results")
    assert(failures.forall(_.isInstanceOf[IllegalArgumentException]),
      failures.map(_.getClass).toString)
    // exactly one clean execution commit for this plan on the timeline
    t.timeline.refresh()
    assert(t.timeline.metas(None).count(m =>
      m.action == "clean" && m.extra.get("planInstant").contains(plan)) === 1)
    assert(t.snapshot().count() === orders.count())
    GraftTable.drop(dir)
  }

  test("rollbackFailedWrites sweeps dangling writer debris, respects age guard") {
    val dir = tmp()
    val t = ordersTable(CopyOnWrite, dir)
    t.bulkInsert(orders)
    val before = t.snapshot().count()
    val committedFiles = t.slices(None).flatMap(_.baseFiles).map(_.path)

    // simulate a writer that died between its renames and its commit
    val dead = t.timeline.startInstant("commit")
    val partDir = java.nio.file.Paths.get(dir, committedFiles.head).getParent
    val orphan = partDir.resolve(s"gdeadbeef-00000_$dead.parquet")
    Files.copy(java.nio.file.Paths.get(dir, committedFiles.head), orphan)
    val staging = java.nio.file.Paths.get(dir, ".graft", s"staging_$dead")
    Files.createDirectories(staging)
    Files.write(staging.resolve("junk"), Array[Byte](1, 2, 3))

    // age guard: a just-claimed instant is NOT swept with a high threshold
    assert(t.rollbackFailedWrites(olderThanMs = 3600000L).isEmpty)
    assert(Files.exists(orphan))

    val rolled = t.rollbackFailedWrites()
    assert(rolled === Seq(dead))
    assert(!Files.exists(orphan), "orphan data file survived")
    assert(!Files.exists(staging), "staging dir survived")
    assert(!Files.exists(t.timeline.dir.resolve(s"$dead.commit.inflight")))
    // committed state is untouched
    assert(committedFiles.forall(p => Files.exists(java.nio.file.Paths.get(dir, p))))
    assert(t.snapshot().count() === before)
    assert(t.rollbackFailedWrites().isEmpty) // idempotent

    // CALL surface
    spark.sql("DROP TABLE IF EXISTS graft.p_failedw")
    spark.sql("""CREATE TABLE graft.p_failedw (id BIGINT, v DOUBLE) USING graft
      |TBLPROPERTIES ('graft.recordkey.field' = 'id')""".stripMargin)
    spark.sql("INSERT INTO graft.p_failedw VALUES (1L, 1.0), (2L, 2.0)")
    val loc = spark.sql("DESCRIBE EXTENDED graft.p_failedw")
      .filter(col("col_name") === "Location").select("data_type").collect()(0).getString(0)
    val t2 = GraftTable.load(spark, loc)
    val dead2 = t2.timeline.startInstant("deltacommit")
    val swept = spark.sql(
      "CALL graft.rollback_failed_writes(`table` => 'p_failedw')").collect()
    assert(swept.map(_.getString(0)).toSeq === Seq(dead2))
    assert(spark.sql("SELECT count(*) FROM graft.p_failedw")
      .collect()(0).getLong(0) === 2L)
    spark.sql("DROP TABLE graft.p_failedw")
    GraftTable.drop(dir)
  }

  test("CALL surface: run_clean op => schedule / run") {
    def sql(q: String) = spark.sql(q)
    sql("DROP TABLE IF EXISTS graft.p_clean_sched")
    sql("""CREATE TABLE graft.p_clean_sched (
          |  id BIGINT, status STRING, price DOUBLE)
          |USING graft PARTITIONED BY (status)
          |TBLPROPERTIES (
          |  'graft.recordkey.field' = 'id',
          |  'graft.precombine.field' = 'price')""".stripMargin)
    val vals = (1 to 30).map(i => s"(${i}L, '${if (i % 2 == 0) "O" else "F"}', $i.0)")
    sql(s"INSERT INTO graft.p_clean_sched VALUES ${vals.mkString(", ")}")
    sql(s"INSERT INTO graft.p_clean_sched VALUES ${vals.mkString(", ")}") // v2

    val planRow = sql("CALL graft.run_clean(`table` => 'p_clean_sched', " +
      "`op` => 'schedule')").collect()
    assert(planRow.length === 1 && planRow(0).getString(0) != null)
    val states0 = sql("CALL graft.show_cleans(`table` => 'p_clean_sched')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(states0(planRow(0).getString(0)) === "REQUESTED")
    val execRow = sql("CALL graft.run_clean(`table` => 'p_clean_sched', " +
      "`op` => 'run')").collect()
    assert(execRow.length === 1 && execRow(0).getString(0) != null)
    val states1 = sql("CALL graft.show_cleans(`table` => 'p_clean_sched')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(states1(planRow(0).getString(0)) === "COMPLETED")
    assert(sql("SELECT count(*) FROM graft.p_clean_sched")
      .collect()(0).getLong(0) === 30L)
    // run with no pending plan schedules one itself (after new debt exists)
    sql(s"INSERT INTO graft.p_clean_sched VALUES ${vals.take(10).mkString(", ")}")
    val auto = sql("CALL graft.run_clean(`table` => 'p_clean_sched', " +
      "`op` => 'run')").collect()
    assert(auto.length === 1 && auto(0).getString(0) != null)
    assert(sql("SELECT count(*) FROM graft.p_clean_sched")
      .collect()(0).getLong(0) === 30L)
    sql("DROP TABLE graft.p_clean_sched")
  }

  test("CALL surface: run_compaction op => schedule / run + show_compaction states") {
    def sql(q: String) = spark.sql(q)
    sql("DROP TABLE IF EXISTS graft.p_sched")
    sql("""CREATE TABLE graft.p_sched (
          |  id BIGINT, status STRING, price DOUBLE)
          |USING graft PARTITIONED BY (status)
          |TBLPROPERTIES (
          |  'graft.recordkey.field' = 'id',
          |  'graft.precombine.field' = 'price',
          |  'graft.table.type' = 'mor')""".stripMargin)
    val vals = (1 to 30).map(i => s"(${i}L, '${if (i % 2 == 0) "O" else "F"}', $i.0)")
    sql(s"INSERT INTO graft.p_sched VALUES ${vals.mkString(", ")}")
    sql(s"INSERT INTO graft.p_sched VALUES ${vals.take(10).mkString(", ")}") // logs

    val planRow = sql(
      "CALL graft.run_compaction(`table` => 'p_sched', `op` => 'schedule')").collect()
    assert(planRow.length === 1 && planRow(0).getString(0) != null)
    val states0 = sql("CALL graft.show_compaction(`table` => 'p_sched')").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(states0(planRow(0).getString(0)) === "REQUESTED")

    val execRow = sql(
      "CALL graft.run_compaction(`table` => 'p_sched', `op` => 'run')").collect()
    assert(execRow.length === 1 && execRow(0).getString(0) != null)
    val states1 = sql("CALL graft.show_compaction(`table` => 'p_sched')").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(states1(planRow(0).getString(0)) === "COMPLETED")
    assert(sql("SELECT count(*) FROM graft.p_sched").collect()(0).getLong(0) === 30L)
    // run with NO pending plan schedules one itself (ref:
    // RunCompactionProcedure): new logs → schedule+run in one call
    sql(s"INSERT INTO graft.p_sched VALUES ${vals.take(5).mkString(", ")}")
    val auto = sql(
      "CALL graft.run_compaction(`table` => 'p_sched', `op` => 'run')").collect()
    assert(auto.length === 1 && auto(0).getString(0) != null)
    assert(sql("SELECT count(*) FROM graft.p_sched").collect()(0).getLong(0) === 30L)
    sql("DROP TABLE graft.p_sched")
  }
}
