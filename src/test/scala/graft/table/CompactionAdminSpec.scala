package graft.table

import java.nio.file.{Files, Paths}
import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Compaction admin (ref: hudi-utilities HoodieCompactionAdminTool —
  * VALIDATE / UNSCHEDULE_PLAN). */
class CompactionAdminSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def morWithPlan(): (GraftTable, String, String) = {
    val dir = Files.createTempDirectory("graft_cadmin_").toString
    val t = GraftTable.create(spark, dir, TableConfig("cadmin", MergeOnRead,
      keyFields = Seq("id")))
    t.bulkInsert((1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    t.upsert(Seq((1L, "V1"), (2L, "V2")).toDF("id", "v")) // log files
    val plan = t.scheduleCompaction().get
    (t, dir, plan)
  }

  test("unschedule drops the plan: unpinned, unexecutable, schedulable again") {
    val (t, dir, plan) = morWithPlan()
    assert(t.pendingPlans().map(_._1) === Seq(plan))
    // while pending, the groups are pinned — no second plan forms
    assert(t.scheduleCompaction().isEmpty)
    t.unscheduleCompaction(plan)
    assert(t.pendingPlans().isEmpty)
    val e = intercept[Exception](t.runCompaction(plan))
    assert(e.getMessage.contains(plan))
    // groups schedulable again; the new plan compacts normally
    val plan2 = t.scheduleCompaction().get
    assert(t.runCompaction(plan2).isDefined)
    assert(t.snapshot().filter(org.apache.spark.sql.functions.col("id") === 1)
      .select("v").as[String].head() === "V1")
    // double-unschedule and unscheduling an executed plan fail loudly
    assert(intercept[Exception](t.unscheduleCompaction(plan))
      .getMessage.contains("no pending compaction plan"))
    assert(intercept[Exception](t.unscheduleCompaction(plan2))
      .getMessage.contains("already executed"))
    GraftTable.drop(dir)
  }

  test("validate: ok, then superseded after inline compaction, missing_files on deletion") {
    val (t, dir, plan) = morWithPlan()
    assert(t.validateCompactionPlan(plan).map(_._2).forall(_ == "ok"))

    // delete one planned log file from storage -> missing_files
    val logPath = t.slices(None).filter(_.logs.nonEmpty)
      .head.logs.head._2.path
    Files.delete(Paths.get(dir, logPath))
    val statuses = t.validateCompactionPlan(plan).map(_._2)
    assert(statuses.exists(_.startsWith("missing_files:")), statuses)
    assert(statuses.forall(s => s == "ok" || s.contains(logPath)))

    // restore via a fresh write then supersede the group: inline compact
    GraftTable.drop(dir)
    val (t2, dir2, plan2) = morWithPlan()
    t2.unscheduleCompaction(plan2)
    val plan3 = t2.scheduleCompaction().get
    t2.compact() // inline compaction rewrites the planned groups
    assert(t2.validateCompactionPlan(plan3).map(_._2).toSet ===
      Set("superseded"))
    GraftTable.drop(dir2)
  }
}
