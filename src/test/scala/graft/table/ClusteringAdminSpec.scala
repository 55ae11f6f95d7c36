package graft.table

import java.nio.file.{Files, Paths}
import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Clustering admin — the clustering-side twin of [[CompactionAdminSpec]]
  * (ref: hudi-cli ClusteringCommand). */
class ClusteringAdminSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def cowWithPlan(): (GraftTable, String, String) = {
    val dir = Files.createTempDirectory("graft_cladmin_").toString
    val t = GraftTable.create(spark, dir, TableConfig("cladmin", CopyOnWrite,
      keyFields = Seq("id")))
    t.bulkInsert((1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    t.insert(Seq((11L, "v11"), (12L, "v12")).toDF("id", "v"))
    val plan = t.scheduleClustering(Seq("id")).get
    (t, dir, plan)
  }

  test("unschedule drops the plan: unpinned, unexecutable, schedulable again") {
    val (t, dir, plan) = cowWithPlan()
    assert(t.pendingPlans().map(_._1) === Seq(plan))
    assert(t.scheduleClustering(Seq("id")).isEmpty) // groups pinned
    t.unscheduleClustering(plan)
    assert(t.pendingPlans().isEmpty)
    val e = intercept[Exception](t.runClustering(plan))
    assert(e.getMessage.contains(plan))
    val plan2 = t.scheduleClustering(Seq("id")).get
    assert(t.runClustering(plan2).isDefined)
    assert(t.snapshot().count() === 12)
    assert(intercept[Exception](t.unscheduleClustering(plan))
      .getMessage.contains("no pending clustering plan"))
    assert(intercept[Exception](t.unscheduleClustering(plan2))
      .getMessage.contains("already executed"))
    GraftTable.drop(dir)
  }

  test("validate: ok, missing_files on deletion, superseded after a rewrite") {
    val (t, dir, plan) = cowWithPlan()
    assert(t.validateClusteringPlan(plan).map(_._2).forall(_ == "ok"))

    // delete one planned base file from storage -> missing_files
    val basePath = t.slices(None).head.baseFiles.head.path
    Files.delete(Paths.get(dir, basePath))
    val statuses = t.validateClusteringPlan(plan).map(_._2)
    assert(statuses.exists(_.startsWith("missing_files:")), statuses)
    GraftTable.drop(dir)

    // supersede: inline clustering rewrites the planned groups
    val (t2, dir2, plan2) = cowWithPlan()
    t2.unscheduleClustering(plan2)
    val plan3 = t2.scheduleClustering(Seq("id")).get
    t2.cluster(Seq("id"))
    assert(t2.validateClusteringPlan(plan3).map(_._2).toSet ===
      Set("superseded"))
    GraftTable.drop(dir2)

    // an upserted (re-based) group on COW also reads superseded
    val (t3, dir3, plan4) = cowWithPlan()
    t3.upsert(Seq((1L, "V1")).toDF("id", "v"))
    assert(t3.validateClusteringPlan(plan4).map(_._2).contains("superseded"))
    GraftTable.drop(dir3)
  }

  test("CALL unschedule_clustering / validate_clustering") {
    val (t, dir, plan) = cowWithPlan()
    spark.sql(s"CALL graft.sync_catalog(path => '$dir', db => 'cladmdb')")
    spark.sql("CALL graft.validate_clustering(table => 'cladmdb.cladmin', " +
        s"instant => '$plan')").collect()
      .foreach(r => assert(r.getString(1) === "ok"))
    spark.sql("CALL graft.unschedule_clustering(table => 'cladmdb.cladmin', " +
      s"instant => '$plan')").collect()
    t.timeline.refresh()
    assert(t.pendingPlans().isEmpty)
    GraftTable.drop(dir)
  }
}
