package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The reference's Spark-SQL DML surface as a typed API
 * (ref: hudi-spark-datasource/hudi-spark/.../command/UpdateHoodieTableCommand
 * .scala, DeleteHoodieTableCommand.scala, CreateHoodieTableAsSelectCommand
 * .scala): UPDATE ... SET ... WHERE, DELETE WHERE, CTAS. Each routes through
 * the table's normal upsert/delete write path, so indexes, precombine,
 * services and the timeline all apply.
 */
object GraftSql {

  /** UPDATE t SET <assignments> WHERE <cond>: reads only the rows matching
    * the predicate (partition + stats pruning apply via the snapshot scan's
    * pushed filters), applies the assignments, upserts them back.
    *
    * All assignment expressions are evaluated against the OLD row in one
    * projection — SQL UPDATE semantics — so `SET a = b, b = a` swaps
    * (sequential withColumn would make later assignments read earlier
    * ones' results, nondeterministically ordered by Map iteration). */
  def update(t: GraftTable, assignments: Map[String, Column], where: Column): String = {
    val matched = t.snapshot().filter(where)
    val existing = matched.columns.map { c =>
      assignments.get(c).map(_.as(c)).getOrElse(col(c))
    }.toSeq
    val added = (assignments.keySet -- matched.columns).toSeq.sorted
      .map(c => assignments(c).as(c)) // SET of a new column = schema evolution
    val updated = matched.select(existing ++ added: _*)
    t.upsert(updated.drop(GraftTable.COMMIT, GraftTable.KEY, GraftTable.PART))
  }

  /** DELETE FROM t WHERE <cond>. */
  def deleteWhere(t: GraftTable, where: Column): String = {
    val doomed = t.snapshot().filter(where)
      .drop(GraftTable.COMMIT, GraftTable.KEY, GraftTable.PART)
    t.delete(doomed)
  }

  /** CREATE TABLE ... AS SELECT: create a table from a query result. */
  def createTableAsSelect(spark: SparkSession, path: String,
      config: TableConfig, query: DataFrame): GraftTable = {
    val t = GraftTable.create(spark, path, config)
    t.bulkInsert(query)
    t
  }

  /** Hive-sync-style catalog registration (ref: hudi-sync/hudi-hive-sync
    * HiveSyncTool): register `<name>` + `<name>_rt` (snapshot) and
    * `<name>_ro` (read-optimized) views so plain `spark.sql` queries the
    * table by name — the same rt/ro pair hive-sync exposes for MOR tables.
    * Re-run after commits to pick up new file slices (hive-sync likewise
    * re-syncs partitions per commit). */
  def syncViews(t: GraftTable, name: String): Unit = {
    t.snapshot().createOrReplaceTempView(name)
    t.snapshot().createOrReplaceTempView(s"${name}_rt")
    t.readOptimized().createOrReplaceTempView(s"${name}_ro")
  }

  /** show_savepoints (ref: ShowSavepointsProcedure). */
  def showSavepoints(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh() // must observe other writers' commits
    t.timeline.metas(None).filter(_.action == "savepoint")
      .map(m => (m.instant, m.extra.getOrElse("saved", "")))
      .toDF("savepoint_instant", "saved_data_instant")
  }

  /** commits_compare (ref: CommitsCompareProcedure): instants present in
    * one table's timeline but not the other's. */
  def commitsCompare(a: GraftTable, b: GraftTable): DataFrame = {
    import a.spark.implicits._
    a.timeline.refresh(); b.timeline.refresh() // cross-writer read
    val ai = a.timeline.completed().map(_._1).toSet
    val bi = b.timeline.completed().map(_._1).toSet
    ((ai -- bi).toSeq.sorted.map(i => (i, "only_left")) ++
      (bi -- ai).toSeq.sorted.map(i => (i, "only_right")))
      .toDF("instant", "presence")
  }

  /** show_compaction (ref: ShowCompactionProcedure): compaction instants.
    * Graft compactions run synchronously inside one commit, so every row is
    * COMPLETED — the reference's REQUESTED/INFLIGHT states belong to its
    * async plan files. */
  def showCompaction(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    t.timeline.metas(None).filter(_.operation == "compact")
      .map(m => (m.instant, "COMPLETED", m.files.size, m.files.map(_.rows).sum,
        m.replaced.size))
      .toDF("instant", "state", "n_files_written", "rows_written", "n_groups_compacted")
  }

  /** show_clustering (ref: ShowClusteringProcedure): clustering
    * replacecommits, all COMPLETED (same synchronous-service note as
    * [[showCompaction]]). */
  def showClustering(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    t.timeline.metas(None).filter(_.operation == "cluster")
      .map(m => (m.instant, "COMPLETED", m.files.size, m.files.map(_.rows).sum,
        m.replaced.size))
      .toDF("instant", "state", "n_files_written", "rows_written", "n_groups_replaced")
  }

  /** show_commit_write_stats (ref: ShowCommitWriteStatsProcedure):
    * per-commit totals of the write it performed. */
  def showCommitWriteStats(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    t.timeline.metas(None).filter(_.files.nonEmpty)
      .map(m => (m.instant, m.action, m.operation, m.files.size,
        m.files.map(_.rows).sum, m.files.map(_.bytes).sum))
      .toDF("instant", "action", "operation", "total_files_added",
        "total_records_written", "total_bytes_written")
  }

  /** show_commit_files (ref: ShowCommitFilesProcedure): the files one
    * commit wrote. */
  def showCommitFiles(t: GraftTable, instant: String): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    val m = t.timeline.metas(None).find(_.instant == instant).getOrElse(
      throw new IllegalArgumentException(s"no instant $instant on the timeline"))
    m.files.map(f => (f.partition, f.fileId, f.path, f.rows, f.bytes, f.isLog))
      .toDF("partition", "file_id", "path", "rows", "bytes", "is_log")
  }

  /** show_rollbacks (ref: ShowRollbacksProcedure): rollback instants, the
    * data instant each undid, and how many files it deleted. */
  def showRollbacks(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    t.timeline.metas(None).filter(_.action == "rollback")
      .map(m => (m.instant, m.extra.getOrElse("rolledBack", ""),
        m.deletedPaths.size))
      .toDF("rollback_instant", "rolled_back_instant", "n_files_deleted")
  }

  /** export_instants (ref: ExportInstantsProcedure): copy the newest
    * `limit` timeline instant files to a local directory for offline
    * inspection/backup. Returns one row per exported instant. */
  def exportInstants(t: GraftTable, outDir: String, limit: Int): DataFrame = {
    import t.spark.implicits._
    import java.nio.file.{Files, Paths, StandardCopyOption}
    t.timeline.refresh()
    val dir = Paths.get(outDir)
    Files.createDirectories(dir)
    val exported = t.timeline.completed().takeRight(limit).map { case (i, action) =>
      val name = s"$i.$action.json"
      Files.copy(Paths.get(t.basePath, ".graft", "timeline", name),
        dir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
      (i, action, dir.resolve(name).toString)
    }
    exported.toDF("instant", "action", "exported_to")
  }
}
