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

  /** stats_wa (ref: StatsWriteAmplificationProcedure): rows written per
    * commit vs rows in its incoming batch — COW write amplification.
    * batchRows is recorded at write time from counts the commit already
    * collects; older commits without it report 0/amplification null. */
  def statsWriteAmplification(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    t.timeline.metas(None)
      .filter(m => m.files.nonEmpty && m.extra.contains("batchRows"))
      .map { m =>
        val batch = m.extra("batchRows").toLong
        val written = m.files.map(_.rows).sum
        (m.instant, m.operation, batch, written,
          if (batch > 0) written.toDouble / batch else 0.0)
      }
      .toDF("instant", "operation", "batch_rows", "rows_written",
        "write_amplification")
  }

  /** stats_file_sizes (ref: StatsFileSizeProcedure): live base-file size
    * distribution per partition. */
  def statsFileSizes(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    t.slices(None).flatMap(s => s.baseFiles.map(f => (s.partition, f.bytes)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (p, fs) =>
        val sizes = fs.map(_._2)
        (p, sizes.size.toLong, sizes.min, sizes.max, sizes.sum / sizes.size,
          sizes.sum)
      }
      .toDF("partition", "n_files", "min_bytes", "max_bytes", "avg_bytes",
        "total_bytes")
  }

  /** show_commit_partitions (ref: ShowCommitPartitionsProcedure). */
  def showCommitPartitions(t: GraftTable, instant: String): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    val m = t.timeline.metas(None).find(_.instant == instant).getOrElse(
      throw new IllegalArgumentException(s"no instant $instant on the timeline"))
    m.files.groupBy(_.partition).toSeq.sortBy(_._1)
      .map { case (p, fs) =>
        (p, fs.size.toLong, fs.map(_.rows).sum, fs.map(_.bytes).sum) }
      .toDF("partition", "n_files", "rows_written", "bytes_written")
  }

  /** show_logfile_metadata (ref: ShowHoodieLogFileMetadataProcedure): the
    * MOR log files of one file group, oldest first. */
  def showLogFileMetadata(t: GraftTable, fileId: String): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    t.slices(None).filter(_.fileId == fileId)
      .flatMap(s => s.logs.map { case (i, f) =>
        (s.partition, s.fileId, i, f.path, f.rows, f.bytes) })
      .sortBy(_._3)
      .toDF("partition", "file_id", "instant", "path", "rows", "bytes")
  }

  /** show_bootstrap_mapping (ref: ShowBootstrapMappingProcedure): the
    * metadata-only adopted (external) base files still live. */
  def showBootstrapMapping(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    t.slices(None).flatMap(s => s.baseFiles.filter(_.external)
        .map(f => (s.partition, s.fileId, f.path, f.rows, f.bytes)))
      .toDF("partition", "file_id", "source_file", "rows", "bytes")
  }

  /** repair_deduplicate (ref: RepairDeduplicateProcedure): a partition
    * polluted with duplicate keys (insert misuse) is rewritten keeping the
    * winning version per key — precombine order, commit time as tiebreak —
    * via one partition-scoped insert_overwrite. */
  def repairDeduplicate(t: GraftTable, partition: String): Long = {
    val snap = t.snapshot().filter(col(GraftTable.PART) === partition)
    val ord = t.config.precombineField
      .map(pc => col(pc).desc_nulls_last).toSeq :+ col(GraftTable.COMMIT).desc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(GraftTable.KEY)).orderBy(ord: _*)
    val deduped = snap.withColumn("_g_rn", row_number().over(w))
      .filter(col("_g_rn") === 1)
      .drop("_g_rn", GraftTable.COMMIT, GraftTable.KEY, GraftTable.PART)
    val before = snap.count()
    val after = deduped.count()
    if (before != after) t.insertOverwrite(deduped)
    before - after
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
