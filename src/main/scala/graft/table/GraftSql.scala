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

  /** One row per service instant — inline executions, plus scheduled plans
    * as REQUESTED until an execution commit carries their `planInstant`
    * marker, COMPLETED (at the plan instant) after. Mirrors the reference's
    * requested/completed compaction timeline states. */
  private def serviceRows(t: GraftTable, planAction: String, op: String) = {
    t.timeline.refresh()
    val ms = t.timeline.metas(None)
    val executedBy = ms.filter(_.operation == op)
      .flatMap(m => m.extra.get("planInstant").map(_ -> m)).toMap
    def nGroups(m: graft.table.CommitMeta): Int =
      if (m.replaced.nonEmpty) m.replaced.size
      else m.files.map(f => (f.partition, f.fileId)).distinct.size
    val plans = ms.filter(_.action == planAction).map { p =>
      executedBy.get(p.instant) match {
        case Some(m) => (p.instant, "COMPLETED", m.files.size,
          m.files.map(_.rows).sum, nGroups(m))
        case None => (p.instant, "REQUESTED", 0, 0L,
          p.extra.get("baseInstants").map(_.split('\n').count(_.nonEmpty)).getOrElse(0))
      }
    }
    val inline = ms
      .filter(m => m.operation == op && !m.extra.contains("planInstant"))
      .map(m => (m.instant, "COMPLETED", m.files.size, m.files.map(_.rows).sum,
        nGroups(m)))
    (plans ++ inline).sortBy(_._1)
  }

  /** show_compaction (ref: ShowCompactionProcedure): compaction instants —
    * inline runs are COMPLETED; scheduled plans show REQUESTED until
    * executed. */
  def showCompaction(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    serviceRows(t, "compactionreq", "compact")
      .toDF("instant", "state", "n_files_written", "rows_written", "n_groups_compacted")
  }

  /** show_clustering (ref: ShowClusteringProcedure): clustering
    * replacecommits plus scheduled plans (same state model as
    * [[showCompaction]]). */
  def showClustering(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    serviceRows(t, "clusteringreq", "cluster")
      .toDF("instant", "state", "n_files_written", "rows_written", "n_groups_replaced")
  }

  /** show_metrics (ref: hudi-client-common metrics/HoodieMetrics.java —
    * commit duration / files / records / bytes counters; the external
    * reporters — Graphite, Prometheus, CloudWatch — stay excluded as
    * external systems): one row per data commit, derived from the
    * timeline's own records, so metrics are durable and shared across
    * writers instead of living in one JVM's registry. */
  def showMetrics(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    t.timeline.metas(None)
      .filter(m => Set("commit", "deltacommit", "replacecommit")(m.action))
      .map(m => (m.instant, m.action, m.operation,
        m.extra.get("durationMs").map(_.toLong).getOrElse(-1L),
        m.files.size.toLong, m.files.map(_.rows).sum, m.files.map(_.bytes).sum,
        m.extra.get("batchRows").map(_.toLong).getOrElse(-1L)))
      .toDF("instant", "action", "operation", "duration_ms", "n_files",
        "rows_written", "bytes_written", "batch_rows")
  }

  /** show_indexing (ref: HoodieIndexer's schedule/run states): async
    * indexing plans — REQUESTED until their execution instant lands, then
    * COMPLETED with the backfilled file count (which can be below the
    * planned count when files were cleaned/replaced in between). */
  def showIndexing(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    val ms = t.timeline.metas(None)
    val executedBy = ms.filter(_.action == "indexing")
      .flatMap(m => m.extra.get("planInstant").map(_ -> m)).toMap
    ms.filter(_.action == "indexingreq").map { p =>
      val planned = p.extra.get("paths").map(_.split('\n').count(_.nonEmpty)).getOrElse(0)
      executedBy.get(p.instant) match {
        case Some(m) => (p.instant, "COMPLETED", planned,
          m.extra.get("indexedFiles").map(_.toInt).getOrElse(0))
        case None => (p.instant, "REQUESTED", planned, 0)
      }
    }.sortBy(_._1)
      .toDF("instant", "state", "n_files_planned", "n_files_indexed")
  }

  /** show_cleans (CLI `cleans show` parity; same state model as
    * [[showCompaction]]): every clean — inline runs and scheduled plans —
    * with its file count, retention boundary and, for executions of a
    * plan, the plan instant. */
  def showCleans(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    val ms = t.timeline.metas(None)
    val executedBy = ms.filter(m => m.action == "clean")
      .flatMap(m => m.extra.get("planInstant").map(_ -> m)).toMap
    val plans = ms.filter(_.action == "cleanreq").map { p =>
      executedBy.get(p.instant) match {
        case Some(m) => (p.instant, "COMPLETED", m.deletedPaths.size.toLong,
          m.extra.getOrElse("earliestRetained", ""), m.instant)
        case None => (p.instant, "REQUESTED", p.deletedPaths.size.toLong,
          p.extra.getOrElse("earliestRetained", ""), "")
      }
    }
    val inline = ms
      .filter(m => m.action == "clean" && !m.extra.contains("planInstant"))
      .map(m => (m.instant, "COMPLETED", m.deletedPaths.size.toLong,
        m.extra.getOrElse("earliestRetained", ""), ""))
    (plans ++ inline).sortBy(_._1)
      .toDF("instant", "state", "n_files_deleted", "earliest_retained",
        "execution_instant")
  }

  /** show_commit_write_stats (ref: ShowCommitWriteStatsProcedure):
    * per-commit totals of the write it performed. Data actions only — a
    * service PLAN instant also records files (its pinned inputs), which are
    * reads, not writes. */
  def showCommitWriteStats(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    t.timeline.metas(None).filter(m => m.files.nonEmpty &&
        Set("commit", "deltacommit", "replacecommit")(m.action))
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

  /** show_commits_metadata (ref: ShowCommitsMetadataProcedure): per-commit
    * detail beyond show_commits — partitions touched, bytes, deletions,
    * and the extra key/values the write recorded. */
  def showCommitsMetadata(t: GraftTable, limit: Int): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    t.timeline.metas(None).takeRight(limit)
      .map(m => (m.instant, m.action, m.operation,
        m.files.map(_.partition).distinct.size, m.files.size,
        m.files.count(_.isLog), m.files.map(_.rows).sum,
        m.files.map(_.bytes).sum, m.replaced.size, m.deletedPaths.size,
        m.extra.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(", ")))
      .toDF("instant", "action", "operation", "n_partitions", "n_files",
        "n_log_files", "rows_written", "bytes_written", "n_replaced",
        "n_deleted_paths", "extra")
  }

  /** show_archived_commits_metadata (ref:
    * ShowArchivedCommitsMetadataProcedure): same detail for instants folded
    * into the archive timeline. */
  def showArchivedCommitsMetadata(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.archivedMetas()
      .map(m => (m.instant, m.action, m.operation, m.files.size,
        m.files.map(_.rows).sum, m.files.map(_.bytes).sum, m.replaced.size))
      .toDF("instant", "action", "operation", "n_files", "rows_written",
        "bytes_written", "n_replaced")
  }

  /** show_fsview_latest (ref: ShowLatestFileSystemViewProcedure): the
    * latest file slice per group of ONE partition, with the log-debt detail
    * (delta bytes, delta/base ratio) compaction planning looks at. */
  def showFsViewLatest(t: GraftTable, partition: String): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    t.slices(None).filter(_.partition == partition)
      .map { s =>
        val baseBytes = s.baseFiles.map(_.bytes).sum
        val logBytes = s.logs.map(_._2.bytes).sum
        (s.partition, s.fileId, s.baseInstant, baseBytes, s.logs.size,
          logBytes,
          if (baseBytes > 0) logBytes.toDouble / baseBytes else 0.0)
      }
      .toDF("partition", "file_id", "base_instant", "base_bytes", "n_logs",
        "log_bytes", "log_to_base_ratio")
  }

  /** show_rollback_detail (ref: ShowRollbackDetailProcedure): the files one
    * rollback instant physically deleted. */
  def showRollbackDetail(t: GraftTable, instant: String): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    val m = t.timeline.metas(None)
      .find(mm => mm.instant == instant && mm.action == "rollback")
      .getOrElse(throw new IllegalArgumentException(
        s"no rollback instant $instant on the timeline"))
    m.deletedPaths.map(p => (m.instant, m.extra.getOrElse("rolledBack", ""), p))
      .toDF("rollback_instant", "rolled_back_instant", "deleted_path")
  }

  /** show_logfile_records (ref: ShowHoodieLogFileRecordsProcedure): sample
    * raw (unmerged) records from one file group's MOR logs, oldest log
    * first — each row as JSON so the result schema is stable across
    * tables. */
  def showLogFileRecords(t: GraftTable, fileId: String, limit: Int): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    val logPaths = t.slices(None).filter(_.fileId == fileId)
      .flatMap(_.logs.sortBy(_._1).map(_._2.path))
      .map(p => s"${t.basePath}/$p")
    if (logPaths.isEmpty) Seq.empty[String].toDF("record")
    else t.spark.read.format(t.config.baseFileFormat).load(logPaths: _*)
      .limit(limit).toJSON.toDF("record")
  }

  /** show_bootstrap_partitions (ref: ShowBootstrapPartitionsProcedure):
    * partitions still carrying metadata-only adopted (external) files. */
  def showBootstrapPartitions(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    t.slices(None).filter(_.baseFiles.exists(_.external))
      .map(_.partition).distinct.sorted.toDF("partition")
  }

  /** show_fs_path_detail (ref: ShowFsPathDetailProcedure): recursive file
    * listing with sizes under any path — the storage-debugging view. */
  def showFsPathDetail(spark: SparkSession, path: String, limit: Int): DataFrame = {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get(path)
    require(Files.exists(root), s"path '$path' does not exist")
    val walk = Files.walk(root)
    try walk.iterator().asScala.filter(Files.isRegularFile(_)).take(limit)
      .map(p => (root.relativize(p).toString, Files.size(p),
        Files.getLastModifiedTime(p).toMillis))
      .toSeq.sortBy(_._1)
      .toDF("relative_path", "bytes", "modified_ms")
    finally walk.close()
  }

  // ------------------------------------------------- metadata-table family

  private def requireMetadataTable(t: GraftTable): DataFrame = {
    require(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(t.basePath, ".graft", "metadata", "files")),
      "no metadata table: run sync_metadata_table first")
    t.metadataTable()
  }

  /** show_metadata_table_files (ref: ShowMetadataTableFilesProcedure). */
  def showMetadataTableFiles(t: GraftTable): DataFrame =
    requireMetadataTable(t)
      .select("partition", "file_id", "instant", "path", "rows", "is_log")
      .orderBy("partition", "file_id", "instant")

  /** show_metadata_table_partitions (ref:
    * ShowMetadataTablePartitionsProcedure). */
  def showMetadataTablePartitions(t: GraftTable): DataFrame =
    requireMetadataTable(t).select("partition").distinct().orderBy("partition")

  /** show_metadata_table_stats (ref: ShowMetadataTableStatsProcedure). */
  def showMetadataTableStats(t: GraftTable): DataFrame =
    requireMetadataTable(t).groupBy("partition")
      .agg(count("*").as("n_files"), sum("rows").as("rows"),
        sum(when(col("is_log"), 1L).otherwise(0L)).as("n_log_files"))
      .orderBy("partition")

  /** validate_metadata_table_files (ref:
    * ValidateMetadataTableFilesProcedure): diff the PERSISTED metadata
    * table's file listing against the live timeline's — stale sync shows up
    * as only_metadata / only_timeline rows; an in-sync table returns none. */
  def validateMetadataTableFiles(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh()
    val metaPaths = requireMetadataTable(t).select("path").as[String]
      .collect().toSet
    val livePaths = t.slices(None)
      .flatMap(s => s.baseFiles.map(_.path) ++ s.logs.map(_._2.path)).toSet
    ((metaPaths -- livePaths).toSeq.sorted.map(p => (p, "only_metadata")) ++
      (livePaths -- metaPaths).toSeq.sorted.map(p => (p, "only_timeline")))
      .toDF("path", "presence")
  }

  /** validate_data_table (ref: hudi-utilities HoodieDataTableValidator):
    * diff the data files PHYSICALLY on storage against the timeline's
    * accounting. `dangling` = on disk but added by no active meta (crash
    * leftovers `rollback_failed_writes` would sweep — orphaned bytes);
    * `missing` = accounted for but absent (corruption / external
    * deletion). Files of a still-inflight instant are neither. Bloom
    * sidecars ride their base file's accounting. Directory discovery is a
    * driver walk (O(#partitions)); the per-file listing runs as ONE Spark
    * job over the directories, so at millions of files the driver sees
    * only the discrepancy rows. */
  def validateDataTable(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    import scala.jdk.CollectionConverters._
    t.timeline.refresh()
    val metas = t.timeline.metas(None)
    val known = metas.flatMap(_.files.map(_.path)).toSet --
      metas.flatMap(_.deletedPaths)
    // instants a LIVE writer has claimed: an .inflight marker not yet
    // completed/archived. Only their files are excused — an unsettled
    // instant WITHOUT a claim is exactly the crash leftover this
    // validator exists to surface.
    val settled = t.timeline.completed().map(_._1).toSet ++
      t.timeline.archivedInstants()
    val claimed = {
      val s = java.nio.file.Files.list(t.timeline.dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".inflight"))
        .map(_.stripSuffix(".inflight").takeWhile(_ != '.')).toSet
      finally s.close()
    } -- settled
    val base = java.nio.file.Paths.get(t.basePath)
    val dirs = {
      val w = java.nio.file.Files.walk(base)
      try w.iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          !base.relativize(p).toString.contains(".graft"))
        .map(_.toString).toVector.sorted
      finally w.close()
    }
    val baseStr = t.basePath
    val slicesN = math.max(1, math.min(dirs.size,
      t.spark.sparkContext.defaultParallelism))
    val onDisk = t.spark.sparkContext.parallelize(dirs, slicesN)
      .flatMap { d =>
        val dir = java.nio.file.Paths.get(d)
        val s = java.nio.file.Files.list(dir)
        try s.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(p => java.nio.file.Paths.get(baseStr).relativize(p).toString)
          .filterNot { rel =>
            val name = rel.substring(rel.lastIndexOf('/') + 1)
            name.startsWith(".") || name.endsWith(".crc")
          }.toVector
        finally s.close()
      }.collect().toSet
    // data files carry their creating instant in the name:
    // [log_]<fid>_<instant>[_i].<ext> — a CLAIMED instant's files belong
    // to a live writer, not to either discrepancy bucket
    val instantPat = "_(\\d{17})(_\\d+)?\\.[^/]*$".r
    def inFlight(path: String): Boolean =
      instantPat.findFirstMatchIn(path).exists(m => claimed(m.group(1)))
    def accounted(path: String): Boolean =
      known(path) || (path.endsWith(".bloom") &&
        known(path.stripSuffix(".bloom")))
    val dangling = onDisk.filterNot(p => accounted(p) || inFlight(p))
    val missing = known -- onDisk
    (dangling.toSeq.sorted.map(p => (p, "dangling")) ++
      missing.toSeq.sorted.map(p => (p, "missing")))
      .toDF("path", "issue")
  }

  /** repair_table (ref: hudi-utilities HoodieRepairTool.java — Mode
    * REPAIR / DRY_RUN / UNDO): dangling files (present on storage, in no
    * commit's accounting, not claimed by a live writer — exactly
    * [[validateDataTable]]'s `dangling` bucket) are MOVED to a backup
    * under `.graft/repair_backup/<id>/` preserving relative layout, so a
    * mistaken repair is reversible; `dry_run` only lists; `undo` restores
    * a named backup. The file set is crash debris — metadata-sized by
    * definition — so the moves run on the driver like the reference's
    * backup bookkeeping; the DETECTION underneath stays the validator's
    * one distributed listing job. */
  def repairTable(t: GraftTable, mode: String,
      backup: Option[String] = None): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import t.spark.implicits._
    val m = mode.toLowerCase
    require(Set("dry_run", "repair", "undo")(m),
      s"unknown repair mode '$mode' (dry_run | repair | undo)")
    val base = Paths.get(t.basePath)
    val backupRoot = Paths.get(t.basePath, ".graft", "repair_backup")
    if (m == "undo") {
      val id = backup.getOrElse(
        sys.error("repair undo needs backup => '<backup id>'"))
      // the id names a DIRECTLY-nested backup directory; a traversal id
      // ('..', path separators) would let the walk+move below relocate
      // arbitrary reachable files into the table root and then delete the
      // escaped directory — reject anything that is not a plain child name
      require(!id.contains('/') && !id.contains('\\') && id != ".." &&
        id != "." && id.nonEmpty,
        s"invalid backup id '$id' (must be a plain directory name)")
      val dir = backupRoot.resolve(id).normalize()
      require(dir.startsWith(backupRoot.normalize()),
        s"backup id '$id' escapes the backup root")
      require(Files.isDirectory(dir), s"no repair backup '$id'")
      val restored = Fs.walk(dir).filter(Files.isRegularFile(_)).map { p =>
        val rel = dir.relativize(p)
        val dest = base.resolve(rel)
        Files.createDirectories(dest.getParent)
        Files.move(p, dest, StandardCopyOption.REPLACE_EXISTING)
        rel.toString
      }
      GraftTable.drop(dir.toString)
      restored.sorted.map((_, "restored", id)).toDF("path", "action", "backup")
    } else {
      val dangling = validateDataTable(t)
        .filter(col("issue") === "dangling")
        .select("path").as[String].collect().sorted.toSeq
      if (m == "dry_run")
        dangling.map((_, "would_move", "")).toDF("path", "action", "backup")
      else {
        val id = java.time.format.DateTimeFormatter
          .ofPattern("yyyyMMddHHmmssSSS")
          .format(java.time.LocalDateTime.now(java.time.ZoneOffset.UTC))
        val moved = dangling.map { rel =>
          val dest = backupRoot.resolve(id).resolve(rel)
          Files.createDirectories(dest.getParent)
          Files.move(base.resolve(rel), dest)
          rel
        }
        moved.map((_, "moved", id)).toDF("path", "action", "backup")
      }
    }
  }

  /** delete_metadata_table (ref: DeleteMetadataTableProcedure): remove the
    * persisted metadata sidecar (reads fall back to timeline resolution). */
  def deleteMetadataTable(t: GraftTable): Boolean = {
    val dir = java.nio.file.Paths.get(t.basePath, ".graft", "metadata")
    val existed = java.nio.file.Files.isDirectory(dir)
    if (existed) GraftTable.drop(dir.toString)
    existed
  }

  // --------------------------------------------------- repair / marker ops

  /** delete_marker (ref: DeleteMarkerProcedure): clear the write-in-progress
    * markers of one instant — the leftover `.inflight` claim plus any
    * staged-but-never-committed files — after a writer died mid-commit.
    * Completed instants are untouched (their markers are already gone). */
  def deleteMarker(t: GraftTable, instant: String): Long = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    t.timeline.refresh()
    require(!t.timeline.completed().exists(_._1 == instant),
      s"instant $instant is completed — roll it back instead")
    val tdir = Paths.get(t.basePath, ".graft", "timeline")
    var removed = 0L
    if (Files.isDirectory(tdir))
      Fs.list(tdir)
        .filter(_.getFileName.toString.startsWith(s"$instant."))
        .filter(_.getFileName.toString.endsWith(".inflight"))
        .foreach { p => Files.deleteIfExists(p); removed += 1 }
    val staging = Paths.get(t.basePath, ".graft", s"staging_$instant")
    if (Files.isDirectory(staging)) {
      val walk = Files.walk(staging)
      val n = try walk.iterator().asScala.count(Files.isRegularFile(_))
              finally walk.close()
      GraftTable.drop(staging.toString)
      removed += n
    }
    removed
  }

  /** repair_corrupted_clean_files (ref:
    * RepairCorruptedCleanFilesProcedure): remove clean/rollback instant
    * files that no longer parse (partial write, disk fault) so the timeline
    * loads again. Data instants are never auto-deleted — a corrupt commit
    * is surfaced, not destroyed. */
  def repairCorruptedCleanFiles(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val tdir = Paths.get(t.basePath, ".graft", "timeline")
    val removed = (if (!Files.isDirectory(tdir)) Nil
    else Fs.list(tdir)
      .filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".clean.json") || n.endsWith(".rollback.json")
      }
      .filter { p =>
        try { Json.mapper.readValue[CommitMeta](Files.readAllBytes(p)); false }
        catch { case _: Exception => true }
      }
      .map { p => val n = p.getFileName.toString; Files.delete(p); n })
    t.timeline.refresh()
    removed.toDF("removed_file")
  }

  /** validate_sync (ref: ValidateHoodieSyncProcedure — src/dst count
    * validation after a sync/copy): diff two tables' live row counts per
    * partition. Rows = discrepancies; an in-sync replica returns none.
    * Both sides stay fully distributed (two snapshot aggregates joined on
    * the partition path); only the per-partition counts reach the driver. */
  def validateSync(src: GraftTable, dst: GraftTable): DataFrame = {
    def counts(t: GraftTable, as: String) =
      t.snapshot().groupBy(col(GraftTable.PART).as("partition"))
        .agg(count("*").as(as))
    counts(src, "src_rows")
      .join(counts(dst, "dst_rows"), Seq("partition"), "full_outer")
      .withColumn("src_rows", coalesce(col("src_rows"), lit(0L)))
      .withColumn("dst_rows", coalesce(col("dst_rows"), lit(0L)))
      .filter(col("src_rows") =!= col("dst_rows"))
      .orderBy("partition")
  }

  /** export_snapshot (ref: hudi-utilities HoodieSnapshotExporter): write
    * the live snapshot as PLAIN files (parquet | json | orc) under a fresh
    * directory — the off-ramp for consumers without the graft reader. Meta
    * columns are dropped; `PartitionByColumns` tables keep their hive
    * layout via partitionBy. One distributed write job; only the file
    * count is collected. */
  def exportSnapshot(t: GraftTable, outPath: String, format: String): Long = {
    require(Set("parquet", "json", "orc")(format),
      s"unknown export format '$format' (parquet | json | orc)")
    require(!java.nio.file.Files.exists(java.nio.file.Paths.get(outPath)),
      s"export target '$outPath' already exists (exporter refuses overwrite)")
    val df = t.snapshot().drop(GraftTable.metaCols: _*)
    val w = t.config.partitioning match {
      case p: PartitionByColumns => df.write.partitionBy(p.cols: _*)
      case _ => df.write
    }
    w.format(format).save(outPath)
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(outPath))
    try walk.iterator().asScala.count(p =>
      java.nio.file.Files.isRegularFile(p) &&
        !p.getFileName.toString.startsWith("_"))
    finally walk.close()
  }

  /** repair_overwrite_props (ref: RepairOverwriteHoodiePropsProcedure):
    * overwrite the MUTABLE write-config subset from `k=v` pairs — the same
    * vocabulary ALTER TABLE SET TBLPROPERTIES accepts (file sizing, merge
    * payload, schema-on-read). Structural config (keys, partitioning, type,
    * index) is identity and cannot be repaired over. Returns the resulting
    * effective properties. */
  def repairOverwriteProps(t: GraftTable, props: Map[String, String]): DataFrame = {
    import t.spark.implicits._
    import graft.DefaultSource.{PAYLOAD, SCHEMA_ON_READ, TARGET_FILE_ROWS}
    var cfg = t.config
    props.foreach {
      case (TARGET_FILE_ROWS, v) => cfg = cfg.copy(targetFileSizeRows = v.toLong)
      case (PAYLOAD, v) => cfg = cfg.copy(payload = MergePayload.of(v))
      case (SCHEMA_ON_READ, v) => cfg = cfg.copy(schemaOnRead = v.toBoolean)
      case (other, _) => throw new IllegalArgumentException(
        s"property '$other' is not repairable " +
          s"(mutable: $TARGET_FILE_ROWS, $PAYLOAD, $SCHEMA_ON_READ)")
    }
    GraftTable.saveConfig(t.basePath, cfg)
    Seq(
      (TARGET_FILE_ROWS, cfg.targetFileSizeRows.toString),
      (PAYLOAD, cfg.payload.name),
      (SCHEMA_ON_READ, cfg.schemaOnRead.toString))
      .toDF("property", "value")
  }
}
