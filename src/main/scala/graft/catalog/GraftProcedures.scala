package graft.catalog

import java.util
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{
  BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.table._

/**
 * The reference's `CALL` procedure surface (ref: hudi-spark-datasource/
 * hudi-spark/src/main/scala/org/apache/spark/sql/hudi/command/procedures/
 * HoodieProcedures.scala:31 — run_compaction, run_clustering, run_clean,
 * archive_commits, rollback_to_instant, create/delete_savepoint,
 * rollback_to_savepoint, show_commits, show_fsview_all, commits_compare, …)
 * expressed through Spark 4's native stored-procedure API: [[GraftCatalog]]
 * implements `ProcedureCatalog`, so literal SQL like
 *
 *   CALL graft.run_compaction(`table` => 'db.orders')
 *   CALL graft.show_commits(`table` => 'db.orders', `limit` => 5)
 *
 * resolves, binds named/default arguments, executes the table service, and
 * returns its result rows — where the reference needs a forked SQL parser
 * for CALL, Spark 4 makes it a first-class statement.
 *
 * Each procedure is a thin adapter: resolve the `table` argument through the
 * catalog, invoke the existing typed API (GraftTable / GraftSql — the same
 * code paths the specs and oracle queries exercise), and surface the result
 * as driver-local rows ([[LocalScan]] — every result here is
 * metadata-sized: instants, file listings, counts).
 */
object GraftProcedures {

  /** A procedure definition: fixed IN parameters, a body from bound args to
    * result rows. */
  private final case class Proc(
      procName: String,
      desc: String,
      params: Seq[ProcedureParameter],
      body: (GraftCatalog, Args) => (StructType, Array[InternalRow]))

  /** A definition bound to one catalog instance. Parameter binding is
    * trivial — parameters are statically typed, and Spark's analyzer has
    * already rearranged named args and filled defaults by the time `call`
    * runs. */
  private final class BoundProc(cat: GraftCatalog, p: Proc)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = p.procName
    override def description(): String = p.desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = p.params.toArray
    override def isDeterministic: Boolean = false // table services mutate state
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val (resultSchema, resultRows) = p.body(cat, new Args(input))
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = resultRows
        override def readSchema(): StructType = resultSchema
      }
      util.Collections.singletonList(scan).iterator()
    }
  }

  /** Typed accessors over the bound-argument row (ordinals follow the
    * declared parameter order). */
  private final class Args(row: InternalRow) {
    def str(i: Int): String = row.getUTF8String(i).toString
    def strOpt(i: Int): Option[String] =
      if (row.isNullAt(i)) None else Some(str(i))
    def int(i: Int): Int = row.getInt(i)
    def long(i: Int): Long = row.getLong(i)
    def double(i: Int): Double = row.getDouble(i)
    def bool(i: Int): Boolean = row.getBoolean(i)
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def in(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** Resolve a procedure `table` argument ('name', 'ns.name', or
    * 'catalog.ns.name') to the live table. */
  private def tableOf(cat: GraftCatalog, ref: String): GraftTable = {
    val parts0 = ref.split('.').toSeq.filter(_.nonEmpty)
    val parts = if (parts0.headOption.contains(cat.name())) parts0.tail else parts0
    require(parts.nonEmpty, s"empty table name '$ref'")
    val ident = Identifier.of(parts.init.toArray, parts.last)
    if (!cat.tableExists(ident)) throw new NoSuchTableException(ident)
    GraftTable.load(SparkSession.active, cat.pathOf(ident))
  }

  private def collect(df: DataFrame): (StructType, Array[InternalRow]) =
    (df.schema, df.queryExecution.executedPlan.executeCollect())

  /** A single driver-built result row (instants, counts, …). */
  private def one(schema: StructType, values: Any*): (StructType, Array[InternalRow]) =
    (schema, Array(InternalRow.fromSeq(values.map {
      case s: String => UTF8String.fromString(s)
      case v => v
    })))

  private val instantResult = StructType(Seq(StructField("instant", StringType)))

  private val procs: Map[String, Proc] = Seq(
    Proc("run_compaction",
      "Fold log files into new base slices (ref: RunCompactionProcedure). " +
        "With max_io_bytes set, compacts worst-log-debt groups within the " +
        "IO budget (ref: LogFileSizeBasedCompactionStrategy); else all. " +
        "op => 'execute' (inline, default) | 'schedule' (persist a plan " +
        "instant only) | 'run' (execute the pending plan named by " +
        "instant =>, or the oldest pending one) — the reference's " +
        "schedule/execute split (ref: RunCompactionProcedure.scala:72). " +
        "max_partitions > 0 compacts only the latest N partitions " +
        "(ref: DayBasedCompactionStrategy).",
      Seq(in("table", StringType),
        in("min_log_bytes", LongType, "0"),
        in("max_io_bytes", LongType, "-1"),
        in("op", StringType, "'execute'"),
        in("instant", StringType, "''"),
        in("max_partitions", IntegerType, "0")),
      (cat, a) => {
        val t = tableOf(cat, a.str(0))
        val strategy =
          if (a.int(5) > 0) PartitionBounded(a.int(5))
          else if (a.long(2) >= 0 || a.long(1) > 0)
            LogSizeBounded(a.long(1), if (a.long(2) >= 0) a.long(2) else Long.MaxValue)
          else CompactAll
        val res = a.str(3).toLowerCase match {
          case "execute" => t.compact(strategy = strategy)
          case "schedule" => t.scheduleCompaction(strategy = strategy)
          case "run" =>
            // no pending plan → schedule one first, then execute it
            // (ref: RunCompactionProcedure.scala:87-91)
            val plan = Some(a.str(4)).filter(_.nonEmpty)
              .orElse(t.pendingPlans().collectFirst {
                case (i, "compaction_schedule") => i
              })
              .orElse(t.scheduleCompaction(strategy = strategy))
            plan.flatMap(t.runCompaction)
          case other => throw new IllegalArgumentException(
            s"unknown op '$other': use execute | schedule | run")
        }
        one(instantResult, res.orNull)
      }),

    Proc("run_clustering",
      "Rewrite live data into sorted file groups via replacecommit " +
        "(ref: RunClusteringProcedure); order => comma-separated sort " +
        "columns, zorder => multi-column Z-order layout; small_file_bytes " +
        "> 0 consolidates only small groups within max_io_bytes " +
        "(ref: SparkSizeBasedClusteringPlanStrategy). op => 'execute' | " +
        "'schedule' | 'run' as in run_compaction. curve => 'zorder' " +
        "(default) | 'hilbert' for the multi-column layout (ref: " +
        "HilbertCurveUtils / hoodie.layout.optimize.curve.build.method).",
      Seq(in("table", StringType),
        in("order", StringType, "''"),
        in("zorder", BooleanType, "false"),
        in("small_file_bytes", LongType, "-1"),
        in("max_io_bytes", LongType, "-1"),
        in("op", StringType, "'execute'"),
        in("instant", StringType, "''"),
        in("curve", StringType, "'zorder'")),
      (cat, a) => {
        val t = tableOf(cat, a.str(0))
        val strategy =
          if (a.long(3) > 0)
            SmallFileBounded(a.long(3), if (a.long(4) >= 0) a.long(4) else Long.MaxValue)
          else ClusterAll
        val sortCols = a.str(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val curve = a.str(7).toLowerCase
        val res = a.str(5).toLowerCase match {
          case "execute" =>
            t.cluster(sortCols, a.bool(2), strategy = strategy, curve = curve)
          case "schedule" =>
            t.scheduleClustering(sortCols, a.bool(2), strategy = strategy,
              curve = curve)
          case "run" =>
            // no pending plan → schedule one first, then execute it
            // (ref: RunCompactionProcedure.scala:87-91, same shape for
            // clustering)
            val plan = Some(a.str(6)).filter(_.nonEmpty)
              .orElse(t.pendingPlans().collectFirst {
                case (i, "clustering_schedule") => i
              })
              .orElse(t.scheduleClustering(sortCols, a.bool(2),
                strategy = strategy, curve = curve))
            plan.flatMap(t.runClustering)
          case other => throw new IllegalArgumentException(
            s"unknown op '$other': use execute | schedule | run")
        }
        one(instantResult, res.orNull)
      }),

    Proc("run_clean",
      "Remove unreferenced old file versions (ref: RunCleanProcedure). " +
        "policy => file_versions | commits | hours; retain => versions/" +
        "commits to keep or hour window. op => 'execute' (inline, default) " +
        "| 'schedule' (pin the doomed set in a cleanreq plan instant — " +
        "ref: CleanPlanActionExecutor's .clean.requested) | 'run' (execute " +
        "the pending plan named by instant =>, or the oldest pending one, " +
        "scheduling first if none — ref: AsyncCleanerService).",
      Seq(in("table", StringType),
        in("policy", StringType, "'file_versions'"),
        in("retain", DoubleType, "1"),
        in("op", StringType, "'execute'"),
        in("instant", StringType, "''")),
      (cat, a) => {
        val policy = a.str(1).toLowerCase match {
          case "file_versions" => KeepLatestFileVersions(a.double(2).toInt)
          case "commits" => KeepLatestCommits(a.double(2).toInt)
          case "hours" => KeepLatestByHours(a.double(2))
          case other => throw new IllegalArgumentException(
            s"unknown clean policy '$other': use file_versions | commits | hours")
        }
        val t = tableOf(cat, a.str(0))
        val res = a.str(3).toLowerCase match {
          case "execute" => Some(t.clean(policy))
          case "schedule" => t.scheduleClean(policy)
          case "run" =>
            val plan = Some(a.str(4)).filter(_.nonEmpty)
              .orElse(t.pendingPlans().collectFirst {
                case (i, "clean_schedule") => i
              })
              .orElse(t.scheduleClean(policy))
            plan.flatMap(t.runClean)
          case other => throw new IllegalArgumentException(
            s"unknown op '$other': use execute | schedule | run")
        }
        one(instantResult, res.orNull)
      }),

    Proc("archive_commits",
      "Checkpoint + move old instants to the archive timeline " +
        "(ref: ArchiveCommitsProcedure).",
      Seq(in("table", StringType), in("keep_last", IntegerType, "10")),
      (cat, a) => one(StructType(Seq(StructField("archived", IntegerType))),
        tableOf(cat, a.str(0)).archive(a.int(1)))),

    Proc("rollback_to_instant",
      "Roll back every data commit newer than the given instant " +
        "(ref: RollbackToInstantTimeProcedure).",
      Seq(in("table", StringType), in("instant", StringType)),
      (cat, a) => {
        tableOf(cat, a.str(0)).restore(a.str(1))
        one(instantResult, a.str(1))
      }),

    Proc("run_rollback",
      "Roll back the most recent data commit: delete its files, drop the " +
        "instant (ref: RunRollbackInflightTableServiceProcedure / rollback).",
      Seq(in("table", StringType)),
      (cat, a) => one(instantResult, tableOf(cat, a.str(0)).rollback().orNull)),

    Proc("show_archived_commits",
      "Instants folded into the archive timeline (ref: " +
        "ShowArchivedCommitsProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => {
        val t = tableOf(cat, a.str(0))
        t.timeline.refresh()
        (instantResult, t.timeline.archivedInstants()
          .map(i => InternalRow(UTF8String.fromString(i))).toArray)
      }),

    Proc("create_savepoint",
      "Savepoint a data commit — its files survive cleaning (ref: " +
        "CreateSavepointProcedure). commit_time => a specific active-" +
        "timeline instant; default the latest.",
      Seq(in("table", StringType), in("commit_time", StringType, "''")),
      (cat, a) => one(StructType(Seq(StructField("saved_instant", StringType))),
        tableOf(cat, a.str(0)).savepoint(Some(a.str(1)).filter(_.nonEmpty)))),

    Proc("delete_savepoint",
      "Drop a savepoint by its savepoint instant (ref: " +
        "DeleteSavepointProcedure); its data files become cleanable again.",
      Seq(in("table", StringType), in("instant", StringType)),
      (cat, a) => {
        val t = tableOf(cat, a.str(0))
        t.timeline.refresh()
        require(t.timeline.metas(None)
            .exists(m => m.action == "savepoint" && m.instant == a.str(1)),
          s"no savepoint at instant ${a.str(1)}")
        t.timeline.remove(a.str(1), "savepoint")
        one(instantResult, a.str(1))
      }),

    Proc("rollback_to_savepoint",
      "Restore the table to a savepointed data instant " +
        "(ref: RollbackToSavepointProcedure).",
      Seq(in("table", StringType), in("instant", StringType)),
      (cat, a) => {
        tableOf(cat, a.str(0)).restore(a.str(1))
        one(instantResult, a.str(1))
      }),

    Proc("show_commits",
      "Active-timeline instants, newest first (ref: ShowCommitsProcedure).",
      Seq(in("table", StringType), in("limit", IntegerType, "20")),
      (cat, a) => collect(tableOf(cat, a.str(0)).showCommits()
        .orderBy(col("instant").desc).limit(a.int(1)))),

    Proc("show_compaction",
      "Compaction instants, newest first (ref: ShowCompactionProcedure; " +
        "graft compactions are synchronous, so all rows are COMPLETED).",
      Seq(in("table", StringType), in("limit", IntegerType, "20")),
      (cat, a) => collect(GraftSql.showCompaction(tableOf(cat, a.str(0)))
        .orderBy(col("instant").desc).limit(a.int(1)))),

    Proc("show_clustering",
      "Clustering replacecommits, newest first (ref: ShowClusteringProcedure).",
      Seq(in("table", StringType), in("limit", IntegerType, "20")),
      (cat, a) => collect(GraftSql.showClustering(tableOf(cat, a.str(0)))
        .orderBy(col("instant").desc).limit(a.int(1)))),

    Proc("show_commit_write_stats",
      "Per-commit write totals: files, records, bytes " +
        "(ref: ShowCommitWriteStatsProcedure).",
      Seq(in("table", StringType), in("limit", IntegerType, "20")),
      (cat, a) => collect(GraftSql.showCommitWriteStats(tableOf(cat, a.str(0)))
        .orderBy(col("instant").desc).limit(a.int(1)))),

    Proc("show_commit_files",
      "Files written by one commit (ref: ShowCommitFilesProcedure).",
      Seq(in("table", StringType), in("instant", StringType)),
      (cat, a) => collect(
        GraftSql.showCommitFiles(tableOf(cat, a.str(0)), a.str(1)))),

    Proc("show_rollbacks",
      "Rollback instants with the data instant each undid " +
        "(ref: ShowRollbacksProcedure).",
      Seq(in("table", StringType), in("limit", IntegerType, "20")),
      (cat, a) => collect(GraftSql.showRollbacks(tableOf(cat, a.str(0)))
        .orderBy(col("rollback_instant").desc).limit(a.int(1)))),

    Proc("export_instants",
      "Copy the newest timeline instant files to a local directory " +
        "(ref: ExportInstantsProcedure).",
      Seq(in("table", StringType), in("local_path", StringType),
        in("limit", IntegerType, "50")),
      (cat, a) => collect(
        GraftSql.exportInstants(tableOf(cat, a.str(0)), a.str(1), a.int(2)))),

    Proc("stats_wa",
      "Write amplification per commit: rows written vs incoming batch rows" +
        " (ref: StatsWriteAmplificationProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => collect(
        GraftSql.statsWriteAmplification(tableOf(cat, a.str(0))))),

    Proc("stats_file_sizes",
      "Live base-file size distribution per partition " +
        "(ref: StatsFileSizeProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => collect(GraftSql.statsFileSizes(tableOf(cat, a.str(0))))),

    Proc("show_commit_partitions",
      "Partitions one commit touched, with file/row/byte counts " +
        "(ref: ShowCommitPartitionsProcedure).",
      Seq(in("table", StringType), in("instant", StringType)),
      (cat, a) => collect(
        GraftSql.showCommitPartitions(tableOf(cat, a.str(0)), a.str(1)))),

    Proc("show_logfile_metadata",
      "MOR log files of one file group, oldest first " +
        "(ref: ShowHoodieLogFileMetadataProcedure).",
      Seq(in("table", StringType), in("file_id", StringType)),
      (cat, a) => collect(
        GraftSql.showLogFileMetadata(tableOf(cat, a.str(0)), a.str(1)))),

    Proc("show_bootstrap_mapping",
      "Metadata-only adopted (external) base files still live " +
        "(ref: ShowBootstrapMappingProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => collect(GraftSql.showBootstrapMapping(tableOf(cat, a.str(0))))),

    Proc("repair_deduplicate",
      "Rewrite one partition keeping the winning version per duplicate key" +
        " (ref: RepairDeduplicateProcedure); returns duplicates removed.",
      Seq(in("table", StringType), in("partition", StringType)),
      (cat, a) => one(
        StructType(Seq(StructField("duplicates_removed", LongType))),
        GraftSql.repairDeduplicate(tableOf(cat, a.str(0)), a.str(1)))),

    Proc("copy_to_table",
      "Copy the live snapshot into a NEW graft table with the same config " +
        "(ref: CopyToTableProcedure).",
      Seq(in("table", StringType), in("new_table", StringType)),
      (cat, a) => {
        val src = tableOf(cat, a.str(0))
        val parts0 = a.str(1).split('.').toSeq.filter(_.nonEmpty)
        val parts =
          if (parts0.headOption.contains(cat.name())) parts0.tail else parts0
        val ident = Identifier.of(parts.init.toArray, parts.last)
        require(!cat.tableExists(ident), s"table '${a.str(1)}' already exists")
        val destPath = cat.pathOf(ident)
        val df = src.snapshot().drop(GraftTable.metaCols: _*)
        GraftSql.createTableAsSelect(SparkSession.active, destPath,
          src.config.copy(name = parts.last), df)
        one(instantResult,
          GraftTable.load(SparkSession.active, destPath)
            .timeline.completed().last._1)
      }),

    Proc("show_fsview_all",
      "Latest file slice per file group (ref: ShowFileSystemViewProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => collect(tableOf(cat, a.str(0)).showFileSystemView())),

    Proc("show_partitions",
      "Live partitions (ref: ShowTablePartitionsProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => collect(tableOf(cat, a.str(0)).showPartitions())),

    Proc("show_savepoints",
      "Savepoints and the data instants they pin (ref: ShowSavepointsProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => collect(GraftSql.showSavepoints(tableOf(cat, a.str(0))))),

    Proc("show_table_properties",
      "Table configuration as key/value rows (ref: ShowTablePropertiesProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => {
        val t = tableOf(cat, a.str(0))
        val c = t.config
        val props = Seq(
          "name" -> c.name, "type" -> c.tableType.name,
          "recordkey.field" -> c.keyFields.mkString(","),
          "precombine.field" -> c.precombineField.getOrElse(""),
          "partitioning" -> c.partitioning.toString,
          "index" -> c.index.toString,
          "target.file.rows" -> c.targetFileSizeRows.toString,
          "payload" -> c.payload.name,
          "schema.on.read" -> c.schemaOnRead.toString,
          "version" -> c.version.toString,
          "path" -> t.basePath)
        (StructType(Seq(StructField("key", StringType), StructField("value", StringType))),
          props.map { case (k, v) =>
            InternalRow(UTF8String.fromString(k), UTF8String.fromString(v))
          }.toArray)
      }),

    Proc("commits_compare",
      "Instants present in one table's timeline but not the other's " +
        "(ref: CommitsCompareProcedure).",
      Seq(in("table", StringType), in("other", StringType)),
      (cat, a) => collect(
        GraftSql.commitsCompare(tableOf(cat, a.str(0)), tableOf(cat, a.str(1))))),

    Proc("sync_metadata_table",
      "Persist file listing + column stats as a parquet metadata table " +
        "(ref: hudi metadata table files/column_stats partitions).",
      Seq(in("table", StringType)),
      (cat, a) => one(StructType(Seq(StructField("path", StringType))),
        tableOf(cat, a.str(0)).syncMetadataTable())),

    Proc("run_index",
      "Async metadata indexing (ref: HoodieIndexer.java:86, the RFC-45 " +
        "indexing action): op => 'schedule' pins the current pre-bloom " +
        "file set as a plan instant; 'run' executes the pending plan named" +
        " by instant => (or the oldest pending one, scheduling first if " +
        "none) — the backfill runs out-of-band, files committed after the " +
        "plan land in the next plan.",
      Seq(in("table", StringType),
        in("op", StringType, "'run'"),
        in("instant", StringType, "''"),
        in("name", StringType, "'record_key_bloom'")),
      (cat, a) => {
        val t = tableOf(cat, a.str(0))
        val res = a.str(1).toLowerCase match {
          case "schedule" => t.scheduleIndex(a.str(3))
          case "run" | "execute" =>
            Some(a.str(2)).filter(_.nonEmpty)
              .orElse(t.pendingPlans().collectFirst {
                case (i, "index_schedule") => i
              })
              .orElse(t.scheduleIndex(a.str(3)))
              .flatMap(t.runIndex)
          case other => throw new IllegalArgumentException(
            s"unknown op '$other': use schedule | run | execute")
        }
        one(instantResult, res.orNull)
      }),

    Proc("show_indexing",
      "Async indexing plans with their schedule/run state (ref: " +
        "HoodieIndexer states).",
      Seq(in("table", StringType)),
      (cat, a) => collect(GraftSql.showIndexing(tableOf(cat, a.str(0))))),

    Proc("show_metrics",
      "Writer metrics per data commit — duration, files, rows, bytes " +
        "(ref: HoodieMetrics counters; derived from the timeline, so " +
        "durable across writers).",
      Seq(in("table", StringType)),
      (cat, a) => collect(GraftSql.showMetrics(tableOf(cat, a.str(0))))),

    Proc("sync_bloom_metadata",
      "Fold live bloom sidecars into the metadata table's blooms " +
        "partition (ref: MetadataPartitionType BLOOM_FILTERS): tagging " +
        "then reads candidate blooms in one batched scan instead of one " +
        "GET per candidate file.",
      Seq(in("table", StringType)),
      (cat, a) => one(StructType(Seq(StructField("files", StringType))),
        tableOf(cat, a.str(0)).syncBloomMetadata().toString)),

    Proc("run_bootstrap",
      "Adopt an EXISTING parquet directory as a graft table and register " +
        "it under `table` (ref: RunBootstrapProcedure + BootstrapMode). " +
        "mode => 'metadata_only' (default) adopts without rewriting data — " +
        "one footer scan + one commit at any size; mode => 'full_record' " +
        "rewrites the source into keyed graft file groups (one bulk_insert)" +
        " so upserts never pay the adoption-format penalty.",
      Seq(in("table", StringType),
        in("location", StringType),
        in("record_key_field", StringType),
        in("precombine_field", StringType, "NULL"),
        in("table_type", StringType, "'cow'"),
        in("partition_fields", StringType, "NULL"),
        in("mode", StringType, "'metadata_only'")),
      (cat, a) => {
        import java.nio.file.{Files, Paths}
        val parts0 = a.str(0).split('.').toSeq.filter(_.nonEmpty)
        val parts =
          if (parts0.headOption.contains(cat.name())) parts0.tail else parts0
        val ident = Identifier.of(parts.init.toArray, parts.last)
        require(!cat.tableExists(ident), s"table '${a.str(0)}' already exists")
        // normalize LOCATION exactly like createTable's PROP_LOCATION path
        val location = {
          val raw = a.str(1)
          val u = try new java.net.URI(raw) catch { case _: Exception => null }
          if (u != null && u.getScheme == "file") u.getPath else raw
        }
        require(Files.isDirectory(Paths.get(location)),
          s"bootstrap location '$location' is not a directory")
        val cfg = TableConfig(
          name = parts.last,
          tableType = TableType.of(a.strOpt(4).getOrElse("cow")),
          keyFields = a.str(2).split(',').map(_.trim).filter(_.nonEmpty).toSeq,
          precombineField = a.strOpt(3),
          partitioning = a.strOpt(5)
            .map(c => PartitionByColumns(
              c.split(',').map(_.trim).filter(_.nonEmpty).toSeq): PartitionSpec)
            .getOrElse(NonPartitioned))
        val mode = a.strOpt(6).getOrElse("metadata_only")
        require(Set("metadata_only", "full_record")(mode),
          s"unknown bootstrap mode '$mode' (metadata_only | full_record)")
        // register (catalog link) BEFORE mutating the source directory, so
        // a failed registration leaves the location untouched; if adoption
        // fails, roll back both the link and the freshly created .graft
        // state — the leave-untouched-on-failure contract
        Files.createDirectories(cat.linkOf(ident).getParent)
        Files.write(cat.linkOf(ident), location.getBytes("UTF-8"))
        try {
          val t =
            if (mode == "full_record")
              GraftTable.bootstrapFullRecord(SparkSession.active, location, cfg)
            else GraftTable.bootstrapInPlace(SparkSession.active, location, cfg)
          one(instantResult, t.timeline.completed().last._1)
        } catch { case e: Throwable =>
          Files.deleteIfExists(cat.linkOf(ident))
          val meta = Paths.get(location, ".graft")
          if (Files.exists(meta)) {
            import scala.jdk.CollectionConverters._
            graft.table.Fs.walk(meta).reverse
              .foreach(Files.deleteIfExists(_))
          }
          throw e
        }
      }),

    Proc("import_parquet",
      "Full-copy import of a parquet directory into a NEW graft table — " +
        "one keyed bulk_insert, unlike run_bootstrap's in-place adoption " +
        "(ref: HdfsParquetImportProcedure).",
      Seq(in("table", StringType),
        in("location", StringType),
        in("record_key_field", StringType),
        in("precombine_field", StringType, "NULL"),
        in("partition_fields", StringType, "NULL")),
      (cat, a) => {
        val parts0 = a.str(0).split('.').toSeq.filter(_.nonEmpty)
        val parts =
          if (parts0.headOption.contains(cat.name())) parts0.tail else parts0
        val ident = Identifier.of(parts.init.toArray, parts.last)
        require(!cat.tableExists(ident), s"table '${a.str(0)}' already exists")
        val cfg = TableConfig(
          name = parts.last,
          tableType = CopyOnWrite,
          keyFields = a.str(2).split(',').map(_.trim).filter(_.nonEmpty).toSeq,
          precombineField = a.strOpt(3),
          partitioning = a.strOpt(4)
            .map(c => PartitionByColumns(
              c.split(',').map(_.trim).filter(_.nonEmpty).toSeq): PartitionSpec)
            .getOrElse(NonPartitioned))
        val spark = SparkSession.active
        val t = GraftSql.createTableAsSelect(spark, cat.pathOf(ident), cfg,
          spark.read.parquet(a.str(1)))
        one(instantResult, t.timeline.completed().last._1)
      }),

    Proc("show_commits_metadata",
      "Per-commit detail: partitions, files, bytes, deletions, extra " +
        "key/values (ref: ShowCommitsMetadataProcedure).",
      Seq(in("table", StringType), in("limit", IntegerType, "10")),
      (cat, a) => collect(
        GraftSql.showCommitsMetadata(tableOf(cat, a.str(0)), a.int(1)))),

    Proc("show_archived_commits_metadata",
      "Full metadata of archived instants " +
        "(ref: ShowArchivedCommitsMetadataProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => collect(
        GraftSql.showArchivedCommitsMetadata(tableOf(cat, a.str(0))))),

    Proc("show_fsview_latest",
      "Latest file slice per group of ONE partition with log-debt detail " +
        "(ref: ShowLatestFileSystemViewProcedure).",
      Seq(in("table", StringType), in("partition", StringType)),
      (cat, a) => collect(
        GraftSql.showFsViewLatest(tableOf(cat, a.str(0)), a.str(1)))),

    Proc("show_rollback_detail",
      "Files one rollback instant physically deleted " +
        "(ref: ShowRollbackDetailProcedure).",
      Seq(in("table", StringType), in("instant", StringType)),
      (cat, a) => collect(
        GraftSql.showRollbackDetail(tableOf(cat, a.str(0)), a.str(1)))),

    Proc("show_logfile_records",
      "Sample raw (unmerged) records from one file group's MOR logs as " +
        "JSON rows (ref: ShowHoodieLogFileRecordsProcedure).",
      Seq(in("table", StringType), in("file_id", StringType),
        in("limit", IntegerType, "10")),
      (cat, a) => collect(
        GraftSql.showLogFileRecords(tableOf(cat, a.str(0)), a.str(1), a.int(2)))),

    Proc("show_bootstrap_partitions",
      "Partitions still carrying metadata-only adopted files " +
        "(ref: ShowBootstrapPartitionsProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => collect(
        GraftSql.showBootstrapPartitions(tableOf(cat, a.str(0))))),

    Proc("show_fs_path_detail",
      "Recursive file listing with sizes under any path " +
        "(ref: ShowFsPathDetailProcedure).",
      Seq(in("path", StringType), in("limit", IntegerType, "1000")),
      (cat, a) => collect(
        GraftSql.showFsPathDetail(SparkSession.active, a.str(0), a.int(1)))),

    Proc("show_metadata_table_files",
      "File listing of the persisted metadata table " +
        "(ref: ShowMetadataTableFilesProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => collect(
        GraftSql.showMetadataTableFiles(tableOf(cat, a.str(0))))),

    Proc("show_metadata_table_partitions",
      "Partitions of the persisted metadata table " +
        "(ref: ShowMetadataTablePartitionsProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => collect(
        GraftSql.showMetadataTablePartitions(tableOf(cat, a.str(0))))),

    Proc("show_metadata_table_stats",
      "Per-partition file/row counts of the persisted metadata table " +
        "(ref: ShowMetadataTableStatsProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => collect(
        GraftSql.showMetadataTableStats(tableOf(cat, a.str(0))))),

    Proc("validate_metadata_table_files",
      "Diff the persisted metadata table's file listing against the live " +
        "timeline; rows = discrepancies, none = in sync " +
        "(ref: ValidateMetadataTableFilesProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => collect(
        GraftSql.validateMetadataTableFiles(tableOf(cat, a.str(0))))),

    Proc("validate_data_table",
      "Diff the data files physically on storage against the timeline's " +
        "accounting: dangling = unaccounted leftovers, missing = " +
        "accounted-for but absent (ref: HoodieDataTableValidator).",
      Seq(in("table", StringType)),
      (cat, a) => collect(
        GraftSql.validateDataTable(tableOf(cat, a.str(0))))),

    Proc("sync_catalog",
      "Register a path-based table in this catalog under db.name: COW " +
        "registers <name>, MOR registers <name>_rt (snapshot) + <name>_ro " +
        "(read-optimized), namespace auto-created; idempotent — schema " +
        "and partitions resolve live from the path, so re-sync never " +
        "drifts (ref: hudi-sync HiveSyncTool.syncHoodieTable).",
      Seq(in("path", StringType), in("db", StringType),
        in("table", StringType, "NULL")),
      (cat, a) => {
        val names = CatalogSync.syncTo(cat, SparkSession.active, a.str(0),
          a.str(1), a.strOpt(2).filter(_.nonEmpty))
        (StructType(Seq(StructField("registered", StringType))),
          names.toArray.map(n => InternalRow(UTF8String.fromString(n))))
      }),

    Proc("delete_metadata_table",
      "Remove the persisted metadata sidecar; reads fall back to timeline " +
        "resolution (ref: DeleteMetadataTableProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => one(
        StructType(Seq(StructField("existed", BooleanType))),
        GraftSql.deleteMetadataTable(tableOf(cat, a.str(0))))),

    Proc("unschedule_compaction",
      "Drop a pending compaction plan: its pinned groups become " +
        "schedulable again and executing the plan fails (ref: " +
        "HoodieCompactionAdminTool UNSCHEDULE_PLAN).",
      Seq(in("table", StringType), in("instant", StringType)),
      (cat, a) => {
        tableOf(cat, a.str(0)).unscheduleCompaction(a.str(1))
        one(instantResult, a.str(1))
      }),

    Proc("validate_compaction",
      "Per-group health of a pending compaction plan: ok / superseded / " +
        "missing_files (ref: HoodieCompactionAdminTool VALIDATE).",
      Seq(in("table", StringType), in("instant", StringType)),
      (cat, a) => {
        val rows = tableOf(cat, a.str(0)).validateCompactionPlan(a.str(1))
        (StructType(Seq(StructField("group", StringType),
          StructField("status", StringType))),
          rows.toArray.map { case (g, s) =>
            InternalRow(UTF8String.fromString(g), UTF8String.fromString(s)) })
      }),

    Proc("unschedule_clustering",
      "Drop a pending clustering plan: its pinned groups become " +
        "schedulable again and executing the plan fails (ref: hudi-cli " +
        "ClusteringCommand; twin of unschedule_compaction).",
      Seq(in("table", StringType), in("instant", StringType)),
      (cat, a) => {
        tableOf(cat, a.str(0)).unscheduleClustering(a.str(1))
        one(instantResult, a.str(1))
      }),

    Proc("validate_clustering",
      "Per-group health of a pending clustering plan: ok / superseded / " +
        "missing_files (superseded = rewritten or logged past the plan; " +
        "runClustering would skip it).",
      Seq(in("table", StringType), in("instant", StringType)),
      (cat, a) => {
        val rows = tableOf(cat, a.str(0)).validateClusteringPlan(a.str(1))
        (StructType(Seq(StructField("group", StringType),
          StructField("status", StringType))),
          rows.toArray.map { case (g, s) =>
            InternalRow(UTF8String.fromString(g), UTF8String.fromString(s)) })
      }),

    Proc("repair_table",
      "Dangling-file repair with a reversible backup (ref: hudi-utilities " +
        "HoodieRepairTool modes): mode => 'dry_run' lists files on storage" +
        " that no commit accounts for, 'repair' MOVES them to .graft/" +
        "repair_backup/<id>/ (returned per row), 'undo' with backup => " +
        "'<id>' restores that backup.",
      Seq(in("table", StringType), in("mode", StringType, "'dry_run'"),
        in("backup", StringType, "NULL")),
      (cat, a) => collect(GraftSql.repairTable(tableOf(cat, a.str(0)),
        a.str(1), a.strOpt(2)))),

    Proc("delete_marker",
      "Clear one instant's write-in-progress markers (inflight claim + " +
        "staged files) after a writer died mid-commit " +
        "(ref: DeleteMarkerProcedure).",
      Seq(in("table", StringType), in("instant", StringType)),
      (cat, a) => one(
        StructType(Seq(StructField("markers_removed", LongType))),
        GraftSql.deleteMarker(tableOf(cat, a.str(0)), a.str(1)))),

    Proc("show_cleans",
      "Every clean — inline runs and scheduled plans (REQUESTED / " +
        "COMPLETED) — with files deleted, retention boundary and the " +
        "execution instant (CLI `cleans show` parity).",
      Seq(in("table", StringType)),
      (cat, a) => collect(GraftSql.showCleans(tableOf(cat, a.str(0))))),

    Proc("rollback_failed_writes",
      "Sweep ALL dangling writer debris: for every instant claimed but " +
        "never completed (and at least older_than_ms old, judged by the " +
        "instant's own timestamp), delete its staging dir, orphaned data " +
        "files and inflight claim (ref: hoodie.cleaner.policy.failed." +
        "writes + HoodieTable.rollbackInflights). Set older_than_ms above " +
        "your longest commit so live writers are never swept.",
      Seq(in("table", StringType), in("older_than_ms", LongType, "0")),
      (cat, a) => {
        val rolled = tableOf(cat, a.str(0)).rollbackFailedWrites(a.long(1))
        (StructType(Seq(StructField("instant", StringType))),
          rolled.map(i =>
            InternalRow(UTF8String.fromString(i)): InternalRow).toArray)
      }),

    Proc("repair_corrupted_clean_files",
      "Remove clean/rollback instant files that no longer parse so the " +
        "timeline loads again (ref: RepairCorruptedCleanFilesProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => collect(
        GraftSql.repairCorruptedCleanFiles(tableOf(cat, a.str(0))))),

    Proc("upgrade_or_downgrade",
      "Migrate the table format version: 1 = id-less schema epochs " +
        "(by-name column resolution), 2 = id-mapped epochs (RENAME/DROP " +
        "COLUMN capable). Downgrade is refused when id history is " +
        "load-bearing (ref: UpgradeOrDowngradeProcedure, " +
        "UpgradeDowngrade.java).",
      Seq(in("table", StringType), in("to_version", IntegerType)),
      (cat, a) => {
        val from = tableOf(cat, a.str(0)).setFormatVersion(a.int(1))
        one(StructType(Seq(StructField("from_version", IntegerType),
          StructField("to_version", IntegerType))), from, a.int(1))
      }),

    Proc("create_metadata_table",
      "Build the persisted metadata table; fails if one already exists " +
        "(ref: CreateMetadataTableProcedure).",
      Seq(in("table", StringType)),
      (cat, a) => {
        val t = tableOf(cat, a.str(0))
        require(!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
          t.basePath, ".graft", "metadata", "files")),
          "metadata table already exists: use init_metadata_table to rebuild")
        one(StructType(Seq(StructField("path", StringType))),
          t.syncMetadataTable())
      }),

    Proc("init_metadata_table",
      "(Re)build the persisted metadata table as one fresh base segment, " +
        "replacing any stale/fragmented one (ref: InitMetadataTableProcedure" +
        " + metadata-table compaction).",
      Seq(in("table", StringType)),
      (cat, a) => one(StructType(Seq(StructField("path", StringType))),
        tableOf(cat, a.str(0)).rebuildMetadataTable())),

    Proc("validate_sync",
      "Per-partition live row-count diff between a table and a replica " +
        "(copy_to_table target); rows = discrepancies, none = in sync " +
        "(ref: ValidateHoodieSyncProcedure).",
      Seq(in("table", StringType), in("other", StringType)),
      (cat, a) => collect(GraftSql.validateSync(
        tableOf(cat, a.str(0)), tableOf(cat, a.str(1))))),

    Proc("export_snapshot",
      "Write the live snapshot as plain parquet/json/orc files under a " +
        "fresh directory — the off-ramp for non-graft consumers " +
        "(ref: hudi-utilities HoodieSnapshotExporter).",
      Seq(in("table", StringType), in("location", StringType),
        in("format", StringType, "'parquet'")),
      (cat, a) => one(
        StructType(Seq(StructField("files_exported", LongType))),
        GraftSql.exportSnapshot(tableOf(cat, a.str(0)), a.str(1), a.str(2)))),

    Proc("repair_overwrite_props",
      "Overwrite the mutable write-config subset from 'k=v,k2=v2' pairs " +
        "(ref: RepairOverwriteHoodiePropsProcedure); returns the resulting" +
        " effective properties.",
      Seq(in("table", StringType), in("props", StringType)),
      (cat, a) => collect(GraftSql.repairOverwriteProps(tableOf(cat, a.str(0)),
        a.str(1).split(',').map(_.trim).filter(_.nonEmpty).map { kv =>
          val i = kv.indexOf('=')
          require(i > 0, s"bad property pair '$kv': expected k=v")
          kv.substring(0, i).trim -> kv.substring(i + 1).trim
        }.toMap))),

    // ---- persisted pipeline-index lifecycle (graft.pipeline.AnnIndex /
    // MinhashIndex): the same ops surface every table service gets, for
    // the index family. `index_dir` is the index root path; `table` is
    // the corpus the index covers.
    Proc("show_index_drift",
      "WHEN-to-rebuild report for a persisted index. kind => ivfpq " +
        "(default): mean-sq PQ reconstruction error of the corpus table's " +
        "vectors under the persisted codebooks vs the build-time baseline. " +
        "kind => minhash | lsh (table unused): rows-per-bucket occupancy " +
        "p99 vs the build-time baseline — the corpus-outgrew-the-bands/" +
        "planes signal. ratio null = no baseline or empty probe.",
      Seq(in("index_dir", StringType), in("table", StringType, "''"),
        in("id_col", StringType, "'vec_id'"),
        in("vec_col", StringType, "'embedding'"),
        in("kind", StringType, "'ivfpq'")),
      (cat, a) => a.str(4).toLowerCase match {
        case "ivfpq" =>
          val ds = graft.pipeline.AnnIndex.driftStats(a.str(0),
            tableOf(cat, a.str(1)).snapshot(), a.str(2), a.str(3))
          one(StructType(Seq(
            StructField("n", LongType),
            StructField("mean_sq_error", DoubleType),
            StructField("train_mean_sq_error", DoubleType),
            StructField("ratio", DoubleType))),
            ds.n, ds.meanSqError,
            ds.trainMeanSqError.map(Double.box).orNull,
            ds.ratio.map(Double.box).orNull)
        case k @ ("minhash" | "lsh") =>
          val os =
            if (k == "minhash")
              graft.pipeline.MinhashIndex.occupancyStats(
                SparkSession.active, a.str(0))
            else graft.pipeline.AnnIndex.occupancyStatsLsh(
              SparkSession.active, a.str(0))
          one(StructType(Seq(
            StructField("buckets", LongType),
            StructField("mean", DoubleType),
            StructField("p99", DoubleType),
            StructField("max", LongType),
            StructField("build_p99", DoubleType),
            StructField("ratio", DoubleType))),
            os.buckets, os.mean, os.p99, os.max,
            os.buildP99.map(Double.box).orNull,
            os.ratio.map(Double.box).orNull)
        case other => throw new IllegalArgumentException(
          s"unknown index kind '$other': use ivfpq | minhash | lsh")
      }),

    Proc("rebuild_index",
      "Atomic full rebuild of a persisted index from the corpus table " +
        "into a fresh version dir, then an atomic meta re-point (through " +
        "the index timeline) — queries serve the old version until the " +
        "swap; the drift/occupancy baseline resets. kind => ivfpq " +
        "(default; retrain + re-encode with nlist/m/ksub) | minhash " +
        "(re-band with n/num_hashes/bands) | lsh (re-bucket with planes/" +
        "tables_n). if_ratio_above > 0 makes it drift-TRIGGERED: score " +
        "show_index_drift's kind-matched statistic first and rebuild " +
        "only when ratio >= the threshold (a no-baseline index never " +
        "auto-triggers). id_col/payload_col default per kind " +
        "(vec_id/embedding; doc_id/text for minhash).",
      Seq(in("index_dir", StringType), in("table", StringType),
        in("nlist", IntegerType, "16"), in("m", IntegerType, "8"),
        in("ksub", IntegerType, "16"),
        in("id_col", StringType, "''"),
        in("vec_col", StringType, "''"),
        in("if_ratio_above", DoubleType, "0.0"),
        in("kind", StringType, "'ivfpq'"),
        in("n", IntegerType, "3"), in("num_hashes", IntegerType, "32"),
        in("bands", IntegerType, "8"),
        in("planes", IntegerType, "4"), in("tables_n", IntegerType, "8")),
      (cat, a) => {
        val corpus = tableOf(cat, a.str(1)).snapshot()
        val kind = a.str(8).toLowerCase
        val idCol = Some(a.str(5)).filter(_.nonEmpty)
          .getOrElse(if (kind == "minhash") "doc_id" else "vec_id")
        val payloadCol = Some(a.str(6)).filter(_.nonEmpty)
          .getOrElse(if (kind == "minhash") "text" else "embedding")
        val threshold = a.double(7)
        val ratio =
          if (threshold <= 0) None
          else kind match {
            case "ivfpq" => graft.pipeline.AnnIndex.driftStats(a.str(0),
              corpus, idCol, payloadCol).ratio
            case "minhash" => graft.pipeline.MinhashIndex.occupancyStats(
              SparkSession.active, a.str(0)).ratio
            case "lsh" => graft.pipeline.AnnIndex.occupancyStatsLsh(
              SparkSession.active, a.str(0)).ratio
            case other => throw new IllegalArgumentException(
              s"unknown index kind '$other': use ivfpq | minhash | lsh")
          }
        val fire = threshold <= 0 || ratio.exists(_ >= threshold)
        val indexed =
          if (!fire) 0L
          else kind match {
            case "ivfpq" => graft.pipeline.AnnIndex.rebuildIvfPq(a.str(0),
              corpus, nlist = a.int(2), m = a.int(3), ksub = a.int(4),
              idCol = idCol, vecCol = payloadCol)
            case "minhash" => graft.pipeline.MinhashIndex.rebuild(a.str(0),
              corpus, n = a.int(9), numHashes = a.int(10),
              bands = a.int(11), idCol = idCol, textCol = payloadCol)
            case "lsh" => graft.pipeline.AnnIndex.rebuildLsh(a.str(0),
              corpus, planes = a.int(12), tables = a.int(13),
              idCol = idCol, vecCol = payloadCol)
            case other => throw new IllegalArgumentException(
              s"unknown index kind '$other': use ivfpq | minhash | lsh")
          }
        one(StructType(Seq(
          StructField("rebuilt", BooleanType),
          StructField("indexed", LongType),
          StructField("ratio", DoubleType))),
          fire, indexed, ratio.map(Double.box).orNull)
      }),

    Proc("reconcile_index",
      "Heal a persisted index to cover its corpus table (the crash window " +
        "between a corpus commit and the index refresh): id-only anti-join " +
        "probe, then encode/band ONLY the missing rows. kind => minhash | " +
        "ivfpq | lsh. Returns the number of rows added (0 = consistent).",
      Seq(in("index_dir", StringType), in("table", StringType),
        in("kind", StringType, "'minhash'"),
        in("id_col", StringType, "''"), in("payload_col", StringType, "''")),
      (cat, a) => {
        val corpus = tableOf(cat, a.str(1)).snapshot()
        val added = a.str(2).toLowerCase match {
          case "minhash" => graft.pipeline.MinhashIndex.reconcile(a.str(0),
            corpus, Some(a.str(3)).filter(_.nonEmpty).getOrElse("doc_id"),
            Some(a.str(4)).filter(_.nonEmpty).getOrElse("text"))
          case "ivfpq" => graft.pipeline.AnnIndex.reconcileIvfPq(a.str(0),
            corpus, Some(a.str(3)).filter(_.nonEmpty).getOrElse("vec_id"),
            Some(a.str(4)).filter(_.nonEmpty).getOrElse("embedding"))
          case "lsh" => graft.pipeline.AnnIndex.reconcileLsh(a.str(0),
            corpus, Some(a.str(3)).filter(_.nonEmpty).getOrElse("vec_id"),
            Some(a.str(4)).filter(_.nonEmpty).getOrElse("embedding"))
          case other => throw new IllegalArgumentException(
            s"unknown index kind '$other': use minhash | ivfpq | lsh")
        }
        one(StructType(Seq(StructField("added", LongType))), added)
      }),

    Proc("show_index_versions",
      "One row per index version still on disk: version ('root' or " +
        "'v<N>'), whether it is the live one the meta points at, whether " +
        "its table set is complete (an incomplete non-live row is a " +
        "crashed rebuild's orphan), and bytes held — what vacuum_index " +
        "would reclaim. kind => ivfpq | minhash | lsh.",
      Seq(in("index_dir", StringType), in("kind", StringType, "'ivfpq'")),
      (cat, a) => {
        val rows = graft.pipeline.AnnIndex.indexVersions(a.str(0), a.str(1))
        (StructType(Seq(
          StructField("version", StringType),
          StructField("live", BooleanType),
          StructField("complete", BooleanType),
          StructField("bytes", LongType))),
          rows.map(r => InternalRow.fromSeq(Seq(
            UTF8String.fromString(r._1), r._2, r._3, r._4))).toArray)
      }),

    Proc("vacuum_index",
      "Reclaim index versions the meta no longer points at (superseded " +
        "by rebuild_index); kind => ivfpq | minhash | lsh. Cadence must " +
        "trail in-flight writers the way clean trails readers (a " +
        "superseded-version write is healed by reconcile_index). Returns " +
        "table sets dropped.",
      Seq(in("index_dir", StringType), in("kind", StringType, "'ivfpq'")),
      (cat, a) => one(StructType(Seq(StructField("dropped", IntegerType))),
        a.str(1).toLowerCase match {
          case "ivfpq" => graft.pipeline.AnnIndex.vacuumIvfPq(a.str(0))
          case "minhash" => graft.pipeline.MinhashIndex.vacuum(a.str(0))
          case "lsh" => graft.pipeline.AnnIndex.vacuumLsh(a.str(0))
          case other => throw new IllegalArgumentException(
            s"unknown index kind '$other': use ivfpq | minhash | lsh")
        }))
  ).map(p => p.procName -> p).toMap

  def load(cat: GraftCatalog, ident: Identifier): UnboundProcedure =
    procs.get(ident.name.toLowerCase) match {
      case Some(p) => new BoundProc(cat, p)
      case None => throw new RuntimeException(
        s"undefined procedure ${ident.name}; known: ${procs.keys.toSeq.sorted.mkString(", ")}")
    }

  def names: Seq[String] = procs.keys.toSeq.sorted
}
