package graft

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Sink, Source}
import org.apache.spark.sql.sources.{
  BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider,
  StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import graft.sources.{GraftComputedRelation, GraftRelations}
import graft.table._

/**
 * `spark.read.format("graft")` / `df.write.format("graft")` — the
 * reference's DataSource front door re-expressed for Graft (ref:
 * hudi-spark-datasource/hudi-spark-common/src/main/scala/org/apache/hudi/
 * DefaultSource.scala:45, option names from DataSourceOptions.scala:52).
 * The class lives at `graft.DefaultSource` so both lookup paths resolve:
 * the `DataSourceRegister` service (short name "graft") and Spark's
 * `<provider>.DefaultSource` class-name convention.
 *
 * Read options:
 *  - `graft.query.type`: `snapshot` (default) | `read_optimized` |
 *    `incremental` | `cdc`  (ref: DataSourceReadOptions.QUERY_TYPE)
 *  - `as.of.instant`: time travel for snapshot/read_optimized
 *    (ref: DataSourceReadOptions.TIME_TRAVEL_AS_OF_INSTANT)
 *  - `graft.begin.instanttime` (required) / `graft.end.instanttime` for
 *    incremental  (ref: BEGIN_INSTANTTIME / END_INSTANTTIME)
 *
 * Reads take the native parquet fast path whenever the query is exactly a
 * base-file scan (see GraftTable.fastScanFiles) — full pushdown, column
 * pruning, plan-time file skipping from commit stats — and otherwise fall
 * back to the table's merging readers with best-effort filter pushdown.
 *
 * Write options (ref: DataSourceWriteOptions):
 *  - `graft.operation`: `upsert` (default) | `insert` | `bulk_insert` |
 *    `delete` | `insert_overwrite` | `insert_overwrite_table`
 *  - on first write (table creation): `graft.recordkey.field` (required,
 *    comma-separated), `graft.precombine.field`, `graft.table.type`
 *    (`cow`|`mor`), `graft.table.name`, `graft.partitionpath.field`
 *    (comma-separated) or `graft.partition.timestamp.col` +
 *    `graft.partition.timestamp.format`, `graft.index.buckets`,
 *    `graft.target.file.rows`
 *  - SaveMode: `Append` runs the operation; `Overwrite` on an existing
 *    table = insert_overwrite_table; `ErrorIfExists`/`Ignore` as usual.
 */
class DefaultSource extends RelationProvider with CreatableRelationProvider
    with StreamSinkProvider with StreamSourceProvider with DataSourceRegister {
  import DefaultSource._

  override def shortName(): String = "graft"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "format(\"graft\") needs a path: spark.read.format(\"graft\").load(<table base path>)"))
    require(GraftTable.exists(path), s"no graft table at $path")
    val t = GraftTable.load(spark, path)
    parameters.getOrElse(QUERY_TYPE, "snapshot") match {
      case "snapshot" =>
        val asOf = parameters.get(AS_OF_INSTANT)
        if (parameters.get(MERGE_TYPE).contains("skip_merge"))
          new GraftComputedRelation(spark, () => t.snapshotSkipMerge(asOf))
        else t.fastScanFiles(asOf, baseOnly = false) match {
          case Some((files, schema, partSchema)) =>
            GraftRelations.fast(spark, path, files, schema,
              t.config.baseFileFormat, partSchema)
          case None => new GraftComputedRelation(spark, () => t.snapshot(asOf))
        }
      case "read_optimized" =>
        val asOf = parameters.get(AS_OF_INSTANT)
        t.fastScanFiles(asOf, baseOnly = true) match {
          case Some((files, schema, partSchema)) =>
            GraftRelations.fast(spark, path, files, schema,
              t.config.baseFileFormat, partSchema)
          case None => new GraftComputedRelation(spark, () => t.readOptimized(asOf))
        }
      case "incremental" =>
        val begin = parameters.getOrElse(BEGIN_INSTANTTIME,
          throw new IllegalArgumentException(
            s"incremental query requires $BEGIN_INSTANTTIME"))
        val end = parameters.get(END_INSTANTTIME)
        val fallback = parameters.get(INCR_FALLBACK_FULLSCAN).exists(_.toBoolean)
        val glob = parameters.get(INCR_PATH_GLOB).filter(_.nonEmpty)
        new GraftComputedRelation(spark,
          () => t.incremental(begin, end, fallback, glob))
      case "cdc" => // change feed: op + before/after images (ref: hudi RFC-51)
        val begin = parameters.getOrElse(BEGIN_INSTANTTIME,
          throw new IllegalArgumentException(
            s"cdc query requires $BEGIN_INSTANTTIME"))
        val end = parameters.get(END_INSTANTTIME)
        new GraftComputedRelation(spark, () => t.incrementalCDC(begin, end))
      case other => throw new IllegalArgumentException(
        s"unknown $QUERY_TYPE '$other' (snapshot | read_optimized | incremental | cdc)")
    }
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "format(\"graft\") needs a path: df.write.format(\"graft\").save(<table base path>)"))
    val exists = GraftTable.exists(path)
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(
          s"graft table already exists at $path (SaveMode.ErrorIfExists)")
      case SaveMode.Ignore if exists => ()
      case _ =>
        val t = if (exists) GraftTable.load(spark, path)
                else GraftTable.create(spark, path, configFrom(parameters, path))
        // options starting with the commit-meta prefix ride into the
        // commit's extra metadata verbatim (ref: hoodie.datasource.write.
        // commitmeta.key.prefix — how deltastreamer persists checkpoints)
        val metaPrefix = parameters.getOrElse(COMMITMETA_KEY_PREFIX, "_")
        val userMeta = parameters.filter { case (k, _) =>
          k.startsWith(metaPrefix) }
        val instant =
        if (mode == SaveMode.Overwrite && exists) t.insertOverwriteTable(data)
        else parameters.getOrElse(OPERATION, "upsert") match {
          case "bulk_insert" =>
            t.bulkInsert(data,
              parameters.getOrElse(BULKINSERT_SORT_MODE, "hash"), userMeta)
          case "insert" =>
            if (parameters.get(INSERT_DROP_DUPS).exists(_.toBoolean))
              t.insertDropDuplicates(data, userMeta)
            else t.insert(data, userMeta,
              combine = parameters.getOrElse(COMBINE_BEFORE_INSERT, "true").toBoolean)
          case "upsert" => t.upsert(data, userMeta)
          case "delete" => t.delete(data, userMeta)
          case "insert_overwrite" => t.insertOverwrite(data)
          case "insert_overwrite_table" => t.insertOverwriteTable(data)
          case "delete_partition" =>
            // the frame is ignored, as in the reference: partitions come
            // from the option (ref: hoodie.datasource.write.partitions.to.delete)
            val parts = parameters.getOrElse(PARTITIONS_TO_DELETE,
              throw new IllegalArgumentException(
                s"operation delete_partition requires $PARTITIONS_TO_DELETE"))
            t.deletePartitions(
              parts.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
          case other => throw new IllegalArgumentException(
            s"unknown $OPERATION '$other'")
        }
        // post-commit notification BEFORE table services: the callback
        // reports the write the caller made, not maintenance side-effects
        // (ref: hoodie.write.commit.callback.class)
        CommitCallback.fire(parameters.get(COMMIT_CALLBACK_CLASS), t, instant,
          parameters)
        // writer-maintains-the-table mode (ref: hudi inline/automatic
        // services) — no-op unless the graft.*.inline/automatic options ask
        AutoServices.run(t, parameters)
    }
    createRelation(sqlContext, parameters)
  }

  /** `spark.readStream.format("graft").load(path)` — stream a table's
    * commits (ref: hudi-spark-datasource/hudi-spark/src/main/scala/org/
    * apache/hudi/HoodieStreamSource.scala): offsets are timeline instants,
    * each micro-batch is the incremental query over (start, end] — only
    * files committed in the window are scanned. `graft.begin.instanttime`
    * sets the initial cursor (default "0" = from the earliest commit). */
  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "format(\"graft\") streaming source needs .load(<table base path>)"))
    (shortName(), new GraftStreamSource(sqlContext.sparkSession, path, parameters).schema)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "format(\"graft\") streaming source needs .load(<table base path>)"))
    new GraftStreamSource(sqlContext.sparkSession, path, parameters,
      Some(metadataPath))
  }

  /** `df.writeStream.format("graft")...start(path)` — the reference's
    * streaming front door (ref: hudi-spark-datasource/hudi-spark/src/main/
    * scala/org/apache/hudi/HoodieStreamingSink.scala): each micro-batch runs
    * the configured write operation with the checkpoint-scoped batch id
    * recorded in the commit, so a replayed batch after a crash dedups —
    * the same exactly-once scheme as GraftStreaming.upsertSink. */
  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "format(\"graft\") streaming sink needs .start(<table base path>)"))
    new GraftStreamSink(sqlContext.sparkSession, path, parameters)
  }

}

/** A timeline instant as a streaming offset. */
case class GraftOffset(instant: String) extends OffsetV1 {
  override def json(): String =
    graft.table.Json.mapper.writeValueAsString(Map("instant" -> instant))
}

/** Streaming source over a Graft table's commit timeline: getOffset = the
  * latest completed data instant, getBatch = the incremental query over
  * (start, end] — per micro-batch only the files committed in that window
  * are read (the CommitFeed pattern behind the native front door). */
class GraftStreamSource(spark: SparkSession, path: String,
    parameters: Map[String, String],
    metadataPath: Option[String] = None) extends Source {
  import DefaultSource._
  require(GraftTable.exists(path), s"no graft table at $path")
  private val t = GraftTable.load(spark, path)
  private val startFrom = parameters.getOrElse(BEGIN_INSTANTTIME, "0")
  // catch-up bound: at most N commits per micro-batch, so a stream started
  // against months of history (or restarted after downtime) drains in
  // bounded, checkpointable steps instead of one giant first batch — the
  // same role as maxFilesPerTrigger on file sources. The cursor (the last
  // offset this source RETURNED) persists in the source's own checkpoint
  // subdir so a restarted query resumes bounding from where it left off —
  // without it a fresh source instance could re-offer an offset BEHIND the
  // query's committed one, replaying processed commits downstream.
  private val maxInstants =
    parameters.get(MAX_INSTANTS_PER_TRIGGER).map(_.toInt).filter(_ > 0)
  // Spark hands metadataPath as a URI string (file:/...); treating it as a
  // raw path would create a literal "file:" directory under the cwd
  private val cursorFile = metadataPath.map { p =>
    val u = try new java.net.URI(p) catch { case _: Exception => null }
    val fsPath = if (u != null && u.getScheme == "file") u.getPath else p
    java.nio.file.Paths.get(fsPath, "graft-cursor")
  }
  @volatile private var cursor: String = {
    val persisted = cursorFile.filter(java.nio.file.Files.exists(_)).map(p =>
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim)
    (Seq(startFrom) ++ persisted).max
  }
  private def advanceCursor(to: String): Unit = if (to > cursor) {
    cursor = to
    cursorFile.foreach { p =>
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, to.getBytes("UTF-8"))
    }
  }

  /** Fixed for the query's lifetime; later schema evolution is projected
    * back onto this shape (streaming sinks need a stable schema). */
  override val schema: StructType = t.incremental(startFrom).schema

  private def instantOf(o: OffsetV1): String = o match {
    case GraftOffset(i) => i
    case other =>
      val parsed = graft.table.Json.mapper
        .readValue[Map[String, String]](other.json().getBytes("UTF-8"))
      parsed("instant")
  }

  override def getOffset: Option[OffsetV1] = {
    val end = maxInstants match {
      case Some(n) => t.dataInstantAfter(cursor, n).getOrElse(cursor)
      case None => t.latestDataInstant.getOrElse(cursor)
    }
    advanceCursor(end)
    Some(cursor).filter(_ > startFrom).map(GraftOffset(_))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(instantOf).getOrElse(startFrom)
    // a restored batch (pre-cursor-file checkpoint) tells us the true
    // position: never offer an offset behind it again
    advanceCursor(instantOf(end))
    val batch = t.incremental(from, Some(instantOf(end)))
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col(_)): _*)
    org.apache.spark.sql.graftbridge.DatasetBridge.stream(batch)
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftStreamSource[$path]"
}

class GraftStreamSink(spark: SparkSession, path: String,
    parameters: Map[String, String]) extends Sink {
  import DefaultSource._

  // async table service lane (ref: hoodie.datasource.compaction.async.enable
  // + async/AsyncCompactService.java): plans are scheduled on the
  // micro-batch thread (a metadata listing), executed on this single
  // daemon thread so the streaming cadence never pays rewrite IO
  private lazy val servicePool = java.util.concurrent.Executors
    .newSingleThreadExecutor((r: Runnable) => {
      val th = new Thread(r, s"graft-sink-services")
      th.setDaemon(true)
      th
    })
  @volatile private var pendingService: java.util.concurrent.Future[_] =
    java.util.concurrent.CompletableFuture.completedFuture(null)
  private var committed = 0L

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val t = if (GraftTable.exists(path)) GraftTable.load(spark, path)
            else GraftTable.create(spark, path, configFrom(parameters, path))
    // the checkpoint dir is the stream identity: batch ids restart at 0 for
    // a fresh checkpoint, so the scope keeps a new query from skipping its
    // first batches on a table with streaming history
    val streamId = parameters.getOrElse("checkpointLocation", path)
    if (!graft.streaming.GraftStreaming.batchCommitted(t, streamId, batchId)) {
      val batch = transform(
        org.apache.spark.sql.graftbridge.DatasetBridge.unstream(data))
      // transient-failure policy (ref: HoodieStreamingSink RETRY_CNT /
      // RETRY_INTERVAL_MS / IGNORE_FAILED_BATCH): retry the micro-batch
      // write in place — the batch id makes a half-landed retry idempotent
      // (a committed attempt short-circuits) — then either surface the
      // failure (default: the query dies, exactly-once preserved) or, if
      // explicitly opted in, log and DROP the batch (availability over
      // completeness, as the reference defaults to — data loss is the
      // documented trade).
      val retries = parameters.getOrElse(STREAMING_RETRY_COUNT, "3").toInt
      val intervalMs = parameters.getOrElse(STREAMING_RETRY_INTERVAL_MS, "2000").toLong
      val ignoreFailed = parameters.get(STREAMING_IGNORE_FAILED_BATCH).exists(_.toBoolean)
      var attempt = 0
      var done = false
      var lastErr: Throwable = null
      while (!done && attempt <= retries) {
        if (attempt > 0) Thread.sleep(intervalMs)
        try {
          if (!graft.streaming.GraftStreaming.batchCommitted(t, streamId, batchId))
            t.writeBatch(batch, parameters.getOrElse(OPERATION, "upsert"),
              Map("streamBatchId" -> s"$streamId#$batchId"))
          done = true
        } catch { case e: Throwable => lastErr = e; attempt += 1 }
      }
      if (!done) {
        if (!ignoreFailed) throw lastErr
        System.err.println(s"[graft-sink] batch $batchId dropped after " +
          s"${retries + 1} attempts ($STREAMING_IGNORE_FAILED_BATCH=true): " +
          s"${lastErr.getMessage}")
      } else {
        committed += 1
        maybeCompact(t)
        maybeCluster(t)
      }
    }
  }

  /** Async compaction, on by default for MOR (as in the reference): every
    * `graft.compaction.async.every` committed batches, schedule a plan and
    * execute it off-thread; runCompaction tolerates the deltacommits that
    * land while it runs (they stay layered, fold into the next plan). */
  private def maybeCompact(t: GraftTable): Unit = {
    val enabled = parameters.get(ASYNC_COMPACT).map(_.toBoolean)
      .getOrElse(t.config.tableType == MergeOnRead)
    val every = parameters.getOrElse(ASYNC_COMPACT_EVERY, "5").toLong
    if (enabled && t.config.tableType == MergeOnRead &&
        committed % every == 0 && pendingService.isDone)
      t.scheduleCompaction().foreach { plan =>
        pendingService = servicePool.submit(new Runnable {
          override def run(): Unit =
            try t.runCompaction(plan)
            catch { case e: Throwable =>
              System.err.println(s"[graft-sink] async compaction failed: ${e.getMessage}")
            }
        })
      }
  }

  /** Async clustering (ref: hoodie.clustering.async.enabled +
    * async/AsyncClusteringService.java — default OFF, as in the reference):
    * every `graft.clustering.async.every` committed batches, schedule a
    * layout plan (sort columns from `graft.clustering.sort.columns`) and
    * execute it on the service thread. runClustering skips any group a
    * later batch touched (replace would drop interleaved rows), so the
    * ingest cadence is never blocked or conflicted. */
  private def maybeCluster(t: GraftTable): Unit = {
    if (!parameters.get(ASYNC_CLUSTER).exists(_.toBoolean)) return
    val every = parameters.getOrElse(ASYNC_CLUSTER_EVERY, "4").toLong
    if (committed % every == 0 && pendingService.isDone) {
      val sortCols = parameters.getOrElse(AutoServices.CLUSTER_SORT_COLS,
        throw new IllegalArgumentException(
          s"$ASYNC_CLUSTER=true requires ${AutoServices.CLUSTER_SORT_COLS}"))
        .split(',').map(_.trim).filter(_.nonEmpty).toSeq
      t.scheduleClustering(sortCols).foreach { plan =>
        pendingService = servicePool.submit(new Runnable {
          override def run(): Unit =
            try t.runClustering(plan)
            catch { case e: Throwable =>
              System.err.println(s"[graft-sink] async clustering failed: ${e.getMessage}")
            }
        })
      }
    }
  }

  /** Ingest-time SQL transform between source and table (ref:
    * hudi-utilities/.../transform/SqlQueryBasedTransformer.java, option
    * `hoodie.deltastreamer.transformer.sql`): the micro-batch registers as
    * a temp view and `<SRC>` in the query substitutes its name, so
    * projections/filters/enrichment run inside the same exactly-once
    * commit. The transform stays a lazy plan — no extra materialization. */
  private def transform(batch: DataFrame): DataFrame =
    parameters.get(TRANSFORMER_SQL) match {
      case None => batch
      case Some(q) =>
        require(q.contains("<SRC>"),
          s"$TRANSFORMER_SQL must reference the micro-batch as <SRC>")
        val view = s"graft_src_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        // the micro-batch runs on a cloned session — the view must register
        // and resolve on THAT session's catalog, not the sink's outer one
        val ss = batch.sparkSession
        batch.createOrReplaceTempView(view)
        try ss.sql(q.replace("<SRC>", view))
        finally ss.catalog.dropTempView(view)
    }

  override def toString: String = s"GraftStreamSink[$path]"
}

object DefaultSource {
  private[graft] def configFrom(parameters: Map[String, String], path: String): TableConfig = {
    val keys = parameters.getOrElse(RECORDKEY_FIELD,
      throw new IllegalArgumentException(
        s"creating a graft table requires $RECORDKEY_FIELD"))
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val hiveStyle = parameters.getOrElse(HIVE_STYLE_PARTITIONING, "true").toBoolean
    val urlEncode = parameters.getOrElse(PARTITIONPATH_URLENCODE, "false").toBoolean
    val partitioning = parameters.get(PARTITIONPATH_FIELD)
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
      .map { fields =>
        // CustomKeyGenerator syntax (ref: hudi keygen/CustomKeyGenerator
        // .java): "region:simple,ts:timestamp" mixes segment kinds; plain
        // names stay the simple column path
        if (fields.exists(_.contains(':')))
          PartitionByMixed(fields.map { f =>
            f.split(':') match {
              case Array(c) => PartitionSegment(c)
              case Array(c, k) => PartitionSegment(c, k,
                parameters.getOrElse(PARTITION_TS_FORMAT, "yyyy-MM-dd"))
              case _ => throw new IllegalArgumentException(
                s"bad partition field '$f' (col or col:simple|timestamp)")
            }
          }, hiveStyle): PartitionSpec
        else PartitionByColumns(fields, hiveStyle, urlEncode): PartitionSpec
      }
      .orElse(parameters.get(PARTITION_TS_COL).map(c =>
        PartitionByTimestamp(c,
          parameters.getOrElse(PARTITION_TS_FORMAT, "yyyy-MM-dd"),
          hiveStyle,
          parameters.getOrElse(PARTITION_TS_TYPE, "timestamp"),
          parameters.getOrElse(PARTITION_TS_INPUT_FORMAT, "yyyy-MM-dd")): PartitionSpec))
      .getOrElse(NonPartitioned)
    TableConfig(
      name = parameters.getOrElse(TABLE_NAME,
        java.nio.file.Paths.get(path).getFileName.toString),
      tableType = TableType.of(parameters.getOrElse(TABLE_TYPE, "cow")),
      keyFields = keys,
      precombineField = parameters.get(PRECOMBINE_FIELD),
      partitioning = partitioning,
      index = parameters.get(INDEX_BUCKETS).map(n => BucketIndex(n.toInt): IndexType)
        .getOrElse(StatsIndex),
      targetFileSizeRows = parameters.getOrElse(TARGET_FILE_ROWS, "1000000").toLong,
      payload = MergePayload.of(parameters.getOrElse(PAYLOAD, "overwrite_latest")),
      populateMetaFields =
        parameters.getOrElse(POPULATE_META_FIELDS, "true").toBoolean,
      baseFileFormat =
        parameters.getOrElse(BASE_FILE_FORMAT, "parquet").toLowerCase,
      dropPartitionColumns =
        parameters.getOrElse(DROP_PARTITION_COLUMNS, "false").toBoolean)
  }

  // read options (ref: hudi DataSourceReadOptions)
  val QUERY_TYPE = "graft.query.type"
  val AS_OF_INSTANT = "as.of.instant"
  val BEGIN_INSTANTTIME = "graft.begin.instanttime"
  val END_INSTANTTIME = "graft.end.instanttime"
  // write options (ref: hudi DataSourceWriteOptions)
  val OPERATION = "graft.operation"
  /** `hash` (default) | `global_sort` — see [[graft.table.GraftTable.bulkInsert]]
    * (ref: hoodie.bulkinsert.sort.mode). */
  val BULKINSERT_SORT_MODE = "graft.bulkinsert.sort.mode"
  val TABLE_TYPE = "graft.table.type"
  val TABLE_NAME = "graft.table.name"
  val RECORDKEY_FIELD = "graft.recordkey.field"
  val PRECOMBINE_FIELD = "graft.precombine.field"
  val PARTITIONPATH_FIELD = "graft.partitionpath.field"
  val PARTITION_TS_COL = "graft.partition.timestamp.col"
  val PARTITION_TS_FORMAT = "graft.partition.timestamp.format"
  // input interpretation of the timestamp column (ref: hoodie.deltastreamer
  // .keygen.timebased.timestamp.type — UNIX_TIMESTAMP / EPOCHMILLISECONDS /
  // DATE_STRING): timestamp | epoch_millis | epoch_seconds | date_string
  val PARTITION_TS_TYPE = "graft.partition.timestamp.type"
  // (ref: hoodie.deltastreamer.keygen.timebased.input.dateformat)
  val PARTITION_TS_INPUT_FORMAT = "graft.partition.timestamp.input.format"
  // bare `val` segments instead of `col=val` (ref: hoodie.datasource.write
  // .hive_style_partitioning — the reference defaults to bare; graft keeps
  // hive-style as the default since external pruning tools expect it)
  val HIVE_STYLE_PARTITIONING = "graft.hive.style.partitioning"
  // percent-encode partition values so `/`, `=`, whitespace can't corrupt
  // the layout (ref: hoodie.datasource.write.partitionpath.urlencode)
  val PARTITIONPATH_URLENCODE = "graft.partitionpath.urlencode"
  // partition values live only in the path, never in the files (ref:
  // hoodie.datasource.write.drop.partition.columns)
  val DROP_PARTITION_COLUMNS = "graft.drop.partition.columns"
  // false = duplicate keys in one insert batch all append (ref:
  // hoodie.combine.before.insert, whose reference default IS false;
  // graft defaults to combining, so a table stays key-unique unless the
  // caller explicitly opts into duplicate rows)
  val COMBINE_BEFORE_INSERT = "graft.combine.before.insert"
  // fully-qualified CommitCallback class fired after each door write (ref:
  // hoodie.write.commit.callback.on + .callback.class; graft's "on" is the
  // option's presence). graft.table.FileCommitCallback appends an audit log.
  val COMMIT_CALLBACK_CLASS = "graft.commit.callback.class"
  val INDEX_BUCKETS = "graft.index.buckets"
  val TARGET_FILE_ROWS = "graft.target.file.rows"
  // merge payload semantics (ref: hudi hoodie.datasource.write.payload.class)
  val PAYLOAD = "graft.merge.payload"
  // schema-on-read evolution: RENAME/DROP COLUMN resolved by column id
  // (ref: hudi hoodie.schema.on.read.enable)
  val SCHEMA_ON_READ = "graft.schema.on.read"
  // virtual keys: append-only tables with no materialized `_g_*` columns
  // (ref: hudi hoodie.populate.meta.fields, HoodieTableConfig.java:178)
  val POPULATE_META_FIELDS = "graft.populate.meta.fields"
  // base file format: parquet (default) | orc
  // (ref: hoodie.table.base.file.format, HoodieOrcWriter)
  val BASE_FILE_FORMAT = "graft.base.file.format"
  // streaming-sink ingest transform, `<SRC>` = the micro-batch view
  // (ref: hudi hoodie.deltastreamer.transformer.sql)
  val TRANSFORMER_SQL = "graft.transformer.sql"
  // (ref: hoodie.datasource.write.insert.drop.duplicates)
  val INSERT_DROP_DUPS = "graft.insert.drop.duplicates"
  // (ref: hoodie.datasource.write.partitions.to.delete)
  val PARTITIONS_TO_DELETE = "graft.partitions.to.delete"
  // (ref: hoodie.datasource.write.commitmeta.key.prefix)
  val COMMITMETA_KEY_PREFIX = "graft.commitmeta.key.prefix"
  // (ref: hoodie.datasource.read.incr.fallback.fulltablescan.enable)
  val INCR_FALLBACK_FULLSCAN = "graft.incremental.fallback.fullscan"
  // partition-path glob pruning for incremental reads
  // (ref: hoodie.datasource.read.incr.path.glob)
  val INCR_PATH_GLOB = "graft.incr.path.glob"
  // MOR snapshot without the per-key merge: base + log rows as-is
  // (ref: hoodie.datasource.merge.type = realtime_skip_merge)
  val MERGE_TYPE = "graft.merge.type"
  // streaming sink: schedule+execute compaction off the micro-batch path
  // (ref: hoodie.datasource.compaction.async.enable, default true for MOR)
  val ASYNC_COMPACT = "graft.compaction.async"
  // plan cadence in committed batches (ref: hoodie.compact.inline.max.delta.commits)
  val ASYNC_COMPACT_EVERY = "graft.compaction.async.every"
  // streaming sink: async clustering (ref: hoodie.clustering.async.enabled,
  // default off); sort columns come from graft.clustering.sort.columns
  val ASYNC_CLUSTER = "graft.clustering.async"
  val ASYNC_CLUSTER_EVERY = "graft.clustering.async.every"
  // streaming source catch-up bound: at most N commits per micro-batch
  // (the maxFilesPerTrigger pattern for a commit-timeline source)
  val MAX_INSTANTS_PER_TRIGGER = "graft.max.instants.per.trigger"
  // sink transient-failure policy (ref: hoodie.datasource.write.streaming.
  // retry.count / retry.interval.ms / ignore.failed.batch — graft defaults
  // ignore to FALSE: dropping a batch is explicit opt-in, not a default)
  val STREAMING_RETRY_COUNT = "graft.streaming.retry.count"
  val STREAMING_RETRY_INTERVAL_MS = "graft.streaming.retry.interval.ms"
  val STREAMING_IGNORE_FAILED_BATCH = "graft.streaming.ignore.failed.batch"
}
