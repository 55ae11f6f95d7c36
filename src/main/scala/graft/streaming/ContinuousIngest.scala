package graft.streaming

import java.util.concurrent.Executors
import scala.concurrent.{ExecutionContext, Future}
import org.apache.spark.sql.DataFrame
import graft.table.{GraftTable, KeepLatestFileVersions, MergeOnRead}

/**
 * DeltaStreamer-style continuous ingest (ref: hudi-utilities
 * .../HoodieDeltaStreamer.java continuous mode + DeltaSync.java sync loop +
 * async/AsyncCompactService.java:41): pull the next batch from a source,
 * optionally SQL-transform it, upsert it with the source checkpoint riding
 * in the commit metadata, and keep the table serviced — compaction is
 * SCHEDULED on the ingest thread (a metadata-only listing) and EXECUTED on
 * a background thread via the schedule/execute split, so at 100 TB the
 * ingest cadence never pays rewrite IO.
 *
 * The source is a pull function `() => Option[(checkpoint, batch)]` —
 * [[CommitFeed]]/[[CdcFeed]] have exactly this shape, and a Kafka/file
 * source adapts in a line. `checkpoint` is an opaque resume token: the
 * latest one is recoverable via [[ContinuousIngest.lastCheckpoint]] (ref:
 * DeltaSync's CHECKPOINT_KEY in HoodieCommitMetadata).
 */
class ContinuousIngest(
    t: GraftTable,
    source: () => Option[(String, DataFrame)],
    transformerSql: Option[String] = None,
    transforms: Seq[DataFrame => DataFrame] = Nil, // ref: ChainedTransformer
    operation: String = "upsert",
    compactEvery: Int = 5,
    cleanRetainVersions: Int = 0, // 0 = cleaning off
    archiveKeepLast: Int = 0, // 0 = archival off
    // post-commit source acknowledgement (ref: hudi-utilities
    // sources/Source.java onCommit — S3EventsSource deletes its processed
    // queue messages only after the commit carrying them completed):
    // called with the committed checkpoint AFTER writeBatch succeeds, so
    // an ack-style source is at-least-once with the commit as the ack
    // barrier (replays dedup through the table's upsert key)
    onCommit: String => Unit = _ => (),
    // post-commit hook with the (instant, TRANSFORMED batch) that was just
    // written — the seam for side state that must follow the table (e.g.
    // [[graft.pipeline.MinhashIndex]] upserting the committed survivors'
    // band rows). Runs BEFORE onCommit's source ack. The frame is the
    // transform output — a transform that localCheckpoints (the gate
    // wiring does) hands the hook pinned rows, not a recompute. A hook
    // failure fails the step AFTER the commit: the checkpoint already
    // rides the commit so the batch will NOT replay — hook consumers must
    // be reconcilable from table state (MinhashIndex.reconcile is exactly
    // that repair)
    onBatchCommitted: (String, DataFrame) => Unit = (_, _) => ()
) extends AutoCloseable {
  require(compactEvery >= 0, "compactEvery must be >= 0 (0 = off)")
  transformerSql.foreach(q => require(q.contains("<SRC>"),
    "transformerSql must reference the micro-batch as <SRC>"))

  private val pool = Executors.newSingleThreadExecutor((r: Runnable) => {
    val th = new Thread(r, s"graft-ingest-services-${t.config.name}")
    th.setDaemon(true)
    th
  })
  implicit private val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)

  private var ingested = 0L
  @volatile private var pendingService: Future[Option[String]] = Future.successful(None)
  @volatile private var pendingClean: Future[Option[String]] = Future.successful(None)

  /** Jobs submitted from the service thread carry the services pool (ref:
    * AsyncCompactService.COMPACT_POOL_NAME + SchedulerConfGenerator): under
    * `spark.scheduler.mode=FAIR` with [[SchedulerPools.sparkConfigs]]'
    * allocation file, a long compaction rewrite time-shares with ingest
    * jobs instead of queueing ahead of them — on a real cluster this is
    * what keeps the ingest cadence flat while services churn. Without FAIR
    * mode the property is inert, so it is always set. */
  private def inServicePool[T](body: => T): T = {
    t.spark.sparkContext.setLocalProperty(
      "spark.scheduler.pool", SchedulerPools.ServicesPool)
    body
  }

  /** The last table-service execution kicked off by the loop (tests and
    * shutdown drain it). */
  def lastService: Future[Option[String]] = pendingService

  /** The last scheduled-clean execution kicked off by the loop. */
  def lastClean: Future[Option[String]] = pendingClean

  // ref: SqlQueryBasedTransformer + ChainedTransformer — the inline SQL
  // (if any) runs first, then the transform chain in declared order; every
  // stage stays a lazy plan over the batch
  private val allTransforms: Seq[DataFrame => DataFrame] =
    transformerSql.map(Transformers.sql).toSeq ++ transforms
  private def transform(batch: DataFrame): DataFrame =
    allTransforms.foldLeft(batch)((df, tr) => tr(df))

  /** One sync cycle: ingest the next batch if the source has one, then keep
    * the table serviced. Returns the ingest's commit instant. Synchronous
    * and re-entrant-free by design — tests drive it directly; [[run]] loops
    * it. */
  def step(): Option[String] = source().map { case (checkpoint, batch) =>
    val transformed = transform(batch)
    val instant = t.writeBatch(transformed, operation,
      extra = Map("checkpoint" -> checkpoint))
    onBatchCommitted(instant, transformed)
    onCommit(checkpoint)
    ingested += 1
    if (compactEvery > 0 && t.config.tableType == MergeOnRead &&
        ingested % compactEvery == 0 && pendingService.isCompleted) {
      // plan on THIS thread (metadata listing only), execute off it
      t.scheduleCompaction().foreach { plan =>
        pendingService = Future(inServicePool(t.runCompaction(plan)))
      }
    }
    // clean/archive cadence decoupled from compaction: 2× the compaction
    // period when compaction is on, every 10 batches otherwise — never
    // every batch (a full clean sweep on the ingest hot path)
    val houseEvery = if (compactEvery > 0) compactEvery * 2 else 10
    if (cleanRetainVersions > 0 && ingested % houseEvery == 0 &&
        pendingClean.isCompleted)
      // same split as compaction: the PLAN (doomed-set listing) runs on the
      // ingest thread, the physical deletes — at 100 TB potentially
      // millions of object-store DELETEs — run on the service thread,
      // serialized behind any in-flight compaction by the single-thread
      // pool; runClean revalidates against whatever landed meanwhile
      t.scheduleClean(KeepLatestFileVersions(cleanRetainVersions)).foreach { plan =>
        pendingClean = Future(inServicePool(t.runClean(plan)))
      }
    // keep the file-listing metadata table current on the same cadence —
    // the sync is O(commits since last sync), so steady-state cost stays
    // bounded and cold restarts read parquet segments, not N JSON metas.
    // Sync BEFORE archive: commits the archive folds into its checkpoint
    // should already be in the segments (the sync can replay
    // archive-before-sync commits from the cold archive, but keeping the
    // order right makes that the exception path, not the steady state)
    if (ingested % houseEvery == 0 &&
        java.nio.file.Files.isDirectory(t.mdtFilesDir))
      try t.syncMetadataTable()
      catch { case _: Exception => /* listing sync must never stop ingest */ }
    if (archiveKeepLast > 0 && ingested % houseEvery == 0)
      t.archive(archiveKeepLast)
    instant
  }

  /** Loop until `maxCycles` ingests happened or `stop()` is called,
    * sleeping `idleMs` when the source is dry (ref: continuous-mode
    * min-sync-interval). */
  @volatile private var stopped = false
  def stop(): Unit = stopped = true

  def run(maxCycles: Long = Long.MaxValue, idleMs: Long = 1000): Long = {
    var n = 0L
    while (!stopped && n < maxCycles) {
      if (step().isDefined) n += 1
      else if (!stopped) Thread.sleep(idleMs)
    }
    n
  }

  /** Ingest until the source reports dry ONCE, then return the cycle count
    * — the one-shot (non-continuous) DeltaStreamer mode (ref:
    * HoodieDeltaStreamer without --continuous). */
  def drain(): Long = {
    var n = 0L
    while (!stopped && step().isDefined) n += 1
    n
  }

  def close(): Unit = {
    stopped = true
    // drain in-flight services so their commits are not torn down mid-write
    for (f <- Seq(pendingService, pendingClean))
      try scala.concurrent.Await.result(f,
        scala.concurrent.duration.Duration(120, "s"))
      catch { case _: Throwable => }
    pool.shutdown()
  }
}

/**
 * FAIR-scheduler pool split for continuous ingest (ref: hudi-utilities
 * deltastreamer/SchedulerConfGenerator.java — the reference generates a
 * spark fair-scheduler allocation XML with deltasync/compaction/clustering
 * pools when `spark.scheduler.mode=FAIR`, so table services time-share
 * with the sync loop instead of queueing ahead of it): [[sparkConfigs]]
 * writes the allocation file and returns the confs to set on the
 * SparkSession BUILDER; [[ContinuousIngest]] tags every service-thread job
 * with [[ServicesPool]] unconditionally (inert without FAIR mode). Ingest
 * jobs run in the caller's pool — set [[IngestPool]] on the ingest thread
 * to give the sync loop its weighted share.
 */
object SchedulerPools {
  val IngestPool = "graft-ingest"
  val ServicesPool = "graft-services"

  /** Allocation file + confs (ref: SchedulerConfGenerator.generateConfig —
    * same pool XML shape, two pools instead of three because compaction,
    * clustering and cleaning share the single service thread here). */
  def sparkConfigs(ingestWeight: Int = 2, ingestMinShare: Int = 2,
      servicesWeight: Int = 1, servicesMinShare: Int = 1): Map[String, String] = {
    val xml =
      s"""<?xml version="1.0"?>
         |<allocations>
         |  <pool name="$IngestPool">
         |    <schedulingMode>FAIR</schedulingMode>
         |    <weight>$ingestWeight</weight>
         |    <minShare>$ingestMinShare</minShare>
         |  </pool>
         |  <pool name="$ServicesPool">
         |    <schedulingMode>FAIR</schedulingMode>
         |    <weight>$servicesWeight</weight>
         |    <minShare>$servicesMinShare</minShare>
         |  </pool>
         |</allocations>""".stripMargin
    val f = java.nio.file.Files.createTempFile("graft_scheduler_", ".xml")
    java.nio.file.Files.write(f, xml.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Map("spark.scheduler.mode" -> "FAIR",
      "spark.scheduler.allocation.file" -> f.toString)
  }
}

object ContinuousIngest {
  /** The newest source checkpoint recorded in the table's commit metadata —
    * where a restarted ingest resumes from (ref: DeltaSync
    * .getLatestCommitMetadataWithValidCheckpointInfo). Falls back to the
    * archived timeline (a one-off cold read on restart) when every
    * checkpointed commit has been archived. */
  def lastCheckpoint(t: GraftTable): Option[String] = {
    t.timeline.refresh()
    t.timeline.metasSlim(None).reverseIterator
      .flatMap(_.extra.get("checkpoint")).nextOption()
      .orElse(t.timeline.archivedMetas().reverseIterator
        .flatMap(_.extra.get("checkpoint")).nextOption())
  }

  /** The newest checkpoint recorded by a SPECIFIC source kind — checkpoint
    * values are namespaced `<kind>:<value>` so different sources chained
    * into one table (SQL backfill + DFS inbox + JDBC pull) never read each
    * other's resume tokens. Scans newest-first through the live then
    * archived timeline: a commit from a DIFFERENT source in between does
    * not hide this source's watermark. */
  /** Checkpoint namespaces in use; a stored value starting with none of
    * these is a LEGACY pre-namespacing watermark (the value itself may
    * contain ':' — a jdbc timestamp, a dfs name — so "has a colon" is not
    * the test). */
  private val KnownKinds =
    Set(DfsSource.Kind, SqlOnceSource.Kind, JdbcSource.Kind, CommitFeed.Kind,
      KafkaLikeSource.Kind)

  /** Kinds that EXISTED before checkpoint namespacing — only these may
    * interpret a bare pre-namespacing value as their own watermark. A kind
    * added after namespacing (kafka, and anything future) can never have
    * written a bare value, so adopting one would be claiming a FOREIGN
    * source's resume token (at best a decode crash, at worst silently
    * skipped or re-read data). */
  private val LegacyEligibleKinds =
    Set(DfsSource.Kind, SqlOnceSource.Kind, JdbcSource.Kind, CommitFeed.Kind)

  /** `accept` narrows the match WITHIN a kind — e.g. the Kafka source
    * passes a topic predicate so several topics feeding one table each
    * resume from their own newest offset map, not whichever topic
    * committed last. */
  def lastCheckpointFor(t: GraftTable, kind: String,
      accept: String => Boolean = _ => true): Option[String] = {
    val prefix = kind + ":"
    def find(metas: Iterator[graft.table.CommitMeta]): Option[String] =
      metas.flatMap(_.extra.get("checkpoint"))
        .collectFirst { case v if v.startsWith(prefix) &&
          accept(v.drop(prefix.length)) => v.drop(prefix.length) }
    // upgrade path: a table whose last ingest predates checkpoint
    // namespacing recorded a bare value — resuming from scratch would
    // re-ingest the whole inbox, so the newest prefix-free value serves
    // as the legacy watermark when no namespaced one exists (and the
    // asking kind predates namespacing itself)
    def findLegacy(metas: Iterator[graft.table.CommitMeta]): Option[String] =
      metas.flatMap(_.extra.get("checkpoint"))
        .collectFirst { case v
          if !KnownKinds.exists(k => v.startsWith(k + ":")) => v }
    t.timeline.refresh()
    val namespaced = find(t.timeline.metasSlim(None).reverseIterator)
      .orElse(find(t.timeline.archivedMetas().reverseIterator))
    if (namespaced.nonEmpty || !LegacyEligibleKinds.contains(kind)) namespaced
    else findLegacy(t.timeline.metasSlim(None).reverseIterator)
      .orElse(findLegacy(t.timeline.archivedMetas().reverseIterator))
  }

  /** Initial-checkpoint provider (ref: hudi-utilities checkpointing/
    * InitialCheckPointProvider.java + InitialCheckpointFromAnotherHoodie
    * TimelineProvider.java): seed a NEW table's first pull from ANOTHER
    * table's recorded checkpoint of the same source kind. Migrating a
    * pipeline to a fresh table (schema redesign, key change, backfill
    * rebuild) then resumes from where the old table left off instead of
    * re-reading the whole source. Purely a SEED: once the new table has
    * committed its own checkpoint of that kind, the provider is never
    * consulted again (checkpoints are resolved newest-first from the
    * table's own timeline, the seed only fills the `None` case). */
  def initialCheckpointFromTimeline(other: GraftTable, kind: String,
      accept: String => Boolean = _ => true): Option[String] =
    lastCheckpointFor(other, kind, accept)

  /** File name of one Kafka-Connect-HDFS output object:
    * `topic+partition+lowerOffset+upperOffset(.ext)` — the reference's
    * exact pattern (KafkaConnectHdfsProvider.KafkaConnectPathFilter). */
  private val ConnectFile =
    """([a-zA-Z0-9._\-]+)\+(\d+)\+(\d+)\+(\d+)(\.\w+)?""".r

  /** Initial Kafka checkpoint derived from a Kafka-Connect-HDFS managed
    * data set (ref: hudi-utilities checkpointing/KafkaConnectHdfsProvider
    * .java): migrating a connect-written directory tree to streaming
    * ingest resumes from where connect left off instead of offset 0.
    * Recurses only `name=value`-style partition directories (connect's
    * layout), takes each kafka partition's MAX upper offset, requires the
    * partition set be contiguous 0..max (a missing partition means the
    * scan saw an incomplete tree — resuming would silently skip its
    * data), and returns the `topic,0:o,1:o,...` checkpoint string that
    * [[KafkaLikeSource.forTable]] accepts as `initial`. Like the
    * reference, the recorded offset is the last WRITTEN offset, so the
    * first pull re-reads one record per partition — at-least-once, deduped
    * through the table's upsert key. */
  def initialCheckpointFromKafkaConnect(dir: java.nio.file.Path): String = {
    import scala.collection.mutable
    val files = mutable.Buffer[(String, Int, Long)]() // (topic, partition, upper)
    def scan(d: java.nio.file.Path): Unit =
      graft.table.Fs.list(d).foreach { p =>
        if (java.nio.file.Files.isDirectory(p)) {
          if (p.getFileName.toString.contains("=")) scan(p)
        } else p.getFileName.toString match {
          case ConnectFile(topic, part, _, upper, _) =>
            files += ((topic, part.toInt, upper.toLong))
          case _ => // not a connect object (checkpoint/tmp/etc.)
        }
      }
    scan(dir)
    require(files.nonEmpty, s"no Kafka-Connect-HDFS files found under $dir")
    val topics = files.map(_._1).distinct
    require(topics.size == 1,
      s"Kafka-Connect tree under $dir mixes topics: ${topics.mkString(",")}")
    val byPart = files.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    val maxPart = byPart.keys.max
    require(byPart.size == maxPart + 1,
      s"missing partition in the connect scan under $dir: saw " +
        s"${byPart.size} partitions, expected ${maxPart + 1} (0..$maxPart)")
    topics.head + "," + KafkaLikeSource.encodeOffsets(byPart)
  }
}
