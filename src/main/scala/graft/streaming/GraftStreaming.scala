package graft.streaming

import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** A typed event row for streaming pipelines over the events table shape. */
case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Accumulating session state for stateful sessionization. */
case class SessionAcc(startMs: Long, lastMs: Long, n: Int, total: Double)

/** An emitted user session. */
case class Session(user_id: Long, start_ts: java.sql.Timestamp,
    end_ts: java.sql.Timestamp, n_events: Int, total_value: Double)

/** One table's routing rule for [[GraftStreaming.multiTableSink]]: `route`
  * extracts the micro-batch slice belonging to `table` (filter + projection
  * to the table's schema — must be deterministic, it re-runs on replay) and
  * `operation` is the Graft write op applied to it. */
case class TableRoute(table: GraftTable, route: DataFrame => DataFrame,
    operation: String = "upsert")

/**
 * Structured-Streaming surface (SURVEY.md §2.4) — the Spark-first
 * re-expression of the reference's streaming ingest (its Flink streamer /
 * DeltaStreamer, ref: hudi-flink-datasource/.../HoodieFlinkStreamerWithApollo,
 * hudi-utilities deltastreamer): stream → exactly-once upsert into a table,
 * windowed aggregation with watermarks, stateful sessionization, and an
 * incremental commit feed (the "streaming read a table" direction).
 */
object GraftStreaming {

  /**
   * Exactly-once foreachBatch upsert sink: the micro-batch id — scoped by
   * the stream's checkpoint identity — is recorded in the commit metadata;
   * a replayed batch (failure/retry) finds its id already committed and
   * becomes a no-op — the same batchId⇒instant idempotency the reference's
   * streaming sink keeps (ref: HoodieStreamingSink.scala canSkipBatch/
   * latestCommittedBatchId). The scope matters: batch ids restart at 0 for
   * every new checkpoint dir, so an UNSCOPED id would make a brand-new
   * query silently skip its first batches on a table with streaming
   * history.
   */
  def upsertSink(t: GraftTable, streamId: String)(batch: DataFrame, batchId: Long): Unit =
    if (!batchCommitted(t, streamId, batchId))
      t.writeBatch(batch, "upsert", Map("streamBatchId" -> s"$streamId#$batchId"))

  /** Has this stream's micro-batch already committed to `t`?
    * Archival folds old commits into a checkpoint carrying the MAX batch
    * id per stream under "streamBatchIds" (batch ids are monotonic per
    * stream, so the max is a complete dedup watermark and the carry stays
    * O(#streams), not O(#batches)) — a replay after archival still dedups. */
  private[graft] def batchCommitted(t: GraftTable, streamId: String, batchId: Long): Boolean = {
    val key = s"$streamId#$batchId"
    t.timeline.metasSlim(None).exists(m =>
      m.extra.get("streamBatchId").contains(key) ||
        m.extra.get("streamBatchIds").exists(enc =>
          graft.table.StreamBatchIds.parse(enc).get(streamId).exists(_ >= batchId)))
  }

  /**
   * Multi-table ingest: ONE stream demuxed to N Graft tables inside a single
   * foreachBatch — the Spark-first re-expression of the reference's
   * multi-table streamer, which runs one job consuming per-table-configured
   * topics into their tables (ref: hudi-flink-datasource/hudi-flink/src/main/
   * java/org/apache/hudi/streamer/HoodieMuiltiTableFlinkStreamer.java:62, the
   * per-table config loop at :118; also hudi-utilities/.../
   * HoodieMultiTableDeltaStreamer.java). Each route takes its slice of the
   * micro-batch (filter + projection to the table's schema).
   *
   * Exactly-once is PER TABLE: every table's commit records the same
   * `<streamId>#<batchId>` key in its own timeline, so a replay after a
   * mid-batch crash (tables written before the crash have the commit, the
   * rest don't) skips exactly the finished tables and completes the rest —
   * the whole batch lands exactly once everywhere. Empty slices are skipped
   * without a commit; a replay deterministically re-skips them.
   */
  def multiTableSink(routes: Seq[TableRoute], streamId: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val todo = routes.filterNot(r => batchCommitted(r.table, streamId, batchId))
    if (todo.isEmpty) return
    // one upstream evaluation for all routes, not one per table
    val cached = if (todo.sizeIs > 1) batch.persist() else batch
    try todo.foreach { r =>
      val slice = r.route(cached)
      if (!slice.isEmpty)
        r.table.writeBatch(slice, r.operation,
          Map("streamBatchId" -> s"$streamId#$batchId"))
    } finally if (todo.sizeIs > 1) { cached.unpersist(); () }
  }

  /** Start a single streaming query sinking into N tables. As for
    * [[writeStreamTo]], the checkpoint dir is the exactly-once scope. */
  def writeStreamMultiTo(df: DataFrame, routes: Seq[TableRoute],
      checkpointDir: String): StreamingQuery =
    df.writeStream
      .foreachBatch((b: DataFrame, id: Long) =>
        multiTableSink(routes, checkpointDir)(b, id))
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Start a streaming upsert into a Graft table. The checkpoint dir
    * doubles as the exactly-once scope: same checkpoint = same stream
    * identity = replayed batch ids dedup; new checkpoint = new stream. */
  def writeStreamTo(df: DataFrame, t: GraftTable, checkpointDir: String): StreamingQuery =
    df.writeStream
      .foreachBatch((b: DataFrame, id: Long) => upsertSink(t, checkpointDir)(b, id))
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Watermarked windowed aggregation over an event stream: tumbling by
    * default, sliding when `slide` < `windowLen`. */
  def windowedEventStats(events: DataFrame, watermark: String = "10 minutes",
      windowLen: String = "1 hour", slide: Option[String] = None): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide.getOrElse(windowLen)), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))

  /**
   * Stateful sessionization: a >gap pause closes a user's session
   * (flatMapGroupsWithState + event-time timeout). State per user is one
   * small struct — memory scales with active users, not events.
   */
  /** One micro-batch's session fold: (closed sessions, new open state).
    * Exposed for direct unit testing — the streaming closure delegates
    * here. Late events (inside the watermark) merge without regressing the
    * open session's boundaries; a late burst older than the open session
    * by more than the gap forms its own already-closed session(s), with
    * adjacent late events accumulated together. */
  private[graft] def foldEvents(uid: Long, evs: Seq[Event],
      acc0: Option[SessionAcc], gapMs: Long): (Seq[Session], Option[SessionAcc]) = {
    def emit(a: SessionAcc): Session =
      Session(uid, new java.sql.Timestamp(a.startMs), new java.sql.Timestamp(a.lastMs),
        a.n, a.total)
    val out = scala.collection.mutable.Buffer[Session]()
    var acc = acc0
    var orphan: Option[SessionAcc] = None // late burst predating the open session
    for (e <- evs.sortBy(e => (e.ts.getTime, e.event_id))) {
      val ms = e.ts.getTime
      acc = acc match {
        case Some(a) if ms - a.lastMs <= gapMs && a.startMs - ms <= gapMs =>
          // a late cross-batch event must not move the session end
          // backwards — that would regress end_ts and fire the event-time
          // timeout early
          Some(SessionAcc(math.min(a.startMs, ms), math.max(a.lastMs, ms),
            a.n + 1, a.total + e.value))
        case Some(a) if ms - a.lastMs > gapMs =>
          out += emit(a)
          Some(SessionAcc(ms, ms, 1, e.value))
        case Some(a) =>
          // more than gap BEFORE the open session's start: belongs to an
          // earlier, already-closed session — accumulate adjacent ones
          orphan = orphan match {
            case Some(o) if ms - o.lastMs <= gapMs && o.startMs - ms <= gapMs =>
              Some(SessionAcc(math.min(o.startMs, ms), math.max(o.lastMs, ms),
                o.n + 1, o.total + e.value))
            case Some(o) =>
              out += emit(o)
              Some(SessionAcc(ms, ms, 1, e.value))
            case None => Some(SessionAcc(ms, ms, 1, e.value))
          }
          Some(a)
        case None => Some(SessionAcc(ms, ms, 1, e.value))
      }
    }
    orphan.foreach(o => out += emit(o))
    (out.toSeq, acc)
  }

  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
      watermark: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.lastMs), s.n, s.total))
          } else {
            val (closed, open) =
              foldEvents(uid, it.toSeq, state.getOption, gapSeconds * 1000)
            open.foreach { a =>
              state.update(a)
              state.setTimeoutTimestamp(a.lastMs + gapSeconds * 1000)
            }
            closed.iterator
          }
      }
  }
}

/**
 * Incremental commit feed: poll a Graft table for commits newer than the
 * last seen instant and get just the changed records — the reference's
 * incremental-query-as-stream-source pattern (ref: DeltaSync reading
 * QUERY_TYPE_INCREMENTAL from an upstream table). Each poll scans only the
 * files added by the new commits.
 */
class CommitFeed(t: GraftTable, startFrom: Option[String] = None,
    maxInstantsPerPoll: Int = 0) {
  private var last: String = startFrom.getOrElse("0")
  def lastSeen: String = last

  /** Changed records since the last poll. If archive() folded commits past
    * the cursor (incremental history no longer reconstructable), falls back
    * to a full snapshot as the catch-up batch — the reference's
    * incremental-query fallback-to-full-table-scan behavior — and resumes
    * incrementally from there. With `maxInstantsPerPoll` > 0 each poll
    * advances at most that many commits (bounded catch-up, the same knob
    * as the native source's graft.max.instants.per.trigger). */
  def poll(): Option[(String, DataFrame)] =
    t.latestDataInstant.filter(_ > last).map { latest =>
      val l =
        if (maxInstantsPerPoll > 0)
          t.dataInstantAfter(last, maxInstantsPerPoll).getOrElse(latest)
        else latest
      val boundary = t.timeline.archivedInstants().lastOption.getOrElse("0")
      val df =
        if (boundary > last) t.snapshot(asOf = Some(l))
        else t.incremental(last, Some(l))
      last = l
      (l, df)
    }

  /** Source function bound to a TARGET table's recorded checkpoint — the
    * reference's table-to-table replication on-ramp (ref: hudi-utilities
    * sources/HoodieIncrSource.java: incremental-query an upstream hudi
    * table with the resume instant riding the target's commit metadata).
    * The cursor re-reads from the target before every pull, so a crashed
    * or restarted replication never skips or double-applies a window: the
    * `incr:` checkpoint only advances inside the target's exactly-once
    * commit. */
  def forTable(target: GraftTable): () => Option[(String, DataFrame)] = () => {
    last = ContinuousIngest.lastCheckpointFor(target, CommitFeed.Kind)
      .getOrElse(startFrom.getOrElse("0"))
    poll().map { case (ck, df) => (s"${CommitFeed.Kind}:$ck", df) }
  }
}

object CommitFeed { private[streaming] val Kind = "incr" }

/**
 * Streaming CDC feed: like [[CommitFeed]] but each poll yields CHANGE rows —
 * op (i/u/d) with before/after images — instead of latest-state records,
 * so a downstream consumer can maintain a mirror, apply deletes, or audit
 * (the reference's CDC-format incremental query,
 * ref: hudi RFC-51 HoodieCDCRDD / `hoodie.table.cdc.enabled`; Graft computes
 * change rows by diffing the touched file groups at the two as-of points —
 * GraftTable.incrementalCDC — so only touched groups are read per poll).
 *
 * Deletes are invisible to a snapshot catch-up, so unlike [[CommitFeed]]
 * this feed cannot fall back to a snapshot when archival has folded the
 * cursor's history: poll() then fails fast (incrementalCDC's archival
 * guard) rather than silently dropping the deletes — pick a retention
 * (archive keepLast) at least as long as the slowest consumer's lag.
 */
class CdcFeed(t: GraftTable, startFrom: Option[String] = None) {
  private var last: String = startFrom.getOrElse("0")
  def lastSeen: String = last

  /** Change rows (op, before, after) for commits since the last poll. */
  def poll(): Option[(String, DataFrame)] =
    t.latestDataInstant.filter(_ > last).map { l =>
      val df = t.incrementalCDC(last, Some(l))
      last = l
      (l, df)
    }
}
