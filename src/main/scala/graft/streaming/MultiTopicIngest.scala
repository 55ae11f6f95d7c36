package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.table.GraftTable

/**
 * One per-table ingest lane of the multi-topic streamer: a pull source
 * (typically [[KafkaLikeSource.forTable]] over one topic), the target
 * table, and the table's own transform chain / write operation — the
 * re-expression of the reference fork's per-table config object (ref:
 * hudi-flink-datasource/.../streamer/HoodieMuiltiTableFlinkStreamer.java:92
 * "each hudi table must use different config object": per-table kafka
 * config, schema, transform, hudi config inside ONE job; also
 * hudi-utilities/.../HoodieMultiTableDeltaStreamer.java).
 */
case class IngestLane(
    table: GraftTable,
    source: () => Option[(String, DataFrame)],
    transformerSql: Option[String] = None,
    transforms: Seq[DataFrame => DataFrame] = Nil,
    operation: String = "upsert",
    compactEvery: Int = 0,
    cleanRetainVersions: Int = 0,
    archiveKeepLast: Int = 0)

/**
 * The fork's headline feature end-to-end: N topics sunk into N Graft
 * tables by ONE driver loop (ref: HoodieMuiltiTableFlinkStreamer /
 * HoodieFlinkStreamerWithApollo — one Flink job builds a kafka source +
 * hudi sink per config entry; hudi-utilities
 * HoodieMultiTableDeltaStreamer.sync() loops tables in one process).
 *
 * Each lane is a full [[ContinuousIngest]]: its checkpoint rides in its
 * own table's commit metadata (`kafka:<topic>,p:o,...` when the source is
 * topic-labelled), so exactly-once is PER (topic, table) — one lagging
 * topic keeps pulling bounded batches while drained lanes report dry, a
 * crash replays only the unfinished lanes' ranges, and a restarted
 * streamer resumes every lane from its own offsets with no cross-talk.
 *
 * 100 TB posture: the sweep is driver-side orchestration only — each
 * lane's pull is a bounded distributed batch; no lane blocks another
 * beyond batch granularity; table services stay per-lane (scheduled on
 * the loop, executed on each lane's background thread).
 */
class MultiTopicIngest(lanes: Seq[IngestLane]) extends AutoCloseable {
  require(lanes.nonEmpty, "at least one ingest lane")

  private val ingests = lanes.map(l => new ContinuousIngest(l.table, l.source,
    l.transformerSql, l.transforms, l.operation, l.compactEvery,
    l.cleanRetainVersions, l.archiveKeepLast))

  /** The per-lane ingest loops (tests drain their service futures). */
  def lanesRunning: Seq[ContinuousIngest] = ingests

  /** One round-robin sweep: step every lane once. Returns the number of
    * lanes that ingested a batch (0 = all dry). */
  def sweep(): Int = ingests.count(_.step().isDefined)

  /** Sweep until every lane reports dry in the same sweep — the one-shot
    * (non-continuous) mode. Returns total batches ingested. */
  def drainAll(): Long = {
    var total = 0L
    var n = sweep()
    while (n > 0) { total += n; n = sweep() }
    total
  }

  @volatile private var stopped = false
  def stop(): Unit = { stopped = true; ingests.foreach(_.stop()) }

  /** Continuous mode: sweep forever, sleeping `idleMs` when every lane is
    * dry (ref: deltastreamer --continuous min-sync-interval). */
  def run(maxBatches: Long = Long.MaxValue, idleMs: Long = 1000): Long = {
    var total = 0L
    while (!stopped && total < maxBatches) {
      val n = sweep()
      total += n
      if (n == 0 && !stopped) Thread.sleep(idleMs)
    }
    total
  }

  def close(): Unit = { stopped = true; ingests.foreach(_.close()) }
}
