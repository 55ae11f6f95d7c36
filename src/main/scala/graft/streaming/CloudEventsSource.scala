package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.table.GraftTable

/**
 * At-least-once message queue — the SQS protocol shape (ref:
 * hudi-utilities sources/helpers/CloudObjectsSelector.java: receive up to
 * N messages, delete by receipt handle after the batch is durably
 * processed). Real queue services stay excluded as external systems; a
 * thin SQS/PubSub client wrapper plugs in here, an in-memory fake in
 * tests. Un-acked messages are REDELIVERED on a later receive (visibility
 * timeout), which is exactly what makes the contract safe: crash before
 * ack → replay, and the events table's upsert key dedups the replay.
 */
trait MessageQueue {
  /** Up to `max` messages as (receiptHandle, body). */
  def receive(max: Int): Seq[(String, String)]

  /** Delete processed messages by receipt handle. */
  def ack(receipts: Seq[String]): Unit
}

/**
 * Stage 1 of the cloud-events ingest pattern (ref: hudi-utilities
 * sources/S3EventsSource.java:34 + helpers/S3EventsMetaSelector.java):
 * drain object-created NOTIFICATIONS from a queue into an EVENTS table —
 * at 100 TB the notification queue replaces directory listing entirely
 * (the reference built this because listing a petabyte bucket per pull is
 * the bottleneck; the DFS-inbox source's listing watermark cannot scale
 * past directories).
 *
 * Each message body is a storage event notification: `{"Records": [{
 * "eventName": "ObjectCreated:Put", "eventTime": ..., "s3": {"bucket":
 * {"name": ...}, "object": {"key": ..., "size": ...}}}]}` — the public
 * S3-notification layout the reference parses. Non-ObjectCreated records
 * are dropped (the reference's filter). Parsing is one distributed
 * from_json projection over the message bodies.
 *
 * Exactly-once composition (ref: S3EventsSource.onCommit deletes
 * processed messages AFTER the commit): wire [[pull]] as a
 * [[ContinuousIngest]] source with [[ackPending]] as its `onCommit` hook
 * and `upsert` onto a table keyed (bucket, key) — the ack fires only
 * after the commit, and a crash-replayed redelivery upserts onto the same
 * key, so the events table converges exactly-once without queue-side
 * transactions.
 */
class QueueEventsSource(spark: SparkSession, queue: MessageQueue,
    maxMessagesPerPull: Int = 100) {
  require(maxMessagesPerPull > 0, "maxMessagesPerPull must be positive")

  /** Receipts of the last pulled batch, awaiting the post-commit ack. */
  @volatile private var pending: Seq[String] = Nil

  private val eventSchema = StructType.fromDDL(
    "Records ARRAY<STRUCT<eventName: STRING, eventTime: STRING, " +
      "s3: STRUCT<bucket: STRUCT<name: STRING>, " +
      "object: STRUCT<key: STRING, size: BIGINT>>>>")

  /** One bounded drain: (checkpoint, events frame) or None when the queue
    * is empty. Rows: (bucket, key, size, event_time, event_name). The
    * checkpoint is informational (`queue:<n>` message count) — resume
    * state lives in the QUEUE (un-acked messages redeliver), the
    * reference's exact posture. */
  def pull(): Option[(String, DataFrame)] = {
    val msgs = queue.receive(maxMessagesPerPull)
    if (msgs.isEmpty) return None
    pending = msgs.map(_._1)
    import spark.implicits._
    val parsed = msgs.map(_._2).toDF("body")
      .select(from_json(col("body"), eventSchema,
        Map("mode" -> "FAILFAST")).as("e"))
      .select(explode(col("e.Records")).as("r"))
      .filter(col("r.eventName").startsWith("ObjectCreated"))
      .select(
        col("r.s3.bucket.name").as("bucket"),
        col("r.s3.object.key").as("key"),
        col("r.s3.object.size").as("size"),
        col("r.eventTime").as("event_time"),
        col("r.eventName").as("event_name"))
    Some((s"queue:${msgs.size}", parsed))
  }

  /** Post-commit acknowledgement: delete the last batch's messages (wire
    * as ContinuousIngest's onCommit). */
  def ackPending(checkpoint: String): Unit = {
    val p = pending
    pending = Nil
    if (p.nonEmpty) queue.ack(p)
  }

  /** The stage-1 ingest loop source + ack hook, pre-wired. */
  def forIngest: (() => Option[(String, DataFrame)], String => Unit) =
    (() => pull(), ackPending)
}

/**
 * Stage 2 (ref: hudi-utilities sources/S3EventsHoodieIncrSource.java:41):
 * incrementally read the EVENTS table, resolve each event to its object
 * path, filter, and load the referenced files' CONTENT as the batch —
 * never listing storage. Filters mirror the reference's config: key
 * prefix to select, ignore-prefix and ignore-substring to drop (the
 * reference uses these to skip checkpoint/temp objects), and an optional
 * existence check before reading (objects may have been deleted since
 * the notification).
 *
 * The incremental cursor rides in the TARGET table's commit metadata
 * ([[CommitFeed.forTable]]'s `incr:` checkpoint), so restarts resume
 * exactly and a crash replays only the unfinished window. The file list
 * of one window is collected to the driver (bounded by the window's
 * event count — metadata, not data); the content read is one distributed
 * format load over those paths.
 */
object CloudObjectsLoad {

  /** Existence check through the Hadoop FileSystem of the path's SCHEME —
    * the flag's real use case is remote prefixes (s3a://, hdfs://), where
    * a java.nio check would report every object missing and silently
    * filter all windows to empty (ingest stalls instead of failing
    * loudly). Resolving via Path.getFileSystem handles local and remote
    * prefixes uniformly, exactly as spark.read would resolve the load. */
  private[streaming] def pathExists(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Build the object paths of one events window, filtered like the
    * reference (S3_KEY_PREFIX / S3_IGNORE_KEY_PREFIX /
    * S3_IGNORE_KEY_SUBSTRING), as `<fsPrefix><bucket>/<key>`. */
  private[streaming] def objectPaths(events: DataFrame, fsPrefix: String,
      keyPrefix: Option[String], ignoreKeyPrefix: Option[String],
      ignoreKeySubstring: Option[String]): Seq[String] = {
    val filtered = events
      .filter(keyPrefix.map(p => col("key").startsWith(p)).getOrElse(lit(true)))
      .filter(ignoreKeyPrefix.map(p => !col("key").startsWith(p)).getOrElse(lit(true)))
      .filter(ignoreKeySubstring.map(s => !col("key").contains(s)).getOrElse(lit(true)))
      .select(concat(lit(fsPrefix), col("bucket"), lit("/"), col("key")))
      .distinct()
    filtered.collect().map(_.getString(0)).toSeq
  }

  /** A ContinuousIngest source: each pull is the next events window's
    * referenced objects, loaded via `format`. `fsPrefix` maps bucket/key
    * to a filesystem path (the reference's S3_FS_PREFIX, e.g. "s3a://" —
    * here typically a local test root ending in "/"). `checkExists`
    * drops paths whose object vanished (ref ENABLE_EXISTS_CHECK). */
  def fromEventsTable(spark: SparkSession, events: GraftTable,
      target: GraftTable, format: String = "parquet",
      fsPrefix: String = "", keyPrefix: Option[String] = None,
      ignoreKeyPrefix: Option[String] = None,
      ignoreKeySubstring: Option[String] = None,
      checkExists: Boolean = false,
      maxInstantsPerPull: Int = 1): () => Option[(String, DataFrame)] =
    () => {
      // resume from the TARGET's committed incr: cursor, then poll bounded
      // windows forward, folding all-filtered windows into the next
      // window's checkpoint (their re-scan on replay filters to nothing,
      // so folding them loses no data). A trailing all-filtered window
      // stays uncommitted and is re-filtered next pull — bounded work.
      val committed = ContinuousIngest.lastCheckpointFor(target, CommitFeed.Kind)
      val feed = new CommitFeed(events, startFrom = committed,
        maxInstantsPerPoll = maxInstantsPerPull)
      @annotation.tailrec
      def next(): Option[(String, DataFrame)] = feed.poll() match {
        case None => None
        case Some((ck, window)) =>
          val paths = objectPaths(window, fsPrefix, keyPrefix,
            ignoreKeyPrefix, ignoreKeySubstring)
            .filter(p => !checkExists || pathExists(spark, p))
          if (paths.isEmpty) next()
          else Some((s"${CommitFeed.Kind}:$ck",
            spark.read.format(format).load(paths: _*)))
      }
      next()
    }
}
