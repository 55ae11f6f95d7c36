package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import graft.table.GraftTable

/**
 * Offset-range puller: the broker-shaped half of a Kafka-style source
 * (ref: hudi-utilities sources/JsonKafkaSource.java:52 +
 * KafkaOffsetGen.java — the reference's primary streaming on-ramp).
 * Real brokers are an external system and stay out of this build; anything
 * that can report per-partition earliest/latest offsets and serve a batch
 * of offset ranges plugs in here — a thin wrapper over a Kafka consumer
 * in a real deployment, an in-memory fake in tests.
 *
 * Offsets follow Kafka semantics: per-partition, monotone, `latest` is the
 * offset AFTER the newest record, a committed offset is the next position
 * to read. Partitions may be ADDED between pulls (Kafka partitions only
 * grow); `earliest` may advance past a committed offset (retention).
 */
trait OffsetRangePuller {
  /** First available offset per partition (advances under retention). */
  def earliestOffsets(): Map[Int, Long]

  /** End offset per partition (offset after the newest record). New
    * partitions appear here first. */
  def latestOffsets(): Map[Int, Long]

  /** The records in `[from, until)` per partition, as one batch. A real
    * implementation returns a DISTRIBUTED frame (one Spark task per
    * offset range, the kafka connector's shape); correctness only needs
    * the rows. */
  def fetch(ranges: Map[Int, (Long, Long)]): DataFrame
}

/**
 * Kafka-shaped incremental source for the continuous ingest loop (ref:
 * hudi-utilities KafkaOffsetGen.java getNextOffsetRanges +
 * CheckpointUtils.computeOffsetRanges): each pull resumes from the
 * offset map recorded in the table's commit metadata (`kafka:`-namespaced
 * — serialized `p:o,p:o` sorted by partition), takes at most
 * `maxEventsPerPull` records distributed proportionally to per-partition
 * lag, and hands the ingest loop the batch plus the advanced offset map.
 *
 * Exactly-once is the ingest loop's usual contract: the offset map only
 * advances inside the commit that carries the rows, so a crash mid-batch
 * replays the same ranges. Partition-count growth is handled naturally —
 * a partition absent from the committed map starts at its earliest
 * offset; committed offsets for partitions the broker stopped reporting
 * are carried forward untouched (never silently dropped).
 *
 * 100 TB posture: each pull is bounded by `maxEventsPerPull`; nothing
 * rescans consumed ranges; the offset map is O(partitions) metadata
 * riding in the commit, exactly like the reference's CHECKPOINT_KEY.
 */
class KafkaLikeSource(puller: OffsetRangePuller,
    maxEventsPerPull: Long = Long.MaxValue,
    topic: Option[String] = None) {
  require(maxEventsPerPull > 0, "maxEventsPerPull must be positive")
  topic.foreach(t => require(t.nonEmpty && !t.contains(',') && !t.contains(':'),
    s"topic '$t' must be non-empty without ',' or ':' (kafka topic charset)"))

  /** Next offset ranges after `committed` (ref: KafkaOffsetGen
    * .getNextOffsetRanges): from = max(committed, earliest) — retention
    * may have advanced past the commit — capped proportionally to lag. */
  private[streaming] def nextRanges(
      committed: Map[Int, Long]): Map[Int, (Long, Long)] = {
    val earliest = puller.earliestOffsets()
    val latest = puller.latestOffsets()
    val from = latest.map { case (p, _) =>
      p -> math.max(committed.getOrElse(p, 0L), earliest.getOrElse(p, 0L))
    }
    val lag = latest.map { case (p, l) => p -> math.max(0L, l - from(p)) }
    val total = lag.values.sum
    if (total == 0) return Map.empty
    val take = mutable.Map[Int, Long]()
    if (total <= maxEventsPerPull) lag.foreach { case (p, g) => take(p) = g }
    else {
      // proportional floor allocation, remainder round-robin by partition
      // id — deterministic, and no partition starves while another lags
      var rem = maxEventsPerPull
      val parts = lag.keys.toSeq.sorted
      parts.foreach { p =>
        // BigInt: lag * maxEventsPerPull overflows Long when both are
        // large (~1e12 each); the quotient itself always fits (≤ lag)
        val t = (BigInt(lag(p)) * maxEventsPerPull / total).toLong
        take(p) = t; rem -= t
      }
      for (p <- parts if rem > 0 && take(p) < lag(p)) { take(p) += 1; rem -= 1 }
    }
    take.toMap.collect { case (p, t) if t > 0 => p -> (from(p), from(p) + t) }
  }

  /** Pull the next bounded batch. None = caught up (dry). */
  def pull(committed: Map[Int, Long]): Option[(Map[Int, Long], DataFrame)] = {
    val ranges = nextRanges(committed)
    if (ranges.isEmpty) None
    else {
      // committed offsets for partitions the broker no longer reports are
      // carried forward: dropping them would re-read if the partition
      // reappears
      val advanced = committed ++ ranges.map { case (p, (_, u)) => p -> u }
      Some((advanced, puller.fetch(ranges)))
    }
  }

  /** Source function bound to the table's recorded `kafka:` offset map —
    * the shape [[ContinuousIngest]] consumes. Restart (even after the
    * checkpointed commits were archived) resumes from the committed map.
    *
    * With a `topic` set, the checkpoint value is `topic,p:o,p:o` — the
    * reference's exact CHECKPOINT_KEY shape (ref: hudi-utilities
    * KafkaOffsetGen.CheckpointUtils.offsetsToStr) — and only values for
    * THIS topic are read back, so several topics can feed one table (the
    * multi-topic streamer) without clobbering each other's offsets. */
  def forTable(t: GraftTable, initial: Option[String] = None)
      : () => Option[(String, DataFrame)] =
    () => {
      val committed = ContinuousIngest.lastCheckpointFor(t,
          KafkaLikeSource.Kind, v => KafkaLikeSource.topicOf(v) == topic)
        .orElse(initial.filter(v => KafkaLikeSource.topicOf(v) == topic))
        .map(v => KafkaLikeSource.decodeOffsets(
          topic.fold(v)(tp => v.drop(tp.length + 1))))
        .getOrElse(Map.empty)
      pull(committed).map { case (m, df) =>
        val enc = KafkaLikeSource.encodeOffsets(m)
        val value = topic.fold(enc)(tp => s"$tp,$enc")
        (s"${KafkaLikeSource.Kind}:$value", df)
      }
    }
}

object KafkaLikeSource {
  private[streaming] val Kind = "kafka"

  /** `p:o,p:o` sorted by partition id — stable, diffable in commit
    * metadata (ref: KafkaOffsetGen's `topic,p:o,p:o` checkpoint string;
    * the topic prefix is dropped — one source instance serves one
    * logical topic). */
  def encodeOffsets(m: Map[Int, Long]): String =
    m.toSeq.sortBy(_._1).map { case (p, o) => s"$p:$o" }.mkString(",")

  def decodeOffsets(s: String): Map[Int, Long] =
    s.split(',').filter(_.nonEmpty).map { t =>
      val i = t.lastIndexOf(':')
      require(i > 0, s"not a kafka offset map entry: '$t' (expected p:o)")
      t.take(i).toInt -> t.drop(i + 1).toLong
    }.toMap

  /** The topic label of a checkpoint value: Some(topic) for the
    * `topic,p:o,...` form, None for the bare `p:o,...` (topic-less) form.
    * A topic never contains ':', so the first segment tells them apart. */
  private[streaming] def topicOf(value: String): Option[String] = {
    val head = value.takeWhile(_ != ',')
    if (head.contains(':')) None else Some(head).filter(_.nonEmpty)
  }
}
