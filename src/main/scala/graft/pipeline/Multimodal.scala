package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from a media payload. */
case class MediaMeta(doc_id: Long, byte_len: Long, format: String,
    width: Int, height: Int, channels: Int, checksum: Long)

/**
 * Multimodal column plumbing (SURVEY.md §2.3): media as opaque `binary`
 * columns + typed metadata, with decode running batched per partition.
 * The Spark side — schema, partition-preserving mapPartitions, binary
 * transport — is real; the codec itself is a STUB (no image/audio libs in
 * this container): `fakeDecode` derives deterministic dimensions from the
 * bytes where a real deployment would call the actual decoder.
 */
object Multimodal {

  /** Attach a binary payload column (here: utf-8 bytes of the text stand in
    * for image bytes) plus a claimed format from the source field. */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      concat(lit("img/"), col("source")).as("format"))

  /**
   * STUB decoder — replace the body with the real codec call (the digest
   * stands in for the decoder handle a real codec would hold).
   * Deterministic pure function of the payload so tests are stable, and
   * md5-based so a SQL oracle can state the same values.
   */
  private def fakeDecode(md: java.security.MessageDigest,
      bytes: Array[Byte]): (Int, Int, Int, Long) = {
    md.reset()
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    val crc = java.lang.Long.parseLong(hex.substring(0, 15), 16) // 60 bits, ≥0
    val width = 64 + (crc % 448).toInt
    val height = 64 + ((crc >> 16) % 448).toInt
    (width, height, 3, crc)
  }

  /** Batched per-partition decode: codec initialized once per partition,
    * one iterator pass, no per-row task overhead, executor-local — the
    * shape a real decode (or a Pandas-UDF equivalent in PySpark) needs at
    * scale. */
  def decodeMeta(withPayload: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"), col("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
        // null payloads are undecodable: skipped, as a real codec pipeline
        // routes them to a dead-letter side instead of crashing the job
        it.filter(_._2 != null).map { case (id, bytes, fmt) =>
          val (w, h, c, crc) = fakeDecode(md, bytes)
          MediaMeta(id, bytes.length.toLong, fmt, w, h, c, crc)
        }
      }
  }

  /** Batched per-partition "feature extraction" over media payloads — the
    * embedding-model shape (decode → featurize) with the model STUBBED by
    * a digest: four 16-bit features from the payload's MD5. The Spark
    * plumbing is the real thing a vision/audio encoder needs at scale:
    * per-partition model init, one iterator pass, fixed-dim output columns
    * feeding straight into the ANN/quantize operators. */
  def extractFeatures(withPayload: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
        it.filter(_._2 != null).map { case (id, bytes) =>
          md.reset()
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          def f(i: Int): Int = Integer.parseInt(hex.substring(i * 4, i * 4 + 4), 16)
          (id, f(0), f(1), f(2), f(3))
        }
      }.toDF("doc_id", "f0", "f1", "f2", "f3")
  }

  /** Deterministic frame sampling stub over a "video" payload: pick every
    * `stride`-th byte offset as a frame marker — exercises the explode /
    * one-to-many shape of real frame extraction. */
  def sampleFrames(withPayload: DataFrame, stride: Int = 64): DataFrame =
    withPayload.select(col("doc_id"),
      // zero frames for zero bytes (greatest(len-1, 0) would emit a phantom
      // frame at offset 0 of an empty payload)
      posexplode(when(length(col("payload")) > 0,
        sequence(lit(0), length(col("payload")) - 1, lit(stride)))
        .otherwise(array().cast("array<int>")))
        .as(Seq("frame_idx", "byte_offset")))
}
