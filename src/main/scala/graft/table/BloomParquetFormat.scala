package graft.table

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.sketch.BloomFilter

/**
 * Parquet with key-bloom sidecars built DURING the write — the reference
 * computes bloom filters while writing base files and stores them in the
 * parquet footer (ref: hudi-client-common/.../io/HoodieWriteHandle +
 * HoodieBloomIndex, footer key `org.apache.hudi.bloomfilter`); graft keeps
 * the same while-writing discipline but emits a `<file>.parquet.bloom`
 * sidecar next to each data file instead of a footer blob.
 *
 * Each [[OutputWriter]] folds the key column of every row it writes into a
 * local [[BloomFilter]] and flushes the sidecar on close, INTO THE TASK
 * ATTEMPT DIRECTORY — so the commit protocol moves data file and sidecar
 * together, speculative/aborted attempts discard both, and no second Spark
 * job ever re-reads freshly written data (the round-5 bench regression).
 *
 * Options:
 *  - `graft.bloom.expected` — expected keys per file (sizes the filter;
 *    default [[BloomParquetFormat.DefaultExpected]]).
 */
class BloomParquetFormat extends ParquetFileFormat {
  override def shortName(): String = "bloom-parquet"
  override def toString: String = "BloomParquet"

  override def prepareWrite(sparkSession: SparkSession, job: Job,
      options: Map[String, String], dataSchema: StructType): OutputWriterFactory = {
    val inner = super.prepareWrite(sparkSession, job, options, dataSchema)
    val expected = options.get("graft.bloom.expected").map(_.toLong)
      .getOrElse(BloomParquetFormat.DefaultExpected)
    new BloomOutputWriterFactory(inner, expected)
  }
}

object BloomParquetFormat {
  val DefaultExpected = 100000L
  /** `df.write.format(name)` resolves a FileFormat by class name. */
  val name: String = classOf[BloomParquetFormat].getName
}

private class BloomOutputWriterFactory(inner: OutputWriterFactory, expected: Long)
    extends OutputWriterFactory {
  override def getFileExtension(context: TaskAttemptContext): String =
    inner.getFileExtension(context)

  override def newInstance(path: String, dataSchema: StructType,
      context: TaskAttemptContext): OutputWriter = {
    val w = inner.newInstance(path, dataSchema, context)
    // partition columns (_gp/_gf) are stripped from dataSchema by the
    // planner, so the ordinal is resolved against what actually arrives
    val keyOrdinal = dataSchema.fieldIndex(GraftTable.KEY)
    new OutputWriter {
      private val bloom = BloomFilter.create(math.max(64L, expected), KeyBloom.Fpp)
      override def write(row: InternalRow): Unit = {
        // putBinary(utf8 bytes) == putString(String): BloomFilterBase
        // .putString hashes Utils.getBytesFromUTF8String — so skipping the
        // per-row UTF8String→String→bytes round trip changes nothing in
        // the filter while cutting the fold cost on the write hot path
        if (!row.isNullAt(keyOrdinal))
          bloom.putBinary(row.getUTF8String(keyOrdinal).getBytes)
        w.write(row)
      }
      override def close(): Unit = {
        w.close()
        val side = new HPath(path + ".bloom")
        val out = side.getFileSystem(context.getConfiguration).create(side, true)
        try bloom.writeTo(out) finally out.close()
      }
      override def path(): String = w.path()
    }
  }
}
