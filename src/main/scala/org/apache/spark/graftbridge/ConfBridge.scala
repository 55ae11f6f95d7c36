package org.apache.spark.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/**
 * Bridge to Spark's `private[spark]` [[SerializableConfiguration]]: ship a
 * Hadoop Configuration to executors as a broadcast (the exact idiom every
 * Spark datasource uses for executor-side file reads — e.g.
 * ParquetFileFormat.buildReaderWithPartitionValues). Needed by graft's
 * distributed bootstrap footer scan.
 */
object ConfBridge {
  def broadcast(sc: SparkContext, conf: Configuration): Broadcast[SerializableConfiguration] =
    sc.broadcast(new SerializableConfiguration(conf))

  def value(b: Broadcast[SerializableConfiguration]): Configuration = b.value.value
}
