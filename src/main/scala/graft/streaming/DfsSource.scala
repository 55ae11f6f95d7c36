package graft.streaming

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.table.GraftTable

/**
 * DFS file source for the continuous ingest loop (ref: hudi-utilities
 * sources/ParquetDFSSource.java, JsonDFSSource, CsvDFSSource with
 * helpers/DFSPathSelector.java checkpointing): each pull ingests the data
 * files that arrived in the inbox directory since the checkpoint, oldest
 * first.
 *
 * The checkpoint is the LEXICOGRAPHIC MAX of ingested file names —
 * deterministic, restart-stable, and monotone for the timestamp-prefixed
 * names every log shipper (and graft itself) produces. The reference keys
 * on file modification time, which clock skew and copies can reorder; a
 * name watermark cannot move backwards. Files must therefore arrive with
 * monotonically increasing names (document the contract the reference
 * only implies).
 *
 * Cost per pull: ONE directory listing (the reference's DFSPathSelector
 * does the same). At 100 TB inbox scale, keep the inbox pruned — ingested
 * files sort strictly below the watermark, so the caller can archive
 * everything `<= checkpoint` at any time without affecting resume.
 */
class DfsSource(spark: SparkSession, dir: String, format: String = "parquet",
    maxFilesPerPull: Int = Int.MaxValue,
    options: Map[String, String] = Map.empty) {
  require(maxFilesPerPull > 0, "maxFilesPerPull must be positive")
  private val suffix = "." + (if (format == "json") "json"
                              else if (format == "csv") "csv" else "parquet")

  /** Files named strictly above the watermark, ascending. */
  private def newFiles(after: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) return Nil
    Files.list(p).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(suffix) && !n.startsWith(".") && !n.startsWith("_"))
      .filter(_ > after)
      .toSeq.sorted
  }

  /** Pull the next batch after `last`: up to maxFilesPerPull files as one
    * DataFrame, with the new watermark. None = nothing new. */
  def pull(last: Option[String]): Option[(String, DataFrame)] = {
    val names = newFiles(last.getOrElse("")).take(maxFilesPerPull)
    if (names.isEmpty) None
    else Some((names.last,
      spark.read.format(format).options(options)
        .load(names.map(n => s"$dir/$n"): _*)))
  }

  /** Source function bound to the TABLE's recorded checkpoint — each pull
    * resumes from the last commit's watermark, so a restarted (or crashed
    * mid-batch) ingest never double-applies a file: the checkpoint only
    * advances inside the exactly-once commit. */
  def forTable(t: GraftTable): () => Option[(String, DataFrame)] =
    () => pull(ContinuousIngest.lastCheckpoint(t))
}

/** One-shot SQL backfill source (ref: hudi-utilities sources/SqlSource.java
  * — "run once, typically for backfill" semantics): the query result pulls
  * a single time; the recorded checkpoint marks completion, so a crashed or
  * restarted job whose commit already landed never re-ingests. Chain a
  * backfill and a live source by running this loop to [[ContinuousIngest
  * .drain]] first. */
class SqlOnceSource(spark: SparkSession, sql: String,
    marker: String = "sql-backfill-done") {
  def forTable(t: GraftTable): () => Option[(String, DataFrame)] = () =>
    if (ContinuousIngest.lastCheckpoint(t).contains(marker)) None
    else Some((marker, spark.sql(sql)))
}
