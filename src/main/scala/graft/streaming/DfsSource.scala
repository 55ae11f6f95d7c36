package graft.streaming

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using
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
 * Checkpoints are NAMESPACED per source kind (`dfs:<name>` in the commit
 * metadata): a checkpoint written by a different source — e.g. a
 * [[SqlOnceSource]] backfill marker — is never mistaken for a file-name
 * watermark, so chaining backfill → live ingest is safe in either order.
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
  // parquet/json/csv/orc/avro mirror the reference's DFS source family
  // (ParquetDFSSource, JsonDFSSource, CsvDFSSource, ORCDFSSource,
  // AvroDFSSource); avro reads through the core-avro container reader
  // (graft.sources.AvroFiles) since no spark-avro module ships here
  private val suffix = "." + (if (Set("json", "csv", "orc", "avro")(format)) format
                              else "parquet")

  /** Files named strictly above the watermark, ascending. The directory
    * stream is closed eagerly — a leaked fd per poll would exhaust the
    * process in a long-running ingest loop. */
  private def newFiles(after: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) return Nil
    Using.resource(Files.list(p)) { st =>
      st.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(suffix) && !n.startsWith(".") && !n.startsWith("_"))
        .filter(_ > after)
        .toSeq.sorted
    }
  }

  /** Pull the next batch after `last`: up to maxFilesPerPull files as one
    * DataFrame, with the new watermark. None = nothing new. */
  def pull(last: Option[String]): Option[(String, DataFrame)] = {
    val names = newFiles(last.getOrElse("")).take(maxFilesPerPull)
    if (names.isEmpty) None
    else {
      val paths = names.map(n => s"$dir/$n")
      val df =
        if (format == "avro") graft.sources.AvroFiles.read(spark, paths)
        else spark.read.format(format).options(options).load(paths: _*)
      Some((names.last, df))
    }
  }

  /** Source function bound to the TABLE's recorded checkpoint — each pull
    * resumes from the last commit's watermark, so a restarted (or crashed
    * mid-batch) ingest never double-applies a file: the checkpoint only
    * advances inside the exactly-once commit. `initial` seeds the very
    * first pull of a table with no `dfs:` checkpoint of its own (ref:
    * DeltaStreamer --initial-checkpoint-provider; pair with
    * [[ContinuousIngest.initialCheckpointFromTimeline]]). */
  def forTable(t: GraftTable, initial: Option[String] = None)
      : () => Option[(String, DataFrame)] =
    () => pull(ContinuousIngest.lastCheckpointFor(t, DfsSource.Kind)
        .orElse(initial))
      .map { case (ck, df) => (s"${DfsSource.Kind}:$ck", df) }
}

object DfsSource { private[streaming] val Kind = "dfs" }

/** One-shot SQL backfill source (ref: hudi-utilities sources/SqlSource.java
  * — "run once, typically for backfill" semantics): the query result pulls
  * a single time; the recorded checkpoint marks completion, so a crashed or
  * restarted job whose commit already landed never re-ingests. The marker
  * lives in the `sql-once:` checkpoint namespace and completion checks the
  * WHOLE commit history, so later live-source commits (with their own
  * checkpoints) never resurrect the backfill. */
class SqlOnceSource(spark: SparkSession, sql: String,
    marker: String = "sql-backfill-done") {
  def forTable(t: GraftTable): () => Option[(String, DataFrame)] = () =>
    if (ContinuousIngest.lastCheckpointFor(t, SqlOnceSource.Kind).contains(marker)) None
    else Some((s"${SqlOnceSource.Kind}:$marker", spark.sql(sql)))
}

object SqlOnceSource { private[streaming] val Kind = "sql-once" }
