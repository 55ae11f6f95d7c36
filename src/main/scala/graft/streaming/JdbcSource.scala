package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max}
import org.apache.spark.sql.types._
import graft.table.GraftTable

/**
 * JDBC incremental source for the continuous ingest loop (ref:
 * hudi-utilities sources/JdbcSource.java:57 — the classic database
 * on-ramp): each pull fetches the rows whose checkpoint column moved past
 * the last recorded checkpoint, bounded and ordered, with the checkpoint
 * riding in the commit metadata exactly like the DFS source's watermark.
 *
 *  - `ckptCol` must be STRICTLY increasing (an identity/sequence column or
 *    a monotone updated-at): resume is `WHERE ckptCol > last`, so a batch
 *    boundary splitting equal values would skip rows — same contract as
 *    the reference's `incremental.column`.
 *  - Each pull is ONE bounded remote query (`ORDER BY ckptCol FETCH FIRST
 *    n ROWS ONLY` — ANSI; override `fetchClause` for LIMIT dialects). The
 *    batch is pinned with an eager localCheckpoint so computing the new
 *    watermark and writing the rows read the database ONCE — rows arriving
 *    mid-cycle land in the next pull, never half in this one.
 *  - No `ckptCol` = FULL-FETCH fallback (ref: JdbcSource's non-incremental
 *    mode): every pull returns the whole table with a constant checkpoint;
 *    pair it with upsert and drive via `step()`/`run(maxCycles)` — it
 *    never reports dry.
 *
 * 100 TB posture: the database side does the filtering and ordering on its
 * own index; Spark sees at most `maxRowsPerPull` rows per cycle and the
 * table never re-scans. Checkpoints are namespaced (`jdbc:` prefix) so
 * chaining with a SQL backfill or DFS inbox source is safe.
 */
class JdbcSource(spark: SparkSession, url: String, table: String,
    ckptCol: Option[String],
    maxRowsPerPull: Long = Long.MaxValue,
    options: Map[String, String] = Map.empty,
    fetchClause: Long => String = n => s"FETCH FIRST $n ROWS ONLY") {
  require(maxRowsPerPull > 0, "maxRowsPerPull must be positive")

  private def reader = spark.read.format("jdbc")
    .option("url", url).options(options)

  /** The checkpoint column's type decides literal quoting in the pushed
    * predicate (numeric raw, anything else single-quoted). */
  private lazy val ckptType: DataType = {
    val c = ckptCol.get
    reader.option("dbtable", table).load().schema
      .find(_.name.equalsIgnoreCase(c))
      .getOrElse(throw new IllegalArgumentException(
        s"checkpoint column $c not found in $table"))
      .dataType
  }

  private def literal(v: String): String = ckptType match {
    case _: NumericType => v
    case _ => "'" + v.replace("'", "''") + "'"
  }

  /** Pull the next batch after `last`. None = nothing new (incremental
    * mode only; full fetch always returns the table). */
  def pull(last: Option[String]): Option[(String, DataFrame)] = ckptCol match {
    case None =>
      Some((JdbcSource.FullFetchCheckpoint,
        reader.option("dbtable", table).load()))
    case Some(c) =>
      val pred = last.map(v => s" WHERE $c > ${literal(v)}").getOrElse("")
      val bound = if (maxRowsPerPull == Long.MaxValue) ""
                  else " " + fetchClause(maxRowsPerPull)
      val q = s"SELECT * FROM $table$pred ORDER BY $c$bound"
      // eager pin: ONE remote read serves both the new-watermark agg and
      // the table write; without it the two executions could see different
      // rows and ship data beyond the recorded checkpoint
      val batch = reader.option("query", q).load()
        .localCheckpoint(true)
      val newCkpt = batch.agg(max(col(c)).cast("string")).collect()(0)
      if (newCkpt.isNullAt(0)) { batch.unpersist(); None }
      else Some((newCkpt.getString(0), batch))
  }

  /** Source function bound to the table's recorded `jdbc:` checkpoint —
    * restart (even after the checkpointed commits were ARCHIVED) resumes
    * from the last committed watermark; a crashed mid-batch ingest never
    * double-applies because the checkpoint only advances inside the
    * exactly-once commit. */
  def forTable(t: GraftTable, initial: Option[String] = None)
      : () => Option[(String, DataFrame)] =
    () => pull(ContinuousIngest.lastCheckpointFor(t, JdbcSource.Kind)
        .orElse(initial))
      .map { case (ck, df) => (s"${JdbcSource.Kind}:$ck", df) }
}

object JdbcSource {
  private[streaming] val Kind = "jdbc"
  private[streaming] val FullFetchCheckpoint = "full-fetch"
}
