package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Table type, mirroring the reference's COPY_ON_WRITE / MERGE_ON_READ
  * (ref: hudi-common/src/main/java/org/apache/hudi/common/model/HoodieTableType.java). */
sealed trait TableType { def name: String }
case object CopyOnWrite extends TableType { val name = "cow" }
case object MergeOnRead extends TableType { val name = "mor" }
object TableType {
  def of(s: String): TableType = s match {
    case "cow" => CopyOnWrite
    case "mor" => MergeOnRead
    case other => throw new IllegalArgumentException(s"unknown table type $other")
  }
}

/** Partitioning spec — the reference's key generators
  * (ref: hudi-common/src/main/java/org/apache/hudi/keygen package):
  * non-partitioned, simple/complex column, timestamp-based. */
sealed trait PartitionSpec {
  /** Column expression producing the hive-style partition path string. */
  def pathExpr: Column
  def columns: Seq[String]
}
case object NonPartitioned extends PartitionSpec {
  val pathExpr: Column = lit("")
  val columns: Seq[String] = Nil
}
/** A null partition value maps to hive's default-partition segment. A raw
  * null path would poison tagging: the (KEY, PART) equi-join never matches
  * null, so every re-upsert of such a record would DUPLICATE it (and
  * concat_ws would silently drop the segment, colliding namespaces). */
private[graft] object PartitionSpec {
  val NullSegment = "__HIVE_DEFAULT_PARTITION__"
  def segment(c: Column): Column = coalesce(c.cast("string"), lit(NullSegment))
  /** Percent-encode a path segment (ref: hoodie.datasource.write
    * .partitionpath.urlencode + PartitionPathEncodeUtils.escapePathName):
    * url_encode then `+`→`%20` gives URI-style encoding, so `/`, `=`, and
    * whitespace can never corrupt the directory layout or the `col=val`
    * split. The null sentinel's chars are all unreserved — unchanged. */
  def encoded(c: Column): Column =
    regexp_replace(url_encode(segment(c)), "\\+", "%20")
  def decodeSegment(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")
}
/** Hive-style `col=val/col2=val2` from one or more columns. `hiveStyle =
  * false` emits bare `val/val2` segments (ref: hoodie.datasource.write
  * .hive_style_partitioning — the reference DEFAULTS to bare values; graft
  * keeps hive-style as the default since pruning tools expect it);
  * `urlEncode` percent-encodes each value (ref: ...partitionpath.urlencode). */
case class PartitionByColumns(cols: Seq[String], hiveStyle: Boolean = true,
    urlEncode: Boolean = false) extends PartitionSpec {
  private def value(c: String): Column =
    if (urlEncode) PartitionSpec.encoded(col(c)) else PartitionSpec.segment(col(c))
  def pathExpr: Column =
    concat_ws("/", cols.map(c =>
      if (hiveStyle) concat(lit(c + "="), value(c)) else value(c)): _*)
  def columns: Seq[String] = cols
}
/** Timestamp-based keygen: partition by a formatted time column,
  * e.g. `dt=2024-01-30` (or bare `2024-01-30` when hiveStyle = false).
  * `inputType` mirrors the reference's TimestampType (ref:
  * hudi keygen/TimestampBasedAvroKeyGenerator.java, option
  * `hoodie.deltastreamer.keygen.timebased.timestamp.type`):
  * `timestamp` (native timestamp/date column), `epoch_millis`
  * (EPOCHMILLISECONDS long), `epoch_seconds` (UNIX_TIMESTAMP long), or
  * `date_string` (DATE_STRING parsed with `inputFormat`). */
case class PartitionByTimestamp(tsCol: String, format: String = "yyyy-MM-dd",
    hiveStyle: Boolean = true, inputType: String = "timestamp",
    inputFormat: String = "yyyy-MM-dd") extends PartitionSpec {
  require(Set("timestamp", "epoch_millis", "epoch_seconds", "date_string")(inputType),
    s"unknown timestamp input type '$inputType' " +
      "(timestamp | epoch_millis | epoch_seconds | date_string)")
  def pathExpr: Column = {
    val ts = inputType match {
      case "timestamp" => col(tsCol)
      case "epoch_millis" => timestamp_millis(col(tsCol))
      case "epoch_seconds" => timestamp_seconds(col(tsCol))
      case "date_string" => to_timestamp(col(tsCol), inputFormat)
    }
    val v = PartitionSpec.segment(date_format(ts, format))
    if (hiveStyle) concat(lit("dt="), v) else v
  }
  def columns: Seq[String] = Seq(tsCol)
}
/** One segment of a mixed partition path: `kind` is `simple` (value as-is)
  * or `timestamp` (formatted via `format`). */
case class PartitionSegment(col: String, kind: String = "simple",
    format: String = "yyyy-MM-dd") {
  require(Set("simple", "timestamp")(kind),
    s"unknown partition segment kind '$kind' (simple | timestamp)")
}
/** CustomKeyGenerator-style MIXED partitioning (ref: hudi-client-common
  * .../keygen/CustomKeyGenerator.java — `hoodie.datasource.write
  * .partitionpath.field = "region:simple,ts:timestamp"`): each segment is
  * independently simple or timestamp-formatted, composed in order. */
case class PartitionByMixed(segs: Seq[PartitionSegment],
    hiveStyle: Boolean = true) extends PartitionSpec {
  def pathExpr: Column =
    concat_ws("/", segs.map { sg =>
      val v = sg.kind match {
        case "simple" => PartitionSpec.segment(col(sg.col))
        case "timestamp" =>
          PartitionSpec.segment(date_format(col(sg.col), sg.format))
      }
      if (hiveStyle) concat(lit(sg.col + "="), v) else v
    }: _*)
  def columns: Seq[String] = segs.map(_.col)
}

/** Upsert index strategy (ref: hudi-client-common .../index/HoodieIndex.java):
  *  - [[StatsIndex]] ~ SIMPLE/BLOOM: scan the key column of candidate base
  *    files (pruned by per-file key min/max recorded at commit time) and join
  *    against the incoming batch. The existing table is never reshuffled.
  *  - [[BucketIndex]] ~ BUCKET: fileId = hash(key) % buckets, per partition;
  *    tagging is a pure expression, no lookup at all — the 100 TB path.
  */
sealed trait IndexType
case object StatsIndex extends IndexType
case class BucketIndex(buckets: Int) extends IndexType

/** Cleaning policy (ref: hudi-common .../model/HoodieCleaningPolicy.java,
  * planned by CleanPlanner.java:131,273):
  *  - [[KeepLatestFileVersions]]: per file group keep the latest N base
  *    versions.
  *  - [[KeepLatestCommits]]: keep every file needed to read the table as of
  *    any of the last N data commits, plus ONE version before that window
  *    (the reference's slack for the longest-running query).
  *  - [[KeepLatestByHours]]: same, with the window defined by wall-clock
  *    hours instead of a commit count.
  * Savepointed instants stay readable under the commit/hours policies. */
sealed trait CleanPolicy
case class KeepLatestFileVersions(retainVersions: Int = 1) extends CleanPolicy
case class KeepLatestCommits(retainCommits: Int) extends CleanPolicy
case class KeepLatestByHours(hours: Double) extends CleanPolicy

/** Compaction target selection (ref: hudi-client-common .../compact/strategy/
  * LogFileSizeBasedCompactionStrategy.java, BoundedIOCompactionStrategy.java):
  *  - [[CompactAll]]: every log-bearing group (the reference's UnBounded).
  *  - [[LogSizeBounded]]: only groups whose total log bytes reach
  *    `minLogBytes`, largest log debt first, stopping when the estimated IO
  *    (read base + logs, write new base) exceeds `maxIOBytes`.
  *  - [[PartitionBounded]]: only the `maxPartitions` LATEST partitions
  *    (descending path order — ref: DayBasedCompactionStrategy +
  *    hoodie.compaction.daybased.target.partitions): on a time-partitioned
  *    100 TB table, compaction debt concentrates in the partitions still
  *    being written; old partitions stop paying rewrite IO. */
sealed trait CompactionStrategy
case object CompactAll extends CompactionStrategy
case class LogSizeBounded(minLogBytes: Long = 0,
    maxIOBytes: Long = Long.MaxValue) extends CompactionStrategy
case class PartitionBounded(maxPartitions: Int) extends CompactionStrategy

/** Clustering target selection (ref: hudi-client-common .../cluster/strategy/
  * SparkSizeBasedClusteringPlanStrategy.java — `small.file.limit` +
  * `max.bytes.per.group`): [[ClusterAll]] re-lays-out every live slice;
  * [[SmallFileBounded]] consolidates only groups whose total bytes are under
  * `smallFileBytes`, smallest first, stopping when the estimated IO
  * (read + rewrite ≈ 2× the group) exceeds `maxIOBytes` — at 100 TB you
  * cluster the small-file debt each cycle, not the whole table. */
sealed trait ClusteringStrategy
case object ClusterAll extends ClusteringStrategy
case class SmallFileBounded(smallFileBytes: Long,
    maxIOBytes: Long = Long.MaxValue) extends ClusteringStrategy

/** Merge payload semantics across commits (ref: hudi
  * hoodie.datasource.write.payload.class):
  *  - [[OverwriteLatest]] ~ OverwriteWithLatestAvroPayload: ARRIVAL order —
  *    the row from the newest commit wins (default).
  *  - [[EventTimeOrdered]] ~ DefaultHoodieRecordPayload: EVENT order — the
  *    row with the highest precombine value wins, so a late-arriving STALE
  *    update (lower ordering value than the stored row) is ignored; ties go
  *    to the newer commit. Applies to the standard upsert/delete/snapshot
  *    merge; the partial/global upsert variants keep arrival order (as the
  *    reference restricts payload support). */
sealed trait MergePayload { def name: String }
case object OverwriteLatest extends MergePayload { val name = "overwrite_latest" }
case object EventTimeOrdered extends MergePayload { val name = "event_time" }
/** ~ PartialUpdateAvroPayload / OverwriteNonDefaultsWithLatestAvroPayload:
  * table-level partial-update semantics — every `upsert` (typed, write
  * door, SQL UPDATE, streaming sink) treats a NULL/omitted column as "not
  * provided" and inherits the matched row's value; merged rows are written
  * COMPLETE, so snapshot/compaction stay whole-row latest-wins. Arrival
  * order across commits (as the reference restricts payload support). */
case object PartialUpdate extends MergePayload { val name = "partial_update" }
object MergePayload {
  def of(s: String): MergePayload = s match {
    case "overwrite_latest" => OverwriteLatest
    case "event_time" => EventTimeOrdered
    case "partial_update" => PartialUpdate
    case other => throw new IllegalArgumentException(
      s"unknown merge payload $other " +
        "(overwrite_latest | event_time | partial_update)")
  }
}

/**
 * Graft table configuration, persisted as `<base>/.graft/table.json`.
 *
 * @param keyFields       record key column(s) (complex key when >1)
 * @param precombineField ordering field: within one batch the record with the
 *                        highest value wins (ref: HoodieRecordPayload
 *                        preCombine semantics)
 * @param targetFileSizeRows target rows per base file; inserts bin-pack into
 *                        under-sized file groups before opening new ones
 * @param payload         cross-commit merge semantics (see [[MergePayload]])
 * @param schemaOnRead    allow RENAME/DROP COLUMN as schema-only commits,
 *                        resolved by column id on read (ref:
 *                        HoodieCommonConfig.java:34
 *                        `hoodie.schema.on.read.enable`; off by default,
 *                        as in the reference)
 * @param version         table format version (ref: hudi-common .../table/
 *                        HoodieTableVersion.java + hudi-client-common
 *                        .../upgrade/UpgradeDowngrade.java): 1 = id-less
 *                        schema epochs, columns resolve by NAME only;
 *                        2 = id-mapped epochs (RENAME/DROP COLUMN capable).
 *                        Tables whose table.json predates the field load
 *                        as 1; migration is upgrade_or_downgrade's job.
 */
case class TableConfig(
    name: String,
    tableType: TableType,
    keyFields: Seq[String],
    precombineField: Option[String] = None,
    partitioning: PartitionSpec = NonPartitioned,
    index: IndexType = StatsIndex,
    targetFileSizeRows: Long = 1000000L,
    payload: MergePayload = OverwriteLatest,
    schemaOnRead: Boolean = false,
    version: Int = TableConfig.CurrentVersion,
    // Virtual keys (ref: HoodieTableConfig.java:178 POPULATE_META_FIELDS):
    // false = append-only table whose `_g_*` meta columns are never
    // materialized in files — key/partition derive from expressions and the
    // commit instant from the file name on read. A real storage win at PB
    // scale (five columns fewer per row); tagging ops are rejected.
    populateMetaFields: Boolean = true,
    // Base file format (ref: HoodieTableConfig BASE_FILE_FORMAT,
    // HoodieOrcWriter): "parquet" (default; while-writing bloom sidecars)
    // or "orc" (commit-time footer stats from the ORC file tail; blooms
    // via CREATE INDEX backfill only).
    baseFileFormat: String = "parquet",
    // Drop partition columns from data files (ref: hoodie.datasource.write
    // .drop.partition.columns): the value lives ONLY in the directory path
    // (and the _g_ partition meta column) and is re-derived on read — one
    // column of redundant bytes less per partition column at PB scale.
    // Requires hive-style, unencoded column partitioning + materialized
    // meta fields (the read-side inverse parses `col=val` from the meta
    // path; the null sentinel round-trips to null).
    dropPartitionColumns: Boolean = false) {

  require(Set("parquet", "orc")(baseFileFormat),
    s"unsupported base file format '$baseFileFormat' (parquet | orc)")

  require(!dropPartitionColumns || (partitioning match {
      case p: PartitionByColumns => p.hiveStyle && !p.urlEncode &&
        populateMetaFields
      case _ => false
    }),
    "graft.drop.partition.columns requires hive-style, unencoded column " +
      "partitioning and populated meta fields (the read side re-derives " +
      "values by parsing col=val from the partition path)")

  /** Inverse of the partition path for one dropped column: parse `col=val`
    * back out of the materialized partition-path meta column. Codegen'd
    * string ops only; the null sentinel round-trips to null. */
  def partitionColFromPath(partCol: Column, name: String,
      dt: org.apache.spark.sql.types.DataType): Column = {
    val cols = partitioning.columns
    val i = cols.indexOf(name)
    require(i >= 0, s"$name is not a partition column")
    val seg = element_at(split(partCol, "/"), i + 1)
    val v = regexp_replace(seg, "^" + java.util.regex.Pattern.quote(name + "="), "")
    when(v === PartitionSpec.NullSegment, lit(null).cast(dt)).otherwise(v.cast(dt))
  }

  /** Record key expression: single col as string, or `f1:v1,f2:v2` for
    * complex keys (mirrors ComplexAvroKeyGenerator output shape).
    *
    * Null key values FAIL the write (as the reference's key generators
    * throw): a null key would silently collapse distinct records in
    * precombine/merge windows and never match in the tag join. */
  def keyExpr: Column = {
    def guarded(f: String): Column = {
      val c = col(f).cast("string")
      when(c.isNull, raise_error(
        lit(s"record key field '$f' is null — null keys are not allowed"))
        .cast("string")).otherwise(c)
    }
    if (keyFields.size == 1) guarded(keyFields.head)
    else concat_ws(",", keyFields.map(f => concat(lit(f + ":"), guarded(f))): _*)
  }
}

object TableConfig {
  /** Format version new tables are created at. */
  val CurrentVersion = 2
}
