package graft.table

import java.nio.file.{Path => JPath}
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.{
  DateLogicalTypeAnnotation, DecimalLogicalTypeAnnotation,
  IntLogicalTypeAnnotation, StringLogicalTypeAnnotation,
  TimestampLogicalTypeAnnotation}

/**
 * Per-file row counts and column min/max from the parquet FOOTER only —
 * no data scan. This is how commit-time stats collection stays O(#files)
 * metadata work instead of a second full pass over everything just written
 * (the reference reads the same footer statistics when building its
 * column-stats metadata index, ref: hudi-common
 * .../util/ParquetUtils.java:readRangeFromParquetMetadata).
 *
 * Only types whose footer representation converts losslessly to the engine's
 * string stat form are extracted (int32/int64, float/double, boolean, UTF-8
 * binary, date). Anything else (timestamps, decimals, nested) yields no
 * entry, which readers treat as "cannot prune" — always correct, never fast
 * at the cost of wrong.
 */
object FooterStats {
  /** minMax: column -> (min, max) as strings; "" = no non-null values.
    * `columns` = every physical leaf column present in the file.
    * `bytes` = physical file length (free — the footer read has the file
    * open already; no second stat call on the commit path). */
  case class FileStats(rows: Long, minMax: Map[String, (String, String)],
      columns: Set[String] = Set.empty, bytes: Long = 0)

  /** @param sessionTz the Spark session's `spark.sql.session.timeZone` —
    *   timestamp stats must render in the same zone the engine's string
    *   comparisons (and the caller's bound strings) use. */
  def read(conf: Configuration, file: JPath, wanted: Set[String],
      sessionTz: String = "UTC"): FileStats = {
    val input = HadoopInputFile.fromPath(new HPath(file.toUri), conf)
    val reader = ParquetFileReader.open(input)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val acc = mutable.Map[String, (PrimitiveType, Statistics[_])]()
      val poisoned = mutable.Set[String]() // a chunk without stats voids the column
      for (b <- blocks; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        if (wanted(name) && !poisoned(name)) {
          val s = c.getStatistics
          // isEmpty = the writer dropped this chunk's stats (e.g. binary
          // min/max over the truncation cap); merging would silently ignore
          // the chunk and NARROW the file range -> unsafe pruning. Void the
          // whole column instead (readers treat "no stats" as can't-prune).
          if (s == null || s.isEmpty) { poisoned += name; acc.remove(name) }
          else acc.get(name) match {
            case Some((_, a)) => mergeInto(a, s)
            case None => acc(name) = (c.getPrimitiveType, s)
          }
        }
      }
      val zone = java.time.ZoneId.of(sessionTz)
      val mm = acc.iterator.flatMap { case (name, (prim, s)) =>
        render(prim, s, zone).map(name -> _)
      }.toMap
      val cols = reader.getFooter.getFileMetaData.getSchema.getPaths.asScala
        .map(p => p.mkString(".")).toSet
      FileStats(rows, mm, cols, input.getLength)
    } finally reader.close()
  }

  private def mergeInto(a: Statistics[_], b: Statistics[_]): Unit =
    a.asInstanceOf[Statistics[Nothing]]
      .mergeStatistics(b.asInstanceOf[Statistics[Nothing]])

  /** Convert footer min/max to the engine's string stat form; None = type
    * not supported (no pruning), Some(("","")) = supported but all-null. */
  private def render(prim: PrimitiveType, s: Statistics[_],
      zone: java.time.ZoneId): Option[(String, String)] = {
    if (!s.hasNonNullValue) return renderable(prim).map(_ => ("", ""))
    val logical = prim.getLogicalTypeAnnotation
    def plain = Some((s.genericGetMin.toString, s.genericGetMax.toString))
    prim.getPrimitiveTypeName match {
      case INT32 => logical match {
        case null | _: IntLogicalTypeAnnotation => plain
        case _: DateLogicalTypeAnnotation =>
          def d(v: Any) = java.time.LocalDate
            .ofEpochDay(v.asInstanceOf[Number].longValue).toString
          Some((d(s.genericGetMin), d(s.genericGetMax)))
        case dec: DecimalLogicalTypeAnnotation => decimalStr(s, dec.getScale)
        case _ => None
      }
      case INT64 => logical match {
        case null | _: IntLogicalTypeAnnotation => plain
        case ts: TimestampLogicalTypeAnnotation => timestampStr(s, ts, zone)
        case dec: DecimalLogicalTypeAnnotation => decimalStr(s, dec.getScale)
        case _ => None
      }
      case FLOAT | DOUBLE | BOOLEAN => plain
      case BINARY | FIXED_LEN_BYTE_ARRAY => logical match {
        case _: StringLogicalTypeAnnotation =>
          def str(v: Any) = v.asInstanceOf[Binary].toStringUsingUTF8
          Some((str(s.genericGetMin), str(s.genericGetMax)))
        case dec: DecimalLogicalTypeAnnotation => decimalStr(s, dec.getScale)
        case _ => None
      }
      case _ => None
    }
  }

  /** INT64 timestamp -> the engine's "yyyy-MM-dd HH:mm:ss" string form
    * (fixed width: lexicographic order == chronological order). Min is
    * floored and max CEILED to whole seconds, so sub-second values widen
    * the recorded range slightly — safe for pruning, never wrong.
    *
    * Rendering zone: NTZ timestamps (isAdjustedToUTC=false) store a wall
    * clock — rendered at UTC offset they reproduce it exactly, independent
    * of session timezone. Instant timestamps (isAdjustedToUTC=true) render
    * the way Spark's cast-to-string does, in the SESSION zone — but only
    * when that zone is a fixed offset (UTC, "+05:30", …): under a DST zone
    * wall-clock strings are not monotonic in epoch time, lexical pruning
    * against them can be wrong, so such columns yield no stats (always
    * scanned — correct, never fast at the cost of wrong). */
  private def timestampStr(s: Statistics[_],
      ts: TimestampLogicalTypeAnnotation,
      zone: java.time.ZoneId): Option[(String, String)] = {
    val offset: java.time.ZoneOffset =
      if (!ts.isAdjustedToUTC) java.time.ZoneOffset.UTC
      else if (zone.getRules.isFixedOffset) zone.getRules.getOffset(java.time.Instant.EPOCH)
      else return None
    val perSec = ts.getUnit match {
      case LogicalTypeAnnotation.TimeUnit.MILLIS => 1000L
      case LogicalTypeAnnotation.TimeUnit.MICROS => 1000000L
      case _ => 1000000000L
    }
    def fmt(sec: Long) = java.time.LocalDateTime
      .ofEpochSecond(sec, 0, offset)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    val mn = s.genericGetMin.asInstanceOf[Number].longValue
    val mx = s.genericGetMax.asInstanceOf[Number].longValue
    val mxCeil = Math.floorDiv(mx, perSec) +
      (if (Math.floorMod(mx, perSec) == 0) 0 else 1)
    Some((fmt(Math.floorDiv(mn, perSec)), fmt(mxCeil)))
  }

  /** Decimal (int-backed or big-endian binary unscaled) -> plain numeric
    * string; the engine compares decimal-typed stats numerically. */
  private def decimalStr(s: Statistics[_], scale: Int): Option[(String, String)] = {
    def d(v: Any): String = v match {
      case b: Binary =>
        new java.math.BigDecimal(new java.math.BigInteger(b.getBytes), scale)
          .toPlainString
      case n: Number => java.math.BigDecimal.valueOf(n.longValue, scale).toPlainString
    }
    Some((d(s.genericGetMin), d(s.genericGetMax)))
  }

  /** Whether this column's type would be extracted if it had values. */
  private def renderable(prim: PrimitiveType): Option[Unit] = {
    val logical = prim.getLogicalTypeAnnotation
    prim.getPrimitiveTypeName match {
      case INT32 => logical match {
        case null | _: IntLogicalTypeAnnotation | _: DateLogicalTypeAnnotation |
             _: DecimalLogicalTypeAnnotation => Some(())
        case _ => None
      }
      case INT64 => logical match {
        case null | _: IntLogicalTypeAnnotation | _: TimestampLogicalTypeAnnotation |
             _: DecimalLogicalTypeAnnotation => Some(())
        case _ => None
      }
      case FLOAT | DOUBLE | BOOLEAN => Some(())
      case BINARY | FIXED_LEN_BYTE_ARRAY => logical match {
        case _: StringLogicalTypeAnnotation | _: DecimalLogicalTypeAnnotation => Some(())
        case _ => None
      }
      case _ => None
    }
  }
}
