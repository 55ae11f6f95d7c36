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
import org.apache.parquet.schema.LogicalTypeAnnotation.{
  DateLogicalTypeAnnotation, IntLogicalTypeAnnotation, StringLogicalTypeAnnotation}

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
  /** minMax: column -> (min, max) as strings; "" = no non-null values. */
  case class FileStats(rows: Long, minMax: Map[String, (String, String)])

  def read(conf: Configuration, file: JPath, wanted: Set[String]): FileStats = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new HPath(file.toUri), conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val acc = mutable.Map[String, (PrimitiveType, Statistics[_])]()
      val poisoned = mutable.Set[String]() // a chunk without stats voids the column
      for (b <- blocks; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        if (wanted(name) && !poisoned(name)) {
          val s = c.getStatistics
          if (s == null) { poisoned += name; acc.remove(name) }
          else acc.get(name) match {
            case Some((_, a)) => mergeInto(a, s)
            case None => acc(name) = (c.getPrimitiveType, s)
          }
        }
      }
      val mm = acc.iterator.flatMap { case (name, (prim, s)) =>
        render(prim, s).map(name -> _)
      }.toMap
      FileStats(rows, mm)
    } finally reader.close()
  }

  private def mergeInto(a: Statistics[_], b: Statistics[_]): Unit =
    a.asInstanceOf[Statistics[Nothing]]
      .mergeStatistics(b.asInstanceOf[Statistics[Nothing]])

  /** Convert footer min/max to the engine's string stat form; None = type
    * not supported (no pruning), Some(("","")) = supported but all-null. */
  private def render(prim: PrimitiveType, s: Statistics[_]): Option[(String, String)] = {
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
        case _ => None
      }
      case INT64 => logical match {
        case null | _: IntLogicalTypeAnnotation => plain
        case _ => None // timestamps: string form differs from Spark's cast
      }
      case FLOAT | DOUBLE | BOOLEAN => plain
      case BINARY => logical match {
        case _: StringLogicalTypeAnnotation =>
          def str(v: Any) = v.asInstanceOf[Binary].toStringUsingUTF8
          Some((str(s.genericGetMin), str(s.genericGetMax)))
        case _ => None
      }
      case _ => None
    }
  }

  /** Whether this column's type would be extracted if it had values. */
  private def renderable(prim: PrimitiveType): Option[Unit] = {
    val logical = prim.getLogicalTypeAnnotation
    prim.getPrimitiveTypeName match {
      case INT32 => logical match {
        case null | _: IntLogicalTypeAnnotation | _: DateLogicalTypeAnnotation => Some(())
        case _ => None
      }
      case INT64 => logical match {
        case null | _: IntLogicalTypeAnnotation => Some(())
        case _ => None
      }
      case FLOAT | DOUBLE | BOOLEAN => Some(())
      case BINARY => logical match {
        case _: StringLogicalTypeAnnotation => Some(())
        case _ => None
      }
      case _ => None
    }
  }
}
