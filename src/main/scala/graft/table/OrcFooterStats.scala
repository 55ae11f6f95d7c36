package graft.table

import java.nio.file.{Files, Path => JPath}
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.orc.{BooleanColumnStatistics, ColumnStatistics,
  DateColumnStatistics, DoubleColumnStatistics, IntegerColumnStatistics,
  OrcFile, StringColumnStatistics, TypeDescription}

/**
 * Per-file row counts and column min/max from the ORC file TAIL only — the
 * ORC twin of [[FooterStats]] (ref: hudi-common .../util/OrcUtils.java
 * readRangeFromOrcMetadata / HoodieOrcWriter.java:51 which stores the same
 * file-level statistics). Same discipline: only types whose ORC statistic
 * converts losslessly to the engine's string stat form yield entries —
 * identical rendering to the parquet path, so pruning logic never sees a
 * format-dependent value. Timestamps and decimals yield no entry (cannot
 * prune — always correct).
 */
object OrcFooterStats {
  import FooterStats.FileStats

  def read(conf: Configuration, file: JPath, wanted: Set[String]): FileStats = {
    val reader = OrcFile.createReader(new HPath(file.toUri),
      OrcFile.readerOptions(conf))
    try {
      val schema = reader.getSchema
      require(schema.getCategory == TypeDescription.Category.STRUCT,
        s"orc base file must be a struct root, got ${schema.getCategory}")
      val names = schema.getFieldNames.asScala.toSeq
      val kids = schema.getChildren.asScala.toSeq
      val stats = reader.getStatistics
      val mm = mutable.Map[String, (String, String)]()
      for ((n, k) <- names.zip(kids) if wanted(n)) {
        val s: ColumnStatistics = stats(k.getId)
        render(k, s).foreach(mm(n) = _)
      }
      FileStats(reader.getNumberOfRows, mm.toMap, names.toSet, Files.size(file))
    } finally reader.close()
  }

  /** None = type unsupported (no pruning); Some(("","")) = all-null. */
  private def render(t: TypeDescription,
      s: ColumnStatistics): Option[(String, String)] = {
    import TypeDescription.Category._
    val supported = t.getCategory match {
      case STRING | VARCHAR | CHAR | BYTE | SHORT | INT | LONG | DOUBLE |
           BOOLEAN | DATE => true
      // FLOAT is excluded: ORC folds it into DoubleColumnStatistics and the
      // double rendering of a float value differs from the parquet path's
      // Float.toString — a format-dependent stat string is worse than none
      case _ => false
    }
    if (!supported) return None
    if (s.getNumberOfValues == 0) return Some(("", ""))
    s match {
      case st: StringColumnStatistics if st.getMinimum != null =>
        Some((st.getMinimum, st.getMaximum))
      case it: IntegerColumnStatistics =>
        Some((it.getMinimum.toString, it.getMaximum.toString))
      case dt: DoubleColumnStatistics =>
        Some((dt.getMinimum.toString, dt.getMaximum.toString))
      case dd: DateColumnStatistics if dd.getMinimumLocalDate != null =>
        // LocalDate.toString == the parquet DATE rendering
        Some((dd.getMinimumLocalDate.toString, dd.getMaximumLocalDate.toString))
      case bb: BooleanColumnStatistics =>
        val (mn, mx) = (bb.getTrueCount == s.getNumberOfValues,
          bb.getTrueCount > 0)
        Some((mn.toString, mx.toString))
      case _ => None
    }
  }
}
