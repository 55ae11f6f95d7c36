package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.{expressions => cat}
import org.apache.spark.sql.execution.datasources.{
  FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import graft.table.{CodePointOrder, FileMeta, GraftTable}

/**
 * The Spark relations behind `spark.read.format("graft")`.
 *
 * Fast path ([[GraftRelations.fast]]): when the snapshot is exactly a
 * multi-file parquet scan (COW, no logs, uniform schema — see
 * GraftTable.fastScanFiles), the relation IS a native HadoopFsRelation over
 * the live base files: predicate pushdown, column pruning and vectorized
 * reading all work as for a plain parquet table (ref: the reference's
 * BaseFileOnlyRelation, hudi-spark-datasource/hudi-spark-common/src/main/
 * scala/org/apache/hudi/BaseFileOnlyRelation.scala:48), and the
 * [[GraftFileIndex]] additionally skips whole files at PLAN time from the
 * commit-recorded per-file column stats (the reference's column-stats
 * metadata index / data skipping, ref: hudi-common/src/main/java/org/apache/
 * hudi/metadata/HoodieTableMetadataUtil.java).
 *
 * General path ([[GraftComputedRelation]]): MOR log merges, bootstrapped
 * files, evolved schemas and incremental queries run through the table's
 * own merging readers; pushed filters and the column projection are applied
 * INSIDE that DataFrame (so parquet-level pushdown still happens below the
 * merge window), and Spark re-applies every filter above — correct even for
 * the ones the translation drops.
 */
object GraftRelations {

  /** Native pushdown-capable relation over the live base files.
    * `partitionSchema` is non-empty only for drop.partition.columns
    * tables: those columns come from the partition path (parsed into
    * PartitionDirectory rows), not the files — filters on them prune at
    * plan time without touching a byte of data. */
  def fast(spark: SparkSession, basePath: String, files: Seq[FileMeta],
      schema: StructType, format: String = "parquet",
      partitionSchema: StructType = new StructType()): BaseRelation =
    HadoopFsRelation(
      location = new GraftFileIndex(spark, basePath, files, partitionSchema),
      partitionSchema = partitionSchema,
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = if (format == "orc")
        new org.apache.spark.sql.execution.datasources.orc.OrcFileFormat
      else new ParquetFileFormat,
      options = Map.empty)(spark)
}

/**
 * A [[FileIndex]] resolved purely from commit metadata — never a filesystem
 * listing (the reference needs its metadata table for the same property) —
 * that prunes files at plan time with the per-file column stats recorded at
 * commit. Spark hands `listFiles` the query's data filters; a file whose
 * recorded [min,max] cannot satisfy them is never scanned. Partition
 * columns are regular data columns here (hive-style values are materialized
 * in the files), so "partition pruning" is subsumed by stats pruning.
 */
class GraftFileIndex(spark: SparkSession, basePath: String,
    files: Seq[FileMeta],
    partSchema: StructType = new StructType()) extends FileIndex {
  import GraftFileIndex.{mayMatch, partValue}

  private val entries: Seq[(FileMeta, FileStatus)] = files.map { f =>
    val p = new HPath(s"$basePath/${f.path}")
    // commits record physical sizes; older metadata (bytes=0) stats once here
    val len = if (f.bytes > 0) f.bytes
      else java.nio.file.Files.size(java.nio.file.Paths.get(basePath, f.path))
    (f, new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, p))
  }

  override def rootPaths: Seq[HPath] = Seq(new HPath(basePath))

  /** Partition-path string → typed PartitionDirectory row (hive-style
    * `col=val` segments; the null sentinel reads back as null). */
  private def parseRow(partition: String): InternalRow = {
    val segs = partition.split('/')
    InternalRow.fromSeq(partSchema.fields.zipWithIndex.map { case (f, i) =>
      val raw = segs(i).stripPrefix(f.name + "=")
      if (raw == graft.table.PartitionSpec.NullSegment) null
      else partValue(raw, f.dataType)
    }.toIndexedSeq)
  }

  override def listFiles(partitionFilters: Seq[cat.Expression],
      dataFilters: Seq[cat.Expression]): Seq[PartitionDirectory] = {
    val kept = entries.filter { case (f, _) =>
      dataFilters.forall(e => mayMatch(f, e))
    }
    if (partSchema.isEmpty)
      Seq(PartitionDirectory(InternalRow.empty, kept.map(_._2).toArray))
    else {
      // the index OWNS partition pruning for a HadoopFsRelation: bind the
      // filters against the partition row (PartitioningAwareFileIndex's
      // contract) and drop whole directories at plan time
      val pred = if (partitionFilters.isEmpty) None
        else Some(cat.Predicate.createInterpreted(
          partitionFilters.reduce(cat.And).transform {
            case a: cat.AttributeReference =>
              val i = partSchema.indexWhere(_.name == a.name)
              require(i >= 0, s"unknown partition column ${a.name}")
              cat.BoundReference(i, partSchema(i).dataType, nullable = true)
          }))
      kept.groupBy(_._1.partition).toSeq.sortBy(_._1).flatMap { case (p, fs) =>
        val row = parseRow(p)
        if (pred.forall(_.eval(row)))
          Some(PartitionDirectory(row, fs.map(_._2).toArray))
        else None
      }
    }
  }

  override def inputFiles: Array[String] = entries.map(_._2.getPath.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = entries.map(_._2.getLen).sum
  override def partitionSchema: StructType = partSchema
}

object GraftFileIndex {

  /** Partition value types the fast path can parse into PartitionDirectory
    * rows; anything else falls back to the conforming reader. */
  private[graft] def partValueSupported(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | ShortType | DoubleType |
         FloatType | BooleanType | DateType => true
    case _ => false
  }

  /** String partition segment → catalyst value (mirror of the cast the
    * conforming reader applies by expression). */
  private def partValue(v: String, dt: DataType): Any = dt match {
    case StringType => org.apache.spark.unsafe.types.UTF8String.fromString(v)
    case IntegerType => v.toInt
    case LongType => v.toLong
    case ShortType => v.toShort
    case DoubleType => v.toDouble
    case FloatType => v.toFloat
    case BooleanType => v.toBoolean
    case DateType => java.time.LocalDate.parse(v).toEpochDay.toInt
    case other => throw new UnsupportedOperationException(
      s"unsupported partition value type $other")
  }

  /** Conservative may-satisfy test of a catalyst predicate against a file's
    * recorded stats: false ONLY when the recorded range proves no row can
    * match. Unknown columns, unparseable stats and unsupported shapes keep
    * the file. */
  private[sources] def mayMatch(f: FileMeta, e: cat.Expression): Boolean = e match {
    case cat.And(l, r) => mayMatch(f, l) && mayMatch(f, r)
    case cat.Or(l, r) => mayMatch(f, l) || mayMatch(f, r)
    case cat.EqualTo(a: cat.AttributeReference, cat.Literal(v, dt)) => mayEq(f, a.name, v, dt)
    case cat.EqualTo(cat.Literal(v, dt), a: cat.AttributeReference) => mayEq(f, a.name, v, dt)
    case cat.GreaterThan(a: cat.AttributeReference, cat.Literal(v, dt)) => mayCmp(f, a.name, v, dt, c => c > 0)
    case cat.GreaterThan(cat.Literal(v, dt), a: cat.AttributeReference) => mayCmpLo(f, a.name, v, dt, c => c < 0)
    case cat.GreaterThanOrEqual(a: cat.AttributeReference, cat.Literal(v, dt)) => mayCmp(f, a.name, v, dt, c => c >= 0)
    case cat.GreaterThanOrEqual(cat.Literal(v, dt), a: cat.AttributeReference) => mayCmpLo(f, a.name, v, dt, c => c <= 0)
    case cat.LessThan(a: cat.AttributeReference, cat.Literal(v, dt)) => mayCmpLo(f, a.name, v, dt, c => c < 0)
    case cat.LessThan(cat.Literal(v, dt), a: cat.AttributeReference) => mayCmp(f, a.name, v, dt, c => c > 0)
    case cat.LessThanOrEqual(a: cat.AttributeReference, cat.Literal(v, dt)) => mayCmpLo(f, a.name, v, dt, c => c <= 0)
    case cat.LessThanOrEqual(cat.Literal(v, dt), a: cat.AttributeReference) => mayCmp(f, a.name, v, dt, c => c >= 0)
    case cat.In(a: cat.AttributeReference, vs) if vs.forall(_.isInstanceOf[cat.Literal]) =>
      vs.exists { case cat.Literal(v, dt) => mayEq(f, a.name, v, dt) }
    case cat.InSet(a: cat.AttributeReference, vs) =>
      vs.exists(v => mayEq(f, a.name, v, a.dataType))
    case cat.IsNotNull(a: cat.AttributeReference) => !allNull(f, a.name)
    case _ => true
  }

  private def range(f: FileMeta, column: String): Option[(String, String)] =
    if (column == GraftTable.KEY) {
      if (f.keyMin.isEmpty && f.keyMax.isEmpty) None else Some((f.keyMin, f.keyMax))
    } else f.colStats.get(column).map(a => (a(0), a(1)))

  /** Recorded stats prove the column has no non-null values in this file. */
  private def allNull(f: FileMeta, column: String): Boolean =
    f.colStats.get(column).exists(a => a(0).isEmpty && a(1).isEmpty)

  /** v may equal some value in the file: min <= v <= max. */
  private def mayEq(f: FileMeta, column: String, v: Any, dt: DataType): Boolean = {
    if (v == null) return true // null-compare never matches, but keep it simple
    if (allNull(f, column)) return false
    range(f, column) match {
      case None => true
      case Some((mn, mx)) =>
        (cmp(mn, v, dt), cmp(mx, v, dt)) match {
          case (Some(lo), Some(hi)) => lo <= 0 && hi >= 0
          case _ => true
        }
    }
  }

  /** Some value may satisfy `pred(compare(max, v))` (upper-end tests). */
  private def mayCmp(f: FileMeta, column: String, v: Any, dt: DataType,
      pred: Int => Boolean): Boolean = {
    if (v == null) return true
    if (allNull(f, column)) return false
    range(f, column).flatMap { case (_, mx) => cmp(mx, v, dt) }
      .forall(pred)
  }

  /** Some value may satisfy `pred(compare(min, v))` (lower-end tests). */
  private def mayCmpLo(f: FileMeta, column: String, v: Any, dt: DataType,
      pred: Int => Boolean): Boolean = {
    if (v == null) return true
    if (allNull(f, column)) return false
    range(f, column).flatMap { case (mn, _) => cmp(mn, v, dt) }
      .forall(pred)
  }

  /** compare(recorded stat string, literal value); None = can't compare
    * safely (unsupported type / unparseable stat) -> no pruning. Timestamps
    * are deliberately excluded: their stat strings are session-tz rendered
    * wall clocks while catalyst literals are epoch micros — converting
    * between them here would have to reproduce the exact session zone the
    * stats were written under. */
  private def cmp(stat: String, v: Any, dt: DataType): Option[Int] = {
    if (stat.isEmpty) return None
    dt match {
      // stats are toString of the native typed value, so parsing them back
      // AT THE SAME type is exact. Comparing via a widened double is not:
      // a float stat "1.1" double-parses to 1.1000000000000001 while the
      // float literal widens to 1.100000023841858, and longs beyond 2^53
      // collapse — either can prune a file that holds matching rows.
      case ByteType | ShortType | IntegerType | LongType =>
        stat.toLongOption.map(s =>
          java.lang.Long.compare(s, v.asInstanceOf[Number].longValue))
      case FloatType =>
        stat.toFloatOption.map(s =>
          java.lang.Float.compare(s, v.asInstanceOf[Number].floatValue))
      case DoubleType =>
        stat.toDoubleOption.map(s =>
          java.lang.Double.compare(s, v.asInstanceOf[Number].doubleValue))
      case _: DecimalType =>
        scala.util.Try(BigDecimal(stat)).toOption.map(s =>
          s.compare(v.asInstanceOf[Decimal].toBigDecimal))
      case StringType => Some(CodePointOrder.compare(stat, v.toString))
      case DateType =>
        // stats are ISO yyyy-MM-dd (lexicographic == chronological);
        // catalyst date literals are epoch days
        val iso = java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue).toString
        Some(CodePointOrder.compare(stat, iso))
      case BooleanType =>
        stat.toBooleanOption.map(s =>
          java.lang.Boolean.compare(s, v.asInstanceOf[Boolean]))
      case _ => None
    }
  }
}

/**
 * General-path relation: the query-type DataFrame (snapshot with MOR merge,
 * read-optimized, incremental) evaluated through the table's own readers.
 * Spark's pushed filters and column projection are applied to that frame
 * before execution — Catalyst then pushes them through the merge window's
 * deterministic parts down to the parquet scans where legal.
 */
class GraftComputedRelation(spark: SparkSession, compute: () => DataFrame)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = spark.sqlContext

  private lazy val df: DataFrame = compute()

  override lazy val schema: StructType = df.schema

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val pushed = filters.flatMap(GraftComputedRelation.toColumn).reduceOption(_ && _)
    val filtered = pushed.map(df.filter).getOrElse(df)
    // zero required columns (e.g. count(*)) still needs the row count
    filtered.select(requiredColumns.toSeq.map(c => col(s"`$c`")): _*).rdd
  }
}

object GraftComputedRelation {

  /** sources.Filter -> Column; None = not translatable (Spark re-applies
    * every filter above the scan, so dropping one only loses pushdown).
    * And may push either side alone (superset is sound); Or must have both. */
  private[sources] def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(s"`$a`") === lit(v))
    case EqualNullSafe(a, v) => Some(col(s"`$a`") <=> lit(v))
    case GreaterThan(a, v) => Some(col(s"`$a`") > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(s"`$a`") >= lit(v))
    case LessThan(a, v) => Some(col(s"`$a`") < lit(v))
    case LessThanOrEqual(a, v) => Some(col(s"`$a`") <= lit(v))
    case In(a, vs) => Some(col(s"`$a`").isin(vs.toSeq: _*))
    case IsNull(a) => Some(col(s"`$a`").isNull)
    case IsNotNull(a) => Some(col(s"`$a`").isNotNull)
    case StringStartsWith(a, v) => Some(col(s"`$a`").startsWith(v))
    case StringEndsWith(a, v) => Some(col(s"`$a`").endsWith(v))
    case StringContains(a, v) => Some(col(s"`$a`").contains(v))
    case Not(c) => toColumnStrict(c).map(!_)
    case And(l, r) => (toColumn(l), toColumn(r)) match {
      case (Some(a), Some(b)) => Some(a && b)
      case (one, other) => one.orElse(other)
    }
    case Or(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  /** Full translation only — used under Not. The partial-And superset rule
    * is sound for a positive push but inverts under negation:
    * Not(And(a, untranslatable)) -> !a is STRICTER than !a || !b and would
    * drop rows Spark's re-filter can never recover. */
  private def toColumnStrict(f: Filter): Option[Column] = f match {
    case And(l, r) => for { a <- toColumnStrict(l); b <- toColumnStrict(r) } yield a && b
    case Or(l, r) => for { a <- toColumnStrict(l); b <- toColumnStrict(r) } yield a || b
    case Not(c) => toColumnStrict(c).map(!_)
    case leaf => toColumn(leaf)
  }
}
