package graft.catalog

import java.nio.file.{Files, Path => NioPath, Paths}
import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{
  NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{
  Identifier, ProcedureCatalog, SupportsNamespaces, SupportsPartitionManagement,
  Table, TableCapability, TableCatalog, TableChange, TruncatableTable}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.types.StructField
import org.apache.spark.sql.connector.expressions.{Expressions, IdentityTransform, Transform}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.table._

/**
 * A Spark V2 `TableCatalog` giving Graft tables a CATALOG IDENTITY — the
 * piece the reference gets from its HoodieCatalog + hive sync (ref:
 * hudi-spark-datasource/hudi-spark/src/main/scala/org/apache/spark/sql/
 * hudi/catalog/HoodieCatalog.scala:63): with
 *
 *   spark.sql.catalog.graft           = graft.catalog.GraftCatalog
 *   spark.sql.catalog.graft.warehouse = /data/graft
 *
 * a table named `graft.db.orders` lives at `/data/graft/db/orders`, and the
 * full SQL-string surface works against it — SELECT, INSERT INTO/OVERWRITE,
 * CREATE TABLE (AS SELECT), DROP, and through [[GraftDmlRule]] the
 * row-level commands MERGE INTO / UPDATE / DELETE.
 *
 * Identifier → path is purely structural (namespace segments are
 * directories), so the catalog needs no metastore; an explicit LOCATION
 * creates a `<name>.link` file pointing at the external path — a table
 * created by the path-based API can be registered after the fact with
 * `CREATE TABLE graft.t USING graft LOCATION '<path>'`.
 */
class GraftCatalog extends TableCatalog with SupportsNamespaces with ProcedureCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"set spark.sql.catalog.$name.warehouse to the catalog's table directory"))
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): NioPath =
    Paths.get(warehouse, ident.namespace :+ ident.name: _*)

  private[catalog] def linkOf(ident: Identifier): NioPath =
    dirOf(ident).resolveSibling(dirOf(ident).getFileName.toString + ".link")

  /** Parsed .link redirect: (external path, read-optimized view?). Line 1
    * is the LOCATION; an optional second line `ro` marks the identifier as
    * a read-optimized VIEW of a MOR table — the `_ro` naming the
    * reference's metastore sync registers (ref: hudi-sync HiveSyncTool
    * .doSync — MOR syncs an RO and an RT table over one base path). */
  private[catalog] def linkInfo(ident: Identifier): Option[(String, Boolean)] =
    if (Files.isRegularFile(linkOf(ident))) {
      val lines = new String(Files.readAllBytes(linkOf(ident)), "UTF-8")
        .split('\n').map(_.trim).filter(_.nonEmpty)
      Some((lines(0), lines.length > 1 && lines(1) == "ro"))
    } else None

  /** The table's base path: the warehouse-derived directory, unless a .link
    * file redirects to an external LOCATION. */
  private[catalog] def pathOf(ident: Identifier): String =
    linkInfo(ident).map(_._1).getOrElse(dirOf(ident).toString)

  /** Register an existing path-based table under `ident` (the catalog half
    * of [[CatalogSync]]): writes the .link redirect, `ro` = the identifier
    * serves the read-optimized query. Idempotent; refuses to shadow a
    * table that physically lives in the warehouse directory. */
  private[catalog] def register(ident: Identifier, path: String,
      readOptimized: Boolean): Unit = {
    require(!GraftTable.exists(dirOf(ident).toString),
      s"cannot register '${ident}': a warehouse-resident table already " +
        s"lives at ${dirOf(ident)}")
    Files.createDirectories(linkOf(ident).getParent)
    val body = if (readOptimized) s"$path\nro" else path
    Files.write(linkOf(ident), body.getBytes("UTF-8")); ()
  }

  override def tableExists(ident: Identifier): Boolean =
    GraftTable.exists(pathOf(ident))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftV2Table(pathOf(ident),
      (catalogName +: ident.namespace :+ ident.name).mkString("."),
      readOptimized = linkInfo(ident).exists(_._2))
  }

  /** SQL time travel: `SELECT ... FROM graft.t VERSION AS OF '<instant>'`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftV2Table(pathOf(ident),
      (catalogName +: ident.namespace :+ ident.name).mkString("."), Some(version),
      readOptimized = linkInfo(ident).exists(_._2))
  }

  /** `... TIMESTAMP AS OF <ts>` (micros, UTC) → timeline instant form. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val asOf = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")
      .format(java.time.LocalDateTime.ofEpochSecond(
        timestamp / 1000000, ((timestamp % 1000000) * 1000).toInt,
        java.time.ZoneOffset.UTC))
    loadTable(ident, asOf)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala.toMap
    // Spark hands LOCATION through as a file: URI; graft paths are local
    val location = props.get(TableCatalog.PROP_LOCATION).map { loc =>
      val u = try new java.net.URI(loc) catch { case _: Exception => null }
      if (u != null && u.getScheme == "file") u.getPath else loc
    }
    val path = location.getOrElse(dirOf(ident).toString)
    location.foreach { loc =>
      Files.createDirectories(linkOf(ident).getParent)
      Files.write(linkOf(ident), loc.getBytes("UTF-8"))
    }
    // registering a pre-existing path-based table: keep its config
    if (!GraftTable.exists(path)) {
      val partCols = partitions.toSeq.map { t =>
        // IdentityTransform is private[sql]; match structurally
        if (t.name == "identity" && t.references.length == 1)
          t.references()(0).fieldNames.mkString(".")
        else throw new UnsupportedOperationException(
          s"graft tables support only identity PARTITIONED BY columns, got $t")
      }
      val t = GraftTable.create(SparkSession.active, path,
        GraftV2Table.configFrom(props, partCols, ident.name))
      if (schema.nonEmpty) GraftV2Table.storeSchema(path, schema)
      t
    }
    loadTable(ident)
  }

  /** ALTER TABLE — the DDL half of schema evolution (ref: hudi-spark/
    * .../command/AlterHoodieTableAddColumnsCommand.scala:40,
    * AlterHoodieTableChangeColumnCommand.scala:42,
    * Spark33ResolveHudiAlterTableCommand.scala, and HoodieCatalog's
    * property-change path). ADD COLUMNS, widening ALTER COLUMN TYPE, and —
    * when the table sets `graft.schema.on.read` — RENAME/DROP COLUMN
    * become a schema-only commit (renames resolve by column id on read) —
    * no data rewrite at any table size; SET/UNSET TBLPROPERTIES
    * re-persists the write config for the safe subset (file sizing, merge
    * payload, schema-on-read). Structural properties (keys, partitioning,
    * table type, index), narrowing type changes, and rename/drop of
    * identity columns are rejected. New column names must be unique under
    * the session resolver (case-insensitive by default) and may not shadow
    * graft meta columns. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    import graft.DefaultSource.{PAYLOAD, SCHEMA_ON_READ, TARGET_FILE_ROWS}
    val path = pathOf(ident)
    val spark = SparkSession.active
    val t = GraftTable.load(spark, path)
    val committed = t.schemaAt(None)
    var schema = committed.orElse(GraftV2Table.storedSchema(path))
      .getOrElse(new StructType())
    var cfg = t.config
    var schemaChanged, cfgChanged = false
    val resolver = spark.sessionState.conf.resolver
    def topLevel(fieldNames: Array[String], what: String): String = {
      if (fieldNames.length != 1) throw new UnsupportedOperationException(
        s"$what supports only top-level columns, got ${fieldNames.mkString(".")}")
      fieldNames(0)
    }
    val identityCols = (cfg.keyFields ++ cfg.precombineField ++
      cfg.partitioning.columns).toSet
    def checkNewName(name: String): Unit = {
      if (GraftTable.metaCols.exists(m => resolver(m, name)))
        throw new IllegalArgumentException(
          s"column name '$name' is reserved (graft meta column)")
      if (schema.fieldNames.exists(e => resolver(e, name)))
        throw new IllegalArgumentException(s"column '$name' already exists " +
          "(names resolve case-insensitively)")
    }
    changes.foreach {
      case add: TableChange.AddColumn =>
        val name = topLevel(add.fieldNames, "ADD COLUMNS")
        checkNewName(name)
        if (add.position != null) throw new UnsupportedOperationException(
          "ADD COLUMNS FIRST/AFTER is not supported; columns append at the end")
        val f = StructField(name, add.dataType, nullable = true)
        schema = schema.add(
          Option(add.comment).fold(f)(f.withComment))
        schemaChanged = true
      case ut: TableChange.UpdateColumnType =>
        val name = topLevel(ut.fieldNames, "ALTER COLUMN TYPE")
        if (!schema.fieldNames.contains(name)) throw new IllegalArgumentException(
          s"column '$name' does not exist")
        schema = StructType(schema.fields.map(f =>
          if (f.name == name) f.copy(dataType = ut.newDataType) else f))
        schemaChanged = true
      case rn: TableChange.RenameColumn =>
        val name = topLevel(rn.fieldNames, "RENAME COLUMN")
        if (!schema.fieldNames.contains(name)) throw new IllegalArgumentException(
          s"column '$name' does not exist")
        if (identityCols(name)) throw new IllegalArgumentException(
          s"cannot rename '$name': key/precombine/partition columns define " +
            "record identity")
        if (!cfg.schemaOnRead) throw new UnsupportedOperationException(
          s"RENAME COLUMN requires TBLPROPERTIES ('$SCHEMA_ON_READ' = 'true')" +
            " (renames resolve by column id on read)")
        checkNewName(rn.newName)
        schema = StructType(schema.fields.map(f =>
          if (f.name == name) f.copy(name = rn.newName) else f))
        schemaChanged = true
      case dc: TableChange.DeleteColumn =>
        val name = topLevel(dc.fieldNames, "DROP COLUMN")
        if (!schema.fieldNames.contains(name)) {
          if (dc.ifExists) () // no-op
          else throw new IllegalArgumentException(s"column '$name' does not exist")
        } else {
          if (identityCols(name)) throw new IllegalArgumentException(
            s"cannot drop '$name': key/precombine/partition columns define " +
              "record identity")
          if (!cfg.schemaOnRead) throw new UnsupportedOperationException(
            s"DROP COLUMN requires TBLPROPERTIES ('$SCHEMA_ON_READ' = 'true')")
          schema = StructType(schema.fields.filterNot(_.name == name))
          schemaChanged = true
        }
      case un: TableChange.UpdateColumnNullability =>
        // SET NOT NULL would claim a guarantee reads never enforce
        if (!un.nullable) throw new UnsupportedOperationException(
          "ALTER COLUMN ... SET NOT NULL is not supported: graft columns " +
            "are nullable on read (schema evolution fills absent columns " +
            "with null)")
        () // DROP NOT NULL matches actual behavior — no-op
      case _: TableChange.UpdateColumnComment => () // comments are not persisted
      case sp: TableChange.SetProperty => sp.property match {
        case TARGET_FILE_ROWS =>
          cfg = cfg.copy(targetFileSizeRows = sp.value.toLong); cfgChanged = true
        case PAYLOAD =>
          cfg = cfg.copy(payload = MergePayload.of(sp.value)); cfgChanged = true
        case SCHEMA_ON_READ =>
          cfg = cfg.copy(schemaOnRead = sp.value.toBoolean); cfgChanged = true
        case other => throw new UnsupportedOperationException(
          s"table property '$other' cannot be altered on a graft table " +
            s"(mutable: $TARGET_FILE_ROWS, $PAYLOAD, $SCHEMA_ON_READ)")
      }
      case rp: TableChange.RemoveProperty => rp.property match {
        case TARGET_FILE_ROWS =>
          cfg = cfg.copy(targetFileSizeRows = 1000000L); cfgChanged = true
        case PAYLOAD =>
          cfg = cfg.copy(payload = OverwriteLatest); cfgChanged = true
        case SCHEMA_ON_READ =>
          cfg = cfg.copy(schemaOnRead = false); cfgChanged = true
        case other => throw new UnsupportedOperationException(
          s"table property '$other' cannot be unset on a graft table")
      }
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change ${other.getClass.getSimpleName} is not " +
          "supported on graft tables")
    }
    if (schemaChanged) {
      if (committed.isDefined) t.alterSchema(schema)
      else GraftV2Table.storeSchema(path, schema) // declared-only: no commit yet
    }
    if (cfgChanged) GraftTable.saveConfig(path, cfg)
    loadTable(ident)
  }

  /** DROP TABLE. A `.link`-registered identifier is EXTERNAL (the catalog
    * half of [[CatalogSync]] — the reference's HiveSyncTool registers
    * EXTERNAL tables for exactly this reason): dropping it only unregisters
    * the link, never deletes lake data. In particular a MOR sync registers
    * `<name>_rt` and `<name>_ro` over ONE shared base path — deleting the
    * path through either link would silently destroy the other. Only a
    * warehouse-resident (catalog-managed) table's data is deleted. */
  override def dropTable(ident: Identifier): Boolean = {
    val existed = tableExists(ident)
    if (existed) {
      if (linkInfo(ident).isDefined) Files.deleteIfExists(linkOf(ident))
      else GraftTable.drop(pathOf(ident))
    }
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(dirOf(newIdent).getParent)
    if (Files.isRegularFile(linkOf(oldIdent)))
      Files.move(linkOf(oldIdent), linkOf(newIdent))
    else Files.move(dirOf(oldIdent), dirOf(newIdent))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = Paths.get(warehouse, namespace: _*)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    graft.table.Fs.list(dir).iterator.flatMap { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".link")) Some(n.stripSuffix(".link"))
      else if (GraftTable.exists(p.toString)) Some(n)
      else None
    }.toArray.sorted.map(Identifier.of(namespace, _))
  }

  // -- stored procedures: the reference's CALL surface --------------------
  // (ref: hudi-spark/.../command/procedures/HoodieProcedures.scala:31) —
  // `CALL graft.run_compaction(table => 't')` etc.; see GraftProcedures.
  override def loadProcedure(ident: Identifier): UnboundProcedure =
    GraftProcedures.load(this, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.names.map(Identifier.of(namespace, _)).toArray

  // -- minimal filesystem-backed namespaces -------------------------------
  override def listNamespaces(): Array[Array[String]] = {
    val root = Paths.get(warehouse)
    if (!Files.isDirectory(root)) Array.empty
    else graft.table.Fs.list(root).iterator
      .filter(p => Files.isDirectory(p) && !GraftTable.exists(p.toString))
      .map(p => Array(p.getFileName.toString)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || Files.isDirectory(Paths.get(warehouse, namespace: _*))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    Files.createDirectories(Paths.get(warehouse, namespace: _*)); ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace) || namespace.isEmpty) false
    else {
      val dir = Paths.get(warehouse, namespace: _*)
      val tables = listTables(namespace)
      if (tables.nonEmpty && !cascade)
        throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
      GraftTable.drop(dir.toString)
      true
    }
  }
}

/**
 * The catalog's Table handle: name, data schema and partitioning for the
 * analyzer. It deliberately declares NO read/write capabilities —
 * [[GraftDmlRule]] rewrites every plan that touches it (reads to the
 * format("graft") relation, DML to Graft commands) before capability checks
 * run, so Spark's generic V2 paths are never exercised.
 *
 * It DOES implement the V2 partition-management and truncation interfaces,
 * so `SHOW PARTITIONS`, `ALTER TABLE ... ADD/DROP PARTITION` and
 * `TRUNCATE TABLE` work as literal SQL (ref: hudi's
 * AlterHoodieTableDropPartitionCommand / TruncateHoodieTableCommand) —
 * those plans carry a ResolvedTable, not a relation, so they take Spark's
 * native V2 execs directly. Partition operations need column-valued
 * partitioning (`PARTITIONED BY (col)`); timestamp-derived partitioning
 * has no column↔value mapping to resolve specs against and throws.
 *
 * The SQL surface exposes the LOGICAL schema only (no `_graft_*` meta
 * columns); lineage metadata stays on the DataFrame API reads.
 */
class GraftV2Table(val path: String, fullName: String,
    val asOf: Option[String] = None,
    val readOptimized: Boolean = false) extends Table
    with SupportsPartitionManagement with TruncatableTable
    with org.apache.spark.sql.connector.catalog.index.SupportsIndex {
  override def name(): String = fullName

  private lazy val table: GraftTable = GraftTable.load(SparkSession.active, path)

  /** An `_ro` identifier is a read-optimized VIEW over a shared MOR base
    * path; every mutation entry point this Table exposes (truncate,
    * partition drop/truncate, index DDL) must refuse, mirroring the
    * GraftDmlRule guard on MERGE/UPDATE/DELETE/INSERT — otherwise
    * `TRUNCATE TABLE name_ro` mutates the base table through the view. */
  private def requireWritable(op: String): Unit =
    require(!readOptimized,
      s"$op is not allowed on read-optimized view $fullName; use the _rt table")

  // ---- SupportsIndex: CREATE/DROP INDEX as bloom-sidecar backfill (ref:
  // hudi-spark/.../command/IndexCommands.scala:28). The only index type is
  // the record-key bloom; columns, when given, must name the key fields.
  override def createIndex(indexName: String,
      columns: Array[org.apache.spark.sql.connector.expressions.NamedReference],
      columnsProperties: util.Map[org.apache.spark.sql.connector.expressions.NamedReference,
        util.Map[String, String]],
      properties: util.Map[String, String]): Unit = {
    requireWritable("CREATE INDEX")
    val cols = columns.map(_.fieldNames.mkString(".")).toSeq
    require(cols.isEmpty || cols == table.config.keyFields,
      s"graft indexes cover the record key ${table.config.keyFields.mkString(",")}" +
        s"; got (${cols.mkString(",")})")
    if (table.bloomIndexName.nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.IndexAlreadyExistsException(
        table.bloomIndexName.get, fullName, scala.None)
    table.createBloomIndex(indexName)
  }

  override def dropIndex(indexName: String): Unit = {
    requireWritable("DROP INDEX")
    if (!table.bloomIndexName.contains(indexName))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchIndexException(
        indexName, fullName, scala.None)
    table.dropBloomIndex()
  }

  override def indexExists(indexName: String): Boolean =
    table.bloomIndexName.contains(indexName)

  override def listIndexes(): Array[org.apache.spark.sql.connector.catalog.index.TableIndex] =
    table.bloomIndexName.map { n =>
      new org.apache.spark.sql.connector.catalog.index.TableIndex(n,
        "bloom_filters",
        table.config.keyFields.map(Expressions.column).toArray,
        util.Collections.emptyMap(), new java.util.Properties())
    }.toArray

  override lazy val schema: StructType =
    table.schemaAt(asOf).orElse(GraftV2Table.storedSchema(path)).getOrElse(
      throw new IllegalStateException(
        s"graft table at $path has neither commits nor a declared schema"))

  override def partitioning(): Array[Transform] = table.config.partitioning.columns.map(Expressions.identity).toArray

  /** Full config surfaced so DESCRIBE TABLE EXTENDED / SHOW CREATE TABLE
    * render a faithful, re-runnable definition (the reference exposes its
    * hoodie.* options the same way through HoodieCatalogTable). */
  override def properties(): util.Map[String, String] = {
    import graft.DefaultSource._
    val cfg = table.config
    (Map(TableCatalog.PROP_PROVIDER -> "graft",
      TableCatalog.PROP_LOCATION -> path,
      TABLE_TYPE -> cfg.tableType.name,
      RECORDKEY_FIELD -> cfg.keyFields.mkString(","),
      TARGET_FILE_ROWS -> cfg.targetFileSizeRows.toString,
      PAYLOAD -> cfg.payload.name) ++
      (if (cfg.schemaOnRead) Map(SCHEMA_ON_READ -> "true")
       else Map.empty[String, String]) ++
      (if (!cfg.populateMetaFields) Map(POPULATE_META_FIELDS -> "false")
       else Map.empty[String, String]) ++
      (if (cfg.baseFileFormat != "parquet")
         Map(BASE_FILE_FORMAT -> cfg.baseFileFormat)
       else Map.empty[String, String]) ++
      (if (cfg.dropPartitionColumns) Map(DROP_PARTITION_COLUMNS -> "true")
       else Map.empty[String, String]) ++
      cfg.precombineField.map(PRECOMBINE_FIELD -> _) ++
      (cfg.index match {
        case BucketIndex(n) => Map(INDEX_BUCKETS -> n.toString)
        case StatsIndex => Map.empty[String, String]
      }) ++
      (cfg.partitioning match {
        case p: PartitionByTimestamp =>
          Map(PARTITION_TS_COL -> p.tsCol, PARTITION_TS_FORMAT -> p.format) ++
          // epoch_millis/epoch_seconds/date_string tables must re-create
          // with the same input interpretation or partition paths go wrong
          (if (p.inputType != "timestamp")
             Map(PARTITION_TS_TYPE -> p.inputType)
           else Map.empty[String, String]) ++
          (if (p.inputFormat != "yyyy-MM-dd")
             Map(PARTITION_TS_INPUT_FORMAT -> p.inputFormat)
           else Map.empty[String, String])
        case p: PartitionByMixed =>
          Map(PARTITIONPATH_FIELD -> p.segs.map(s =>
            if (s.kind == "simple") s.col else s"${s.col}:${s.kind}").mkString(","))
        case _ => Map.empty[String, String] // identity cols show as PARTITIONED BY
      }) ++
      // non-default path styles must re-create faithfully
      (cfg.partitioning match {
        case p: PartitionByColumns if !p.hiveStyle || p.urlEncode =>
          (if (!p.hiveStyle) Map(HIVE_STYLE_PARTITIONING -> "false")
           else Map.empty[String, String]) ++
          (if (p.urlEncode) Map(PARTITIONPATH_URLENCODE -> "true")
           else Map.empty[String, String])
        case p: PartitionByTimestamp if !p.hiveStyle =>
          Map(HIVE_STYLE_PARTITIONING -> "false")
        case p: PartitionByMixed if !p.hiveStyle =>
          Map(HIVE_STYLE_PARTITIONING -> "false")
        case _ => Map.empty[String, String]
      })).asJava
  }

  override def capabilities(): util.Set[TableCapability] =
    util.Collections.emptySet()

  // -- partition management (SHOW PARTITIONS / ALTER TABLE DROP PARTITION) --

  private def partCols: Seq[StructField] = table.config.partitioning match {
    case p: PartitionByColumns => p.cols.map(c =>
      schema.find(_.name == c).getOrElse(throw new IllegalStateException(
        s"partition column $c missing from schema")))
    case other => throw new UnsupportedOperationException(
      s"partition operations need column-valued partitioning, table has $other")
  }

  override def partitionSchema(): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(partCols)

  private def colSpec: PartitionByColumns =
    table.config.partitioning.asInstanceOf[PartitionByColumns]

  /** Path segment for one typed partition value — must mirror
    * PartitionSpec.segment/encoded (cast-to-string + null sentinel +
    * optional percent-encoding). */
  private def segment(field: StructField, row: InternalRow, i: Int): String = {
    val v = if (row.isNullAt(i)) PartitionSpec.NullSegment
            else String.valueOf(row.get(i, field.dataType))
    if (colSpec.urlEncode)
      java.net.URLEncoder.encode(v, "UTF-8").replace("+", "%20")
    else v
  }

  private def pathOfIdent(ident: InternalRow): String = {
    val cols = partCols
    val style = colSpec
    cols.zipWithIndex.map { case (f, i) =>
      val v = segment(f, ident, i)
      if (style.hiveStyle) s"${f.name}=$v" else v
    }.mkString("/")
  }

  private def livePartitionPaths: Seq[String] = {
    table.timeline.refresh()
    table.slices(None).map(_.partition).distinct.sorted
  }

  override def listPartitionIdentifiers(names: Array[String],
      ident: InternalRow): Array[InternalRow] = {
    val cols = partCols
    val nameIdx = names.map(n => cols.indexWhere(_.name == n))
    require(nameIdx.forall(_ >= 0), s"unknown partition column in ${names.mkString(",")}")
    livePartitionPaths.flatMap { p =>
      val style = colSpec
      val values = p.split('/').map { seg =>
        val v = if (style.hiveStyle) seg.split("=", 2)(1) else seg
        if (style.urlEncode) PartitionSpec.decodeSegment(v) else v
      }
      if (values.length != cols.length) None
      else {
        val typed: Array[Any] = cols.zip(values).map { case (f, v) =>
          if (v == PartitionSpec.NullSegment) null
          else f.dataType match {
            case org.apache.spark.sql.types.StringType =>
              org.apache.spark.unsafe.types.UTF8String.fromString(v)
            case org.apache.spark.sql.types.IntegerType => v.toInt
            case org.apache.spark.sql.types.LongType => v.toLong
            case org.apache.spark.sql.types.ShortType => v.toShort
            case org.apache.spark.sql.types.BooleanType => v.toBoolean
            case org.apache.spark.sql.types.DoubleType => v.toDouble
            case dt => throw new UnsupportedOperationException(
              s"partition column type $dt not supported for partition management")
          }
        }.toArray
        val row = InternalRow.fromSeq(typed.toIndexedSeq)
        val matches = nameIdx.zipWithIndex.forall { case (ci, ni) =>
          val want = ident.get(ni, cols(ci).dataType)
          val have = row.get(ci, cols(ci).dataType)
          (want == null && have == null) || (want != null && want == have)
        }
        if (matches) Some(row) else None
      }
    }.toArray
  }

  /** Partitions materialize on write; ADD PARTITION is accepted as a no-op
    * (as in the reference, where the partition appears with its first
    * record). */
  override def createPartition(ident: InternalRow,
      properties: util.Map[String, String]): Unit = ()

  override def dropPartition(ident: InternalRow): Boolean = {
    requireWritable("ALTER TABLE DROP PARTITION")
    val p = pathOfIdent(ident)
    if (!livePartitionPaths.contains(p)) false
    else { table.deletePartitions(Seq(p)); true }
  }

  override def truncatePartition(ident: InternalRow): Boolean = {
    requireWritable("TRUNCATE PARTITION")
    dropPartition(ident)
  }

  override def replacePartitionMetadata(ident: InternalRow,
      properties: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft partitions carry no metadata to replace")

  override def loadPartitionMetadata(ident: InternalRow): util.Map[String, String] =
    util.Collections.emptyMap()

  // -- TRUNCATE TABLE ------------------------------------------------------

  override def truncateTable(): Boolean = {
    requireWritable("TRUNCATE TABLE")
    val spark = SparkSession.active
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    table.insertOverwriteTable(empty)
    true
  }
}

object GraftV2Table {
  /** Declared schema of a not-yet-written table (CREATE TABLE with columns
    * before the first INSERT). Superseded by the first commit's schema. */
  private def schemaFile(path: String): NioPath =
    Paths.get(path, ".graft", "schema.json")

  def storeSchema(path: String, schema: StructType): Unit = {
    Files.write(schemaFile(path), schema.json.getBytes("UTF-8")); ()
  }

  def storedSchema(path: String): Option[StructType] =
    if (Files.isRegularFile(schemaFile(path)))
      Some(DataType.fromJson(
        new String(Files.readAllBytes(schemaFile(path)), "UTF-8")).asInstanceOf[StructType])
    else None

  /** TableConfig from CREATE TABLE properties — same option vocabulary as
    * the format("graft") writer (TBLPROPERTIES or OPTIONS, with or without
    * Spark's `option.` prefix). */
  def configFrom(props: Map[String, String], partCols: Seq[String],
      defaultName: String): TableConfig = {
    import graft.DefaultSource._
    def p(key: String): Option[String] =
      props.get(key).orElse(props.get(s"${TableCatalog.OPTION_PREFIX}$key"))
    val keys = p(RECORDKEY_FIELD).getOrElse(throw new IllegalArgumentException(
        s"creating a graft table requires $RECORDKEY_FIELD in TBLPROPERTIES/OPTIONS"))
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val hiveStyle = p(HIVE_STYLE_PARTITIONING).forall(_.toBoolean)
    val urlEncode = p(PARTITIONPATH_URLENCODE).exists(_.toBoolean)
    // SHOW CREATE TABLE emits `PARTITIONED BY (ts)` for a timestamp-keygen
    // table (partitioning() surfaces the source column); on re-create the
    // timestamp properties must win over the identity interpretation or the
    // partition paths silently change shape
    val tsSpec = p(PARTITION_TS_COL).map(c => PartitionByTimestamp(c,
      p(PARTITION_TS_FORMAT).getOrElse("yyyy-MM-dd"),
      hiveStyle,
      p(PARTITION_TS_TYPE).getOrElse("timestamp"),
      p(PARTITION_TS_INPUT_FORMAT).getOrElse("yyyy-MM-dd")): PartitionSpec)
    val partitioning =
      if (partCols.nonEmpty)
        tsSpec.filter(_.columns == partCols)
          .getOrElse(PartitionByColumns(partCols, hiveStyle, urlEncode))
      else p(PARTITIONPATH_FIELD)
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        .filter(_.nonEmpty)
        .map(PartitionByColumns(_, hiveStyle, urlEncode): PartitionSpec)
        .orElse(tsSpec)
        .getOrElse(NonPartitioned)
    TableConfig(
      name = p(TABLE_NAME).getOrElse(defaultName),
      tableType = TableType.of(p(TABLE_TYPE).getOrElse("cow")),
      keyFields = keys,
      precombineField = p(PRECOMBINE_FIELD),
      partitioning = partitioning,
      index = p(INDEX_BUCKETS).map(n => BucketIndex(n.toInt): IndexType)
        .getOrElse(StatsIndex),
      targetFileSizeRows = p(TARGET_FILE_ROWS).getOrElse("1000000").toLong,
      payload = MergePayload.of(p(PAYLOAD).getOrElse("overwrite_latest")),
      schemaOnRead = p(SCHEMA_ON_READ).exists(_.toBoolean),
      populateMetaFields = p(POPULATE_META_FIELDS).forall(_.toBoolean),
      baseFileFormat = p(BASE_FILE_FORMAT).getOrElse("parquet").toLowerCase,
      dropPartitionColumns = p(DROP_PARTITION_COLUMNS).exists(_.toBoolean))
  }
}
