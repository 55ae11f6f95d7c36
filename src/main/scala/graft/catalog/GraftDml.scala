package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{ResolvedIdentifier, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And => CatAnd, Attribute, AttributeReference, EqualTo => CatEqualTo,
  ExprId, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.table._

/**
 * Analyzer rule (injected by `GraftExtensions`) that turns SQL statements
 * against catalog-identified Graft tables into Graft operations — the
 * Spark-first counterpart of the reference's command conversions (ref:
 * hudi-spark-datasource/hudi-spark/src/main/scala/org/apache/spark/sql/hudi/
 * analysis/HoodieAnalysis.scala:66, MergeIntoHoodieTableCommand.scala:62,
 * UpdateHoodieTableCommand.scala, DeleteHoodieTableCommand.scala,
 * InsertIntoHoodieTableCommand.scala):
 *
 *  - `SELECT ... FROM graft.t` → the format("graft") relation (native
 *    parquet fast path with plan-time file skipping when eligible)
 *  - `INSERT INTO graft.t ...` → insert, or upsert when the table has a
 *    precombine field (the reference's sql-insert-into-upsert behavior)
 *  - `INSERT OVERWRITE graft.t [PARTITION ...]` → insert_overwrite(_table)
 *  - `UPDATE graft.t SET ... WHERE ...` / `DELETE FROM graft.t WHERE ...`
 *  - `MERGE INTO graft.t USING src ON ... WHEN ...` → one atomic merge
 *    commit (see [[GraftMergeCommand]])
 *  - `CREATE TABLE graft.t ... AS SELECT ...` → create + bulk_insert
 *
 * Runs post-hoc (after resolution, before capability checks), so
 * [[GraftV2Table]] never needs Spark's generic V2 scan/write machinery.
 */
class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftDml._

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformDown {
    case m: MergeIntoTable if m.resolved =>
      graftTarget(m.targetTable).map { case (gt, tOut) =>
        require(gt.asOf.isEmpty, "cannot MERGE into a time-travel relation")
        require(!gt.readOptimized, "cannot MERGE into a read-optimized view")
        require(!m.withSchemaEvolution,
          "MERGE ... WITH SCHEMA EVOLUTION is not supported on graft tables")
        GraftMergeCommand(gt.path, expandReads(spark, m.sourceTable),
          m.mergeCondition, m.matchedActions, m.notMatchedActions,
          m.notMatchedBySourceActions, tOut, m.sourceTable.output)
      }.getOrElse(m)

    case u @ UpdateTable(target, assignments, condition) if u.resolved =>
      graftTarget(target).map { case (gt, tOut) =>
        require(gt.asOf.isEmpty, "cannot UPDATE a time-travel relation")
        require(!gt.readOptimized, "cannot UPDATE a read-optimized view")
        GraftUpdateCommand(gt.path, assignments, condition, tOut)
      }.getOrElse(u)

    case d @ DeleteFromTable(target, condition) if d.resolved =>
      graftTarget(target).map { case (gt, tOut) =>
        require(gt.asOf.isEmpty, "cannot DELETE from a time-travel relation")
        require(!gt.readOptimized, "cannot DELETE from a read-optimized view")
        GraftDeleteCommand(gt.path, condition, tOut)
      }.getOrElse(d)

    case a @ AppendData(r: DataSourceV2Relation, query, _, _, _, _)
        if a.resolved && r.table.isInstanceOf[GraftV2Table] =>
      require(!r.table.asInstanceOf[GraftV2Table].readOptimized,
        "cannot INSERT into a read-optimized view")
      GraftWriteCommand(r.table.asInstanceOf[GraftV2Table].path,
        expandReads(spark, query), "append")

    case o @ OverwriteByExpression(r: DataSourceV2Relation, deleteExpr, query, _, _, _, _)
        if o.resolved && r.table.isInstanceOf[GraftV2Table] =>
      require(!r.table.asInstanceOf[GraftV2Table].readOptimized,
        "cannot INSERT OVERWRITE a read-optimized view")
      val wholeTable = deleteExpr.foldable &&
        deleteExpr.eval(null) == true
      GraftWriteCommand(r.table.asInstanceOf[GraftV2Table].path,
        expandReads(spark, query),
        if (wholeTable) "overwrite_table" else "overwrite_partitions")

    case o @ OverwritePartitionsDynamic(r: DataSourceV2Relation, query, _, _, _)
        if o.resolved && r.table.isInstanceOf[GraftV2Table] =>
      require(!r.table.asInstanceOf[GraftV2Table].readOptimized,
        "cannot INSERT OVERWRITE a read-optimized view")
      GraftWriteCommand(r.table.asInstanceOf[GraftV2Table].path,
        expandReads(spark, query), "overwrite_partitions")

    case ctas @ CreateTableAsSelect(
        ResolvedIdentifier(cat: GraftCatalog, ident), parts, query, spec: TableSpec, options, ignore, _)
        if query.resolved =>
      GraftCtasCommand(cat, ident, parts, expandReads(spark, query),
        spec.properties ++ spec.options ++ options ++
          spec.location.map(org.apache.spark.sql.connector.catalog.TableCatalog.PROP_LOCATION -> _),
        ignore)

    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftV2Table] =>
      expandRelation(spark, r)
  }
}

private[catalog] object GraftDml {

  /** Unwrap a DML target (through subquery aliases) to its graft table and
    * the output attributes DML expressions are bound to. */
  def graftTarget(plan: LogicalPlan): Option[(GraftV2Table, Seq[Attribute])] =
    plan match {
      case SubqueryAlias(_, child) => graftTarget(child).map {
        case (gt, _) => (gt, plan.output)
      }
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftV2Table] =>
        Some((r.table.asInstanceOf[GraftV2Table], r.output))
      case _ => None
    }

  /** Evaluate a stored (already-analyzed) plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.graftbridge.DatasetBridge.ofRows(spark, plan)

  /** Replace graft V2 relations inside an already-analyzed subplan (MERGE
    * source, INSERT query): analyzer passes over plans stored in command
    * fields skip analyzed subtrees, so the expansion must happen here. */
  def expandReads(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan transformDown {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftV2Table] =>
        expandRelation(spark, r)
    }

  /** The plan behind a catalog read: the typed snapshot() frame, projected
    * to the V2 relation's data-only schema with its exprIds preserved.
    * snapshot() serves eligible tables from the native GraftFileIndex
    * relation (pushdown + plan-time file skipping); MOR/evolved tables get
    * the merging DataFrame — pure Catalyst either way, so whole-stage
    * codegen never breaks at a DSv1 RDD boundary. */
  def expandRelation(spark: SparkSession, r: DataSourceV2Relation): LogicalPlan = {
    val gt = r.table.asInstanceOf[GraftV2Table]
    val path = gt.path
    val t = GraftTable.load(spark, path)
    // an `_ro`-registered identifier (CatalogSync) serves the
    // read-optimized query — base files only, the reference's RO table
    val frame = if (gt.readOptimized) t.readOptimized(gt.asOf)
                else t.snapshot(asOf = gt.asOf)
    val scan = frame.queryExecution.analyzed
    val resolver = spark.sessionState.analyzer.resolver
    Project(r.output.map { a =>
      val src = scan.output.find(o => resolver(o.name, a.name)).getOrElse(
        throw new IllegalStateException(
          s"column ${a.name} missing from graft table at $path"))
      Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier)
    }, scan)
  }

  /** Rebind a resolved DML expression for evaluation over fresh DataFrames:
    * attribute references become name-based lookups, qualified by join side
    * when target/source share names. */
  def rebind(e: Expression, targetIds: Set[ExprId], sourceIds: Set[ExprId],
      tQual: Option[String], sQual: Option[String]): Column = {
    e.foreach {
      case s: SubqueryExpression => throw new UnsupportedOperationException(
        s"subqueries are not supported in graft DML expressions: ${s.sql}")
      case _ =>
    }
    ColumnBridge.column(e.transform {
      case a: AttributeReference if targetIds(a.exprId) =>
        UnresolvedAttribute(tQual.toSeq :+ a.name)
      case a: AttributeReference if sourceIds(a.exprId) =>
        UnresolvedAttribute(sQual.toSeq :+ a.name)
    })
  }

  def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case CatAnd(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case x => Seq(x)
  }

  /** Columns DML may not assign: record keys (identity) and partition
    * sources (a row can't migrate through update — same rule as the
    * reference's key/partition validation in MergeIntoHoodieTableCommand). */
  def immutableCols(cfg: TableConfig): Set[String] =
    cfg.keyFields.toSet ++ cfg.partitioning.columns.toSet

  def assignmentName(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case other => throw new UnsupportedOperationException(
      s"only top-level column assignments are supported, got ${other.sql}")
  }
}

/** UPDATE graft.t SET ... WHERE ... — routes through GraftSql.update (one
  * pruned snapshot read of the matching rows, one upsert commit). */
case class GraftUpdateCommand(path: String, assignments: Seq[Assignment],
    condition: Option[Expression], targetOutput: Seq[Attribute])
    extends LeafRunnableCommand {
  import GraftDml._

  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.load(spark, path)
    val tIds = targetOutput.map(_.exprId).toSet
    def c(e: Expression) = rebind(e, tIds, Set.empty, None, None)
    val sets = assignments.map(a => assignmentName(a) -> c(a.value)).toMap
    val frozen = immutableCols(t.config) & sets.keySet
    require(frozen.isEmpty,
      s"UPDATE may not change record key / partition columns: ${frozen.mkString(", ")}")
    GraftSql.update(t, sets, condition.map(c).getOrElse(lit(true)))
    Seq.empty
  }
}

/** DELETE FROM graft.t WHERE ... */
case class GraftDeleteCommand(path: String, condition: Expression,
    targetOutput: Seq[Attribute]) extends LeafRunnableCommand {
  import GraftDml._

  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.load(spark, path)
    val tIds = targetOutput.map(_.exprId).toSet
    GraftSql.deleteWhere(t, rebind(condition, tIds, Set.empty, None, None))
    Seq.empty
  }
}

/** INSERT INTO / INSERT OVERWRITE a graft table. */
case class GraftWriteCommand(path: String, query: LogicalPlan, mode: String)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val df = GraftDml.ofRows(spark, query)
    val t = GraftTable.load(spark, path)
    mode match {
      // INSERT INTO semantics follow graft.sql.insert.mode (ref:
      // hoodie.sql.insert.mode, InsertIntoHoodieTableCommand): default
      // `upsert` when the table has a precombine field, else plain insert;
      // `strict` fails when any incoming key is already live (the
      // pk-table duplicate guard); `non-strict` always plain-inserts
      case "append" =>
        spark.conf.getOption("graft.sql.insert.mode")
          .map(_.toLowerCase).getOrElse(
            if (t.config.precombineField.isDefined) "upsert" else "non-strict"
          ) match {
          case "upsert" => t.upsert(df)
          case "non-strict" => t.insert(df)
          case "strict" => t.insertStrict(df)
          case other => throw new IllegalArgumentException(
            s"unknown graft.sql.insert.mode '$other' (upsert | strict | non-strict)")
        }
      case "overwrite_table" => t.insertOverwriteTable(df)
      case "overwrite_partitions" => t.insertOverwrite(df)
    }
    Seq.empty
  }
}

/** CREATE TABLE graft.t ... AS SELECT: create through the catalog, then
  * bulk_insert the query (ref: CreateHoodieTableAsSelectCommand.scala). */
case class GraftCtasCommand(catalog: GraftCatalog,
    ident: org.apache.spark.sql.connector.catalog.Identifier,
    partitions: Seq[org.apache.spark.sql.connector.expressions.Transform],
    query: LogicalPlan, properties: Map[String, String], ignoreIfExists: Boolean)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    if (catalog.tableExists(ident)) {
      if (ignoreIfExists) return Seq.empty
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
    }
    val df = GraftDml.ofRows(spark, query)
    import scala.jdk.CollectionConverters._
    // TBLPROPERTIES picks the initial file layout (with or without Spark's
    // option. prefix, like the rest of the CREATE TABLE vocabulary) —
    // validated BEFORE createTable, so a typo cannot leave an empty
    // committed table registered behind the failed CTAS
    val sortMode = properties.get(graft.DefaultSource.BULKINSERT_SORT_MODE)
      .orElse(properties.get(
        org.apache.spark.sql.connector.catalog.TableCatalog.OPTION_PREFIX +
          graft.DefaultSource.BULKINSERT_SORT_MODE))
      .getOrElse("hash")
    require(Set("hash", "global_sort")(sortMode),
      s"unknown ${graft.DefaultSource.BULKINSERT_SORT_MODE} '$sortMode' " +
        "(hash | global_sort)")
    val v2 = catalog.createTable(ident, df.schema, partitions.toArray,
      properties.asJava).asInstanceOf[GraftV2Table]
    GraftTable.load(spark, v2.path).bulkInsert(df, sortMode)
    Seq.empty
  }
}

/**
 * MERGE INTO graft.t USING src ON <key equalities> WHEN ... — executed as
 * ONE atomic merge commit.
 *
 * Like the reference (MergeIntoHoodieTableCommand.scala:62 "Only support
 * primary key based merge"), the ON condition must be a conjunction of
 * `<target column> = <source expression>` equalities covering every record
 * key field; extra target-column equalities (e.g. the partition column) are
 * honored as additional match conditions. Matching is per (key, partition)
 * — the non-global-index semantics of the typed `mergeInto` — so for a
 * partitioned table the source must carry the partition columns under the
 * table's column names (as the typed API requires).
 *
 * Execution — the snapshot is scanned ONCE per statement: source
 * full-outer-joins the latest key versions (values + routing file id +
 * liveness) on (keys, partition); the three MERGE classes fall out of the
 * join's null sides — matched (both present, target live), not-matched
 * (target absent OR tombstoned: deleted keys are insertable again),
 * not-matched-by-source (source absent, target live). When no NOT MATCHED
 * BY SOURCE clause exists, the scan prunes to candidate files by recorded
 * key ranges + blooms exactly as upsert tagging does. Each class takes its
 * FIRST matching WHEN clause (SQL order semantics); update rows inherit
 * unassigned columns from the target row. The batch carries the target's
 * file id as the routing tag, so writeBatch never re-scans the table for
 * tagging — the same single-scan discipline as the typed mergeInto — while
 * precombine and conflict detection still apply, and the whole statement
 * is one commit. Duplicate source keys resolve by precombine, as in the
 * reference.
 */
case class GraftMergeCommand(path: String, source: LogicalPlan,
    mergeCondition: Expression, matchedActions: Seq[MergeAction],
    notMatchedActions: Seq[MergeAction], notMatchedBySourceActions: Seq[MergeAction],
    targetOutput: Seq[Attribute], sourceOutput: Seq[Attribute])
    extends LeafRunnableCommand {
  import GraftDml._

  private val T = "_g_t"
  private val S = "_g_s"
  private val SEX = "_g_s_ex" // join-side existence markers (full outer)
  private val FID = "_g_fid"

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val (t, startSeen, routed) = classify(spark)
    t.writeBatch(routed, "merge", seenForConflict = Some(startSeen))
    Seq.empty
  }

  /** Build the routed write batch (data columns + [[GraftTable.DELETED]] +
    * `_g_fid` routing tag) from ONE scan of the table — exposed for the
    * plan spec that pins the single-scan property. */
  private[graft] def classify(spark: SparkSession): (GraftTable, Set[String], DataFrame) = {
    val t = GraftTable.load(spark, path)
    val cfg = t.config
    val tIds = targetOutput.map(_.exprId).toSet
    val sIds = sourceOutput.map(_.exprId).toSet
    def both(e: Expression): Column = rebind(e, tIds, sIds, Some(T), Some(S))
    val dataSchema: StructType = t.schemaAt(None)
      .orElse(GraftV2Table.storedSchema(path)).getOrElse(
        throw new IllegalStateException(s"graft table at $path has no schema"))
    val dataCols = dataSchema.fields.map(_.name).toSeq
    require(!dataCols.contains(FID), s"column name $FID is reserved")

    // ON: every conjunct <target col> = <source expr>; keys all covered
    val eqs: Seq[(String, Expression)] = splitConjuncts(mergeCondition).map {
      case CatEqualTo(a: AttributeReference, rhs)
          if tIds(a.exprId) && rhs.references.forall(r => sIds(r.exprId)) =>
        a.name -> rhs
      case CatEqualTo(lhs, a: AttributeReference)
          if tIds(a.exprId) && lhs.references.forall(r => sIds(r.exprId)) =>
        a.name -> lhs
      case other => throw new UnsupportedOperationException(
        "MERGE INTO a graft table requires the ON condition to be a " +
          s"conjunction of <target column> = <source expression>, got: ${other.sql}")
    }
    val missing = cfg.keyFields.filterNot(k => eqs.exists(_._1 == k))
    require(missing.isEmpty, "MERGE ON condition must equate every record " +
      s"key field; missing: ${missing.mkString(", ")} (as the reference requires)")

    val srcDf = ofRows(spark, source)
    val partCols = immutableCols(cfg) -- cfg.keyFields
    val missingPart = partCols.filterNot(srcDf.columns.contains)
    require(missingPart.isEmpty, "MERGE source must carry the partition " +
      s"column(s) ${missingPart.mkString(", ")} under the table's names " +
      "(matching is per key AND partition, as in the typed mergeInto)")
    // conflict watermark read BEFORE any table state (as in mergeInto)
    val startSeen = t.timeline.completed().map(_._1).toSet
    val src = srcDf.withColumn("_g_spart", cfg.partitioning.pathExpr)
      .withColumn(SEX, lit(true)).alias(S)
    // when every target row the statement can touch is source-matched,
    // prune the snapshot scan to candidate files (key ranges + blooms) via
    // a probe keyed like the table; NOT MATCHED BY SOURCE needs all rows
    val probe = {
      val keyVals = eqs.map { case (n, e) => both(e).as(n) }
      val extraParts = (partCols -- eqs.map(_._1)).toSeq.map(col)
      src.select(keyVals ++ extraParts: _*)
        .withColumn(GraftTable.KEY, cfg.keyExpr)
        .withColumn(GraftTable.PART, cfg.partitioning.pathExpr)
    }
    val tgt = t.latestVersions(
      if (notMatchedBySourceActions.isEmpty) Some(probe) else None).alias(T)
    val joinCond = (eqs.map { case (name, e) => col(s"$T.$name") === both(e) } :+
      (col(s"$T.${GraftTable.PART}") === col(s"$S._g_spart"))).reduce(_ && _)

    def actionCond(a: MergeAction): Column = (a match {
      case UpdateAction(c, _, _) => c
      case DeleteAction(c) => c
      case InsertAction(c, _) => c
      case other => throw new UnsupportedOperationException(
        s"unsupported MERGE action: $other")
    }).map(both).getOrElse(lit(true))

    def assignMap(assignments: Seq[Assignment]): Map[String, Column] =
      assignments.map(a => assignmentName(a) -> both(a.value)).toMap

    val DEL = GraftTable.DELETED
    val tFid = col(s"$T.${GraftTable.FILE_ID}")

    // ONE full-outer join; the three MERGE classes fall out of its null
    // sides. "Matched" means the key's latest version is LIVE — a
    // tombstoned key takes the not-matched (re-insert) branch, and
    // tombstones are never not-matched-by-source targets.
    val joined = src.join(tgt, joinCond, "full_outer")
    val srcEx = col(s"$S.$SEX").isNotNull
    val tgtLive = !coalesce(col(s"$T.$DEL"), lit(true))

    // Every (class, WHEN clause) pair compiles into ONE projection over the
    // join — a when-chain per output column. Classes are mutually
    // exclusive, so chain order = SQL clause order within each class gives
    // first-matching-clause-wins. No unioned per-clause branches: the plan
    // holds exactly one scan of the snapshot, evaluated once.
    val classed: Seq[(Column, MergeAction)] =
      matchedActions.map((srcEx && tgtLive) -> _) ++
      notMatchedActions.map((srcEx && !tgtLive) -> _) ++
      notMatchedBySourceActions.map((!srcEx && tgtLive) -> _)
    // per clause: (row condition, column expr, tombstone flag, routing tag)
    val compiled: Seq[(Column, StructField => Column, Column, Column)] =
      classed.map { case (classCond, a) =>
        val cond = classCond && actionCond(a)
        a match {
          case UpdateAction(_, assignments, fromStar) =>
            // UPDATE SET * assigns every column; keys are equal by the ON
            // condition and the partition path is not updated (the
            // reference's default: update.partition.path=false) — inherit
            // both from target
            val sets0 = assignMap(assignments)
            val sets = if (fromStar) sets0 -- immutableCols(cfg) else sets0
            val frozen = immutableCols(cfg) & sets.keySet
            require(frozen.isEmpty, "MERGE UPDATE may not change record key" +
              s" / partition columns: ${frozen.mkString(", ")} (rows cannot migrate)")
            (cond, (f: StructField) => sets.getOrElse(f.name, col(s"$T.${f.name}")),
              lit(false), tFid)
          case DeleteAction(_) =>
            (cond, (f: StructField) => col(s"$T.${f.name}"), lit(true), tFid)
          case InsertAction(_, assignments) =>
            val sets = assignMap(assignments)
            val unkeyed = cfg.keyFields.filterNot(sets.contains)
            require(unkeyed.isEmpty, "MERGE INSERT must assign every record " +
              s"key field; missing: ${unkeyed.mkString(", ")}")
            (cond, (f: StructField) => sets.getOrElse(f.name, lit(null).cast(f.dataType)),
              lit(false), lit(null).cast(StringType))
          case other => throw new UnsupportedOperationException(
            s"unsupported MERGE action: $other")
        }
      }
    def chain(of: ((Column, StructField => Column, Column, Column)) => Column): Column =
      compiled.foldRight(lit(null): Column) { case (t, acc) => when(t._1, of(t)).otherwise(acc) }
    val keep = compiled.map(_._1).reduce(_ || _)
    val batch = joined.filter(keep).select(
      dataSchema.fields.toSeq.map(f => chain(_._2(f)).as(f.name)) ++
        Seq(chain(_._3).as(DEL), chain(_._4).as(FID)): _*)
    // the target's file id rides into writeBatch as the routing tag (stats
    // index), so the table is never re-scanned for tagging; bucket tables
    // re-derive the tag as a pure expression
    val routed = cfg.index match {
      case StatsIndex => batch
      case BucketIndex(_) => batch.drop(FID)
    }
    (t, startSeen, routed)
  }
}
