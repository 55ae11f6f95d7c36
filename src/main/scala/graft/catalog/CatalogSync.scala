package graft.catalog

import java.util.Collections
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Identifier
import graft.table.{GraftTable, MergeOnRead}

/**
 * Metastore sync re-expressed onto the engine's own TableCatalog (ref:
 * hudi-sync/hudi-hive-sync/src/main/java/org/apache/hudi/hive/
 * HiveSyncTool.java:133 syncHoodieTable: database auto-create, table
 * create/evolve, incremental partition registration, and the MOR
 * dual-table naming in doSync — an `_ro` read-optimized table and an
 * `_rt` snapshot table over one base path). External metastores
 * (HMS/Glue/DataHub) stay excluded as external systems; what the sync
 * DOES — make a path-based table queryable by name, with the right table
 * flavors — is re-expressed against [[GraftCatalog]].
 *
 * The reference must re-run sync after commits because Hive stores schema
 * and partition lists as metastore STATE (syncSchema / syncPartitions /
 * lastCommitTimeSynced bookkeeping, HiveSyncTool.java:247,317). This
 * catalog resolves schema, partitions, and file listings LIVE from the
 * table path at query time, so those duties collapse to a one-time O(1)
 * registration that can never drift: re-running sync is idempotent and
 * free, and there is no lastCommitTimeSynced to maintain — exactly the
 * property a 1000-writer lake wants from its catalog.
 */
object CatalogSync {

  /** Register the table at `basePath` in `catalogName` under namespace
    * `db`. COW registers `<name>`; MOR registers `<name>_rt` (snapshot)
    * and `<name>_ro` (read-optimized) like the reference's doSync.
    * `table` overrides the name (default: the table's configured name).
    * Returns the fully-qualified registered names. */
  def sync(spark: SparkSession, basePath: String, db: String,
      table: Option[String] = None,
      catalogName: String = "graft"): Seq[String] = {
    val cat = spark.sessionState.catalogManager.catalog(catalogName) match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"catalog '$catalogName' is ${other.getClass.getName}, not a GraftCatalog")
    }
    syncTo(cat, spark, basePath, db, table)
  }

  private[catalog] def syncTo(cat: GraftCatalog, spark: SparkSession,
      basePath: String, db: String, table: Option[String]): Seq[String] = {
    val t = GraftTable.load(spark, basePath)
    val name = table.getOrElse(t.config.name)
    require(name.nonEmpty, "sync needs a table name")
    val ns = db.split('.').filter(_.nonEmpty)
    // ref: HiveSyncTool HIVE_AUTO_CREATE_DATABASE (default true)
    if (ns.nonEmpty && !cat.namespaceExists(ns))
      cat.createNamespace(ns, Collections.emptyMap())
    val entries = t.config.tableType match {
      case MergeOnRead => Seq((s"${name}_rt", false), (s"${name}_ro", true))
      case _ => Seq((name, false))
    }
    entries.map { case (n, ro) =>
      cat.register(Identifier.of(ns, n), basePath, ro)
      (cat.name() +: ns :+ n).mkString(".")
    }
  }
}
