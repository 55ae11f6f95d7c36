package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The reference's Spark-SQL DML surface as a typed API
 * (ref: hudi-spark-datasource/hudi-spark/.../command/UpdateHoodieTableCommand
 * .scala, DeleteHoodieTableCommand.scala, CreateHoodieTableAsSelectCommand
 * .scala): UPDATE ... SET ... WHERE, DELETE WHERE, CTAS. Each routes through
 * the table's normal upsert/delete write path, so indexes, precombine,
 * services and the timeline all apply.
 */
object GraftSql {

  /** UPDATE t SET <assignments> WHERE <cond>: reads only the rows matching
    * the predicate (partition + stats pruning apply via the snapshot scan's
    * pushed filters), applies the assignments, upserts them back.
    *
    * All assignment expressions are evaluated against the OLD row in one
    * projection — SQL UPDATE semantics — so `SET a = b, b = a` swaps
    * (sequential withColumn would make later assignments read earlier
    * ones' results, nondeterministically ordered by Map iteration). */
  def update(t: GraftTable, assignments: Map[String, Column], where: Column): String = {
    val matched = t.snapshot().filter(where)
    val existing = matched.columns.map { c =>
      assignments.get(c).map(_.as(c)).getOrElse(col(c))
    }.toSeq
    val added = (assignments.keySet -- matched.columns).toSeq.sorted
      .map(c => assignments(c).as(c)) // SET of a new column = schema evolution
    val updated = matched.select(existing ++ added: _*)
    t.upsert(updated.drop(GraftTable.COMMIT, GraftTable.KEY, GraftTable.PART))
  }

  /** DELETE FROM t WHERE <cond>. */
  def deleteWhere(t: GraftTable, where: Column): String = {
    val doomed = t.snapshot().filter(where)
      .drop(GraftTable.COMMIT, GraftTable.KEY, GraftTable.PART)
    t.delete(doomed)
  }

  /** CREATE TABLE ... AS SELECT: create a table from a query result. */
  def createTableAsSelect(spark: SparkSession, path: String,
      config: TableConfig, query: DataFrame): GraftTable = {
    val t = GraftTable.create(spark, path, config)
    t.bulkInsert(query)
    t
  }

  /** Hive-sync-style catalog registration (ref: hudi-sync/hudi-hive-sync
    * HiveSyncTool): register `<name>` + `<name>_rt` (snapshot) and
    * `<name>_ro` (read-optimized) views so plain `spark.sql` queries the
    * table by name — the same rt/ro pair hive-sync exposes for MOR tables.
    * Re-run after commits to pick up new file slices (hive-sync likewise
    * re-syncs partitions per commit). */
  def syncViews(t: GraftTable, name: String): Unit = {
    t.snapshot().createOrReplaceTempView(name)
    t.snapshot().createOrReplaceTempView(s"${name}_rt")
    t.readOptimized().createOrReplaceTempView(s"${name}_ro")
  }

  /** show_savepoints (ref: ShowSavepointsProcedure). */
  def showSavepoints(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    t.timeline.refresh() // must observe other writers' commits
    t.timeline.metas(None).filter(_.action == "savepoint")
      .map(m => (m.instant, m.extra.getOrElse("saved", "")))
      .toDF("savepoint_instant", "saved_data_instant")
  }

  /** commits_compare (ref: CommitsCompareProcedure): instants present in
    * one table's timeline but not the other's. */
  def commitsCompare(a: GraftTable, b: GraftTable): DataFrame = {
    import a.spark.implicits._
    a.timeline.refresh(); b.timeline.refresh() // cross-writer read
    val ai = a.timeline.completed().map(_._1).toSet
    val bi = b.timeline.completed().map(_._1).toSet
    ((ai -- bi).toSeq.sorted.map(i => (i, "only_left")) ++
      (bi -- ai).toSeq.sorted.map(i => (i, "only_right")))
      .toDF("instant", "presence")
  }
}
