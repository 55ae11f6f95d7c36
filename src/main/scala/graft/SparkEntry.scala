package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full lakehouse write→upsert→snapshot cycle on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    table.LakeQueries.lakeUpsertSnapshot(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.AnalyticsQueries.all ++
    operators.AnalyticsQueries2.all ++
    operators.AnalyticsQueries3.all ++
    operators.EventQueries.all ++
    table.LakeQueries.all ++
    pipeline.PipelineQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.AnalyticsQueries.oracles ++
    operators.AnalyticsQueries2.oracles ++
    operators.AnalyticsQueries3.oracles ++
    operators.EventQueries.oracles ++
    table.LakeQueries.oracles ++
    pipeline.PipelineQueries.oracles
}
