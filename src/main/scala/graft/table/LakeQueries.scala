package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle-checked queries exercising the Graft lakehouse engine end-to-end
  * (write a physical table, run table services, read it back). Filled in as
  * SURVEY.md §2.1 lands. */
object LakeQueries {
  type Q = (SparkSession, String) => DataFrame
  val all: Map[String, Q] = Map()
  val oracles: Map[String, String] = Map()
}
