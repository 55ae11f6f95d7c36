package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-training-data pipeline operators (SURVEY.md §2.3): dedup, similarity
  * search, text analysis, multimodal plumbing. */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame
  val all: Map[String, Q] = Map()
  val oracles: Map[String, String] = Map()
}
