package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** North-star LLM-training-data pipeline operators — dedup, similarity
  * search, text analysis, multimodal plumbing. Filled in wave 3. */
object QueriesPipeline {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
}
