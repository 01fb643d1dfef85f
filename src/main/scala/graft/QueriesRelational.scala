package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY.md §2.7 coverage — joins, aggregations, windows, sorts, set ops,
  * streaming-analog batch ops. Filled in wave 2. */
object QueriesRelational {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
}
