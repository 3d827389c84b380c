package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data pipeline gate queries (dedup / similarity / text
  * analysis / multimodal) — populated with M6. */
object PipelineQueries {
  def all: Map[String, Queries.Q] = Map.empty
  def oracles: Map[String, String] = Map.empty
}
