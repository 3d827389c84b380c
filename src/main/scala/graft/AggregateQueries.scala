package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** FT.AGGREGATE gate queries (SURVEY §2.4-§2.6) — populated with M3. */
object AggregateQueries {
  def all: Map[String, Queries.Q] = Map.empty
  def oracles: Map[String, String] = Map.empty
}
