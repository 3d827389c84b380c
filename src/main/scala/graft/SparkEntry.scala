package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.SearchOptions

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val e = Fixtures.engine(spark, "/root/testdata/sf0.001")
    e.search("lineitem", "@l_returnflag:{A|R} @l_quantity:[10 20]",
      SearchOptions(limit = (0, 10),
        sortBy = Some(("l_extendedprice", false)),
        returnFields = Seq(("l_quantity", None), ("l_extendedprice", None))))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
