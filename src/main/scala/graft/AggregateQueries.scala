package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.SearchOptions
import graft.query.VectorParam

/**
 * FT.AGGREGATE gate queries (SURVEY §2.4-§2.6) with DuckDB oracles.
 *
 * Float discipline: aggregates of doubles are rounded on BOTH sides so
 * the driver's hash compare is insensitive to summation order (Spark
 * partial aggregation vs DuckDB's single-threaded sum differ in ulps).
 */
object AggregateQueries {

  private def eng(s: SparkSession, dir: String) = Queries.eng(s, dir)

  private val liKeySql = "concat(l_orderkey, '-', l_linenumber)"

  private def q(name: String)(fn: Queries.Q)(oracle: String): (String, Queries.Q, String) =
    (name, fn, oracle)

  private val triples: Seq[(String, Queries.Q, String)] = Seq(

    // A4/§2.5: the full reducer table over a two-key GROUPBY (TPC-H Q1 shape)
    q("a_groupby_reducers") { (s, dir) =>
      eng(s, dir).aggregate("lineitem", "*", Seq(
        "GROUPBY", "2", "@l_returnflag", "@l_linestatus",
        "REDUCE", "COUNT", "0", "AS", "n",
        "REDUCE", "SUM", "1", "@l_quantity", "AS", "sum_qty",
        "REDUCE", "AVG", "1", "@l_extendedprice", "AS", "avg_price",
        "REDUCE", "MIN", "1", "@l_discount", "AS", "min_disc",
        "REDUCE", "MAX", "1", "@l_tax", "AS", "max_tax",
        "REDUCE", "COUNT_DISTINCT", "1", "@l_orderkey", "AS", "n_orders",
        "REDUCE", "STDDEV", "1", "@l_quantity", "AS", "sd_qty",
        "SORTBY", "4", "@l_returnflag", "ASC", "@l_linestatus", "ASC"))
        .withColumn("sum_qty", round(col("sum_qty"), 2))
        .withColumn("avg_price", round(col("avg_price"), 4))
        .withColumn("sd_qty", round(col("sd_qty"), 4))
    } {
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS DOUBLE) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  min(l_discount) AS min_disc,
        |  max(l_tax) AS max_tax,
        |  CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders,
        |  round(coalesce(stddev_samp(l_quantity), 0), 4) AS sd_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1 ASC, 2 ASC""".stripMargin
    },

    // A2+A3: APPLY computed column feeding FILTER and SUM (revenue shape)
    q("a_apply_revenue") { (s, dir) =>
      eng(s, dir).aggregate("lineitem", "@l_quantity:[(0 (24]", Seq(
        "APPLY", "@l_extendedprice * (1 - @l_discount)", "AS", "rev",
        "FILTER", "@rev > 1000",
        "GROUPBY", "1", "@l_returnflag",
        "REDUCE", "COUNT", "0", "AS", "n",
        "REDUCE", "SUM", "1", "@rev", "AS", "revenue",
        "SORTBY", "2", "@l_returnflag", "ASC"))
        .withColumn("revenue", round(col("revenue"), 2))
    } {
      """SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |WHERE l_quantity > 0 AND l_quantity < 24
        |  AND l_extendedprice * (1 - l_discount) > 1000
        |GROUP BY 1 ORDER BY 1 ASC""".stripMargin
    },

    // A5: SORTBY expression keys with MAX top-k (bounded heap)
    q("a_sortby_max") { (s, dir) =>
      eng(s, dir).aggregate("lineitem", "*", Seq(
        "LOAD", "3", "@__key", "@l_extendedprice", "@l_discount",
        "APPLY", "@l_extendedprice * @l_discount", "AS", "disc_amt",
        "SORTBY", "4", "@disc_amt", "DESC", "@__key", "ASC", "MAX", "10"))
        .withColumn("disc_amt", round(col("disc_amt"), 4))
    } {
      s"""SELECT $liKeySql AS __key, l_extendedprice, l_discount,
         |  round(l_extendedprice * l_discount, 4) AS disc_amt
         |FROM lineitem
         |ORDER BY l_extendedprice * l_discount DESC, __key ASC LIMIT 10""".stripMargin
    },

    // A6: LIMIT offset pagination after sort
    q("a_limit_page") { (s, dir) =>
      eng(s, dir).aggregate("orders", "@o_orderstatus:{F}", Seq(
        "LOAD", "2", "@__key", "@o_totalprice",
        "SORTBY", "4", "@o_totalprice", "DESC", "@__key", "ASC", "MAX", "30",
        "LIMIT", "10", "20"))
    } {
      """SELECT CAST(o_orderkey AS VARCHAR) AS __key, o_totalprice
        |FROM orders WHERE lower(o_orderstatus) = 'f'
        |ORDER BY o_totalprice DESC, __key ASC LIMIT 20 OFFSET 10""".stripMargin
    },

    // §2.6 string functions over documents
    q("a_string_fns") { (s, dir) =>
      eng(s, dir).aggregate("documents", "@lang:{en}", Seq(
        "LOAD", "1", "@__key",
        "APPLY", "strlen(@text)", "AS", "len",
        "APPLY", "contains(@text, 'data')", "AS", "cnt",
        "FILTER", "@cnt >= 1",
        "APPLY", "upper(substr(@source, 0, 4))", "AS", "src4",
        "APPLY", "concat(@lang, ':', @source)", "AS", "tag",
        "SORTBY", "2", "@__key", "ASC", "MAX", "200",
        "LIMIT", "0", "200"))
    } {
      """SELECT CAST(doc_id AS VARCHAR) AS __key,
        |  CAST(strlen(text) AS DOUBLE) AS len,
        |  CAST((strlen(text) - strlen(replace(text, 'data', ''))) / 4 AS DOUBLE) AS cnt,
        |  upper(substr(source, 1, 4)) AS src4,
        |  concat(lang, ':', source) AS tag
        |FROM documents
        |WHERE lower(lang) = 'en'
        |  AND strlen(text) - strlen(replace(text, 'data', '')) >= 4
        |ORDER BY __key ASC LIMIT 200""".stripMargin
    },

    // §2.6 time functions (0-based dow/month, gmtime fields)
    q("a_time_fns") { (s, dir) =>
      // hour() ROUNDS the timestamp to the hour start (value.cc
      // RoundToPeriod:800-815 — not the component extractor);
      // dayofweek stays a 0-based component
      eng(s, dir).aggregate("events", "*", Seq(
        "APPLY", "hour(@ts_sec)", "AS", "h",
        "APPLY", "dayofweek(@ts_sec)", "AS", "dow",
        "GROUPBY", "2", "@h", "@dow",
        "REDUCE", "COUNT", "0", "AS", "n",
        "REDUCE", "AVG", "1", "@value", "AS", "avg_value",
        "SORTBY", "4", "@h", "ASC", "@dow", "ASC", "MAX", "200"))
        .withColumn("avg_value", round(col("avg_value"), 4))
    } {
      """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS DOUBLE) AS h,
        |  CAST(dayofweek(ts) AS DOUBLE) AS dow,
        |  CAST(count(*) AS DOUBLE) AS n,
        |  round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1 ASC, 2 ASC LIMIT 200""".stripMargin
    },

    // GROUPBY 0 = global aggregation
    q("a_global_stats") { (s, dir) =>
      eng(s, dir).aggregate("orders", "@o_totalprice:[1000 +inf]", Seq(
        "GROUPBY", "0",
        "REDUCE", "COUNT", "0", "AS", "n",
        "REDUCE", "SUM", "1", "@o_totalprice", "AS", "total",
        "REDUCE", "AVG", "1", "@o_totalprice", "AS", "avg_price"))
        .withColumn("total", round(col("total"), 2))
        .withColumn("avg_price", round(col("avg_price"), 4))
    } {
      """SELECT CAST(count(*) AS DOUBLE) AS n,
        |  round(sum(o_totalprice), 2) AS total,
        |  round(avg(o_totalprice), 4) AS avg_price
        |FROM orders WHERE o_totalprice >= 1000""".stripMargin
    },

    // §2.5 MIN/MAX can return STRING values (dynamic Value ordering)
    q("a_minmax_string") { (s, dir) =>
      eng(s, dir).aggregate("documents", "*", Seq(
        "GROUPBY", "1", "@lang",
        "REDUCE", "MIN", "1", "@source", "AS", "src_min",
        "REDUCE", "MAX", "1", "@source", "AS", "src_max",
        "REDUCE", "COUNT", "0", "AS", "n",
        "SORTBY", "2", "@lang", "ASC"))
    } {
      """SELECT lang, min(source) AS src_min, max(source) AS src_max,
        |  CAST(count(*) AS DOUBLE) AS n
        |FROM documents GROUP BY 1 ORDER BY 1 ASC""".stripMargin
    },

    // §2.6 timefmt (strftime) as a GROUPBY key
    q("a_timefmt_groupby") { (s, dir) =>
      eng(s, dir).aggregate("events", "@event_type:{click}", Seq(
        "APPLY", "timefmt(@ts_sec, '%Y-%m-%d')", "AS", "day",
        "GROUPBY", "1", "@day",
        "REDUCE", "COUNT", "0", "AS", "n",
        "REDUCE", "SUM", "1", "@value", "AS", "total",
        "SORTBY", "2", "@day", "ASC", "MAX", "40"))
        .withColumn("total", round(col("total"), 4))
    } {
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(count(*) AS DOUBLE) AS n,
        |  round(sum(value), 4) AS total
        |FROM events WHERE lower(event_type) = 'click'
        |GROUP BY 1 ORDER BY 1 ASC""".stripMargin
    },

    // A7+P12: hybrid KNN front-end feeding GROUPBY (score pseudo-field)
    q("a_knn_groupby") { (s, dir) =>
      eng(s, dir).aggregate("embeddings_l2", "*=>[KNN 50 @vec $q AS d]", Seq(
        "GROUPBY", "1", "@label",
        "REDUCE", "COUNT", "0", "AS", "n",
        "REDUCE", "MIN", "1", "@d", "AS", "best",
        "SORTBY", "4", "@label", "ASC", "@best", "ASC"),
        SearchOptions(params = Map("q" -> VectorParam(Queries.queryVec))))
        .withColumn("best", round(col("best"), 4))
    } {
      val vecSql = Queries.queryVec.map(v => f"$v%.3f")
        .mkString("CAST([", ", ", "] AS DOUBLE[])")
      s"""WITH knn AS (
         |  SELECT CAST(label AS DOUBLE) AS label,
         |    list_distance(CAST(embedding AS DOUBLE[]), $vecSql) ^ 2 AS d
         |  FROM embeddings
         |  ORDER BY list_distance(CAST(embedding AS DOUBLE[]), $vecSql) ASC,
         |    CAST(vec_id AS VARCHAR) ASC
         |  LIMIT 50)
         |SELECT label, CAST(count(*) AS DOUBLE) AS n, round(min(d), 4) AS best
         |FROM knn GROUP BY 1 ORDER BY 1 ASC, 3 ASC""".stripMargin
    }
  )

  def all: Map[String, Queries.Q] =
    triples.map { case (n, fn, _) => n -> fn }.toMap
  def oracles: Map[String, String] =
    triples.map { case (n, _, o) => n -> o }.toMap
}
