package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{Commands, SearchEngine, SearchOptions}

/**
 * Decompose the ~120 ms per-request RESP serving floor: parse, plan
 * construction, and the two Spark actions (total count + page
 * collect) of searchReply, measured warm over repeated identical
 * FT.SEARCH shapes.
 */
object ServeLatencyProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val engine = new SearchEngine
    val cmds = new Commands(engine, _ => (docs, col("doc_id")))
    require(cmds.execute(Seq("FT.CREATE", "sl_idx", "SCHEMA",
      "text", "TEXT", "lang", "TAG", "n_chars", "NUMERIC")) == "OK")

    def med(label: String, reps: Int)(f: => Any): Unit = {
      f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"PROBE $label p50=${ts(ts.length / 2)}%.1f ms " +
        f"min=${ts.head}%.1f max=${ts.last}%.1f")
    }

    val q = "@text:dup @lang:{en}"
    med("searchReply_full", 20) {
      engine.searchReply("sl_idx", q, SearchOptions(limit = (0, 10), noContent = true))
    }
    // every call a NEW page of one filter: reply miss, filtered-base hit
    var off = 0
    med("searchReply_page_variant_nocontent", 20) {
      off = (off + 10) % 200
      engine.searchReply("sl_idx", q, SearchOptions(limit = (off, 10), noContent = true))
    }
    var off2 = 0
    med("searchReply_page_variant_content", 20) {
      off2 = (off2 + 10) % 200
      engine.searchReply("sl_idx", q, SearchOptions(limit = (off2, 10)))
    }
    // uncached floors (both caches off): the single-action NOCONTENT
    // collect vs the persist+count+page content compute
    engine.replyCacheEnabled = false
    engine.baseCacheEnabled = false
    med("searchReply_uncached_nocontent", 10) {
      engine.searchReply("sl_idx", q, SearchOptions(limit = (0, 10), noContent = true))
    }
    med("searchReply_uncached_content", 10) {
      engine.searchReply("sl_idx", q, SearchOptions(limit = (0, 10)))
    }
    engine.replyCacheEnabled = true
    engine.baseCacheEnabled = true
    // pieces
    val (schema, rel) = engine.index("sl_idx")
    med("parse", 20) {
      graft.query.FilterParser.parse(q, Map.empty, analyzer = schema.analyzer)
    }
    val parsed = graft.query.FilterParser.parse(q, Map.empty, analyzer = schema.analyzer)
    val compiler = new graft.compile.PredicateCompiler(schema, schema.analyzer)
    med("plan_build_filter", 20) { rel.filter(compiler.compile(parsed.filter)) }
    val filtered = rel.filter(compiler.compile(parsed.filter)).limit(10001)
    med("action_count_warmcache", 20) { filtered.count() }
    med("action_collect_keys", 20) {
      filtered.select(col(schema.keyColumn)).limit(10).collect()
    }
    // a single combined action: page keys + total in ONE job via union
    val pageDf = filtered.select(col(schema.keyColumn)).limit(10)
      .withColumn("__cnt", lit(null).cast("long"))
    val cntDf = filtered.groupBy().agg(count(lit(1)).as("__cnt"))
      .select(lit(null).cast("string").as(schema.keyColumn), col("__cnt"))
    med("action_union_one_job", 20) { pageDf.unionAll(cntDf).collect() }
    spark.stop()
  }
}
