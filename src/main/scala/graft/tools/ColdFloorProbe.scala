package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{SearchEngine, SearchOptions}
import graft.model._
import graft.sources.Documents

/**
 * Cold first-page attribution (r12 verdict item 6): decompose the
 * 100×-corpus cold content page into (a) the RAW parquet scan floor —
 * the same filter + limit(cap+1) + count as a plain Spark job with no
 * engine anywhere — and (b) the engine's full cold searchReply (both
 * caches disabled). The difference is the engine's own overhead
 * (enrichment projections, nonce persist, page job); (a) is physics —
 * what any Spark job pays to read the corpus once.
 */
object ColdFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft-serve100x")
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    raw.count() // warm file listing/footers

    def med(label: String)(f: => Any): Unit = {
      f // warm JIT/codegen
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"FLOOR $label p50=${ts(2)}%.0f ms ${ts.map(t => f"$t%.0f").mkString("[", ",", "]")}")
    }

    // (a) the raw scan floor: same predicate class as the probe query
    // (tag equality), same cap+1 materialization bound
    med("raw_scan_count") {
      raw.filter(lower(col("lang")) === "en" && col("n_chars") >= 200)
        .limit(100001).count()
    }
    med("raw_scan_collect_page") {
      raw.filter(lower(col("lang")) === "en" && col("n_chars") >= 200)
        .limit(100001).orderBy("doc_id").limit(10).collect()
    }

    // (b) the engine's cold reply, caches off (fresh epoch per rep so
    // nothing serves from memory)
    val schema = IndexSchema("cf_t", Seq(
      FieldDef("lang", TagField()), FieldDef("n_chars", NumericField),
      FieldDef("text", TextField())))
    val e = new SearchEngine
    e.replyCacheEnabled = false
    e.baseCacheEnabled = false
    e.createIndex(schema, Documents.enrich(raw, schema,
      keyExpr = Some(col("doc_id"))))
    med("engine_cold_reply") {
      e.searchReply("cf_t", "@lang:{en} @n_chars:[200 +inf]",
        SearchOptions(limit = (0, 10)))
    }
    spark.stop()
  }
}
