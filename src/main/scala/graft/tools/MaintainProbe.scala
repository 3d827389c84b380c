package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Decompose the maintained-index first-query-after-batch cost at 100×
 * (HundredSweep's maintain_batch showed 48 s): is it the state parquet
 * scan, the enrichment (tokenization), or the search-side join shape?
 */
object MaintainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.engine.{SearchEngine, SearchOptions}
    import graft.model.{FieldDef, IndexSchema, TextField}

    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val dir = args.headOption.getOrElse("/tmp/graft-sf10x")
    val statePath = s"/tmp/graft-mstate-${math.abs(dir.hashCode)}"
    val schema = IndexSchema("documents_m", Seq(FieldDef("text", TextField())))
    def relation() = graft.streaming.Ingest.readState(spark, statePath)

    t("state_scan_count")(relation().count())
    t("state_scan_count2")(relation().count())
    val enriched = graft.sources.Documents.enrich(relation(), schema)
    t("enrich_keys_only")(enriched.select(col("__key")).count())
    t("enrich_full")(enriched.count())
    t("enrich_full2")(
      graft.sources.Documents.enrich(relation(), schema).count())

    // engine path: fresh unpersisted relation + a registered posting,
    // exactly the post-refresh state
    val e = new SearchEngine
    e.createIndex(schema, graft.sources.Documents.enrich(relation(), schema))
    val storeDir =
      java.nio.file.Files.createTempDirectory("graft-probe-store").toString
    val store = graft.text.PostingStore.init(spark,
      graft.text.PostingIndex.build(
        graft.sources.Documents.enrich(relation(), schema), schema, "text"),
      storeDir)
    e.registerPosting("documents_m", "text", store.view)
    val res = t("first_search") {
      e.search("documents_m", "@text:dup",
        SearchOptions(limit = (0, 100), noContent = true)).count()
    }
    println(s"PROBE rows=$res")
    t("second_search") {
      e.search("documents_m", "@text:dup",
        SearchOptions(limit = (0, 100), noContent = true)).count()
    }
    println("PROBE search plan:")
    e.search("documents_m", "@text:dup",
      SearchOptions(limit = (0, 100), noContent = true)).explain("formatted")
    spark.stop()
  }
}
