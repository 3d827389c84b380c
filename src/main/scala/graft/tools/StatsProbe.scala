package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: print the optimizer size estimate (the input to
  * Parallelism.ensure/ensureBytes) for the resident enrichment and the
  * base tables — the number the widen-target heuristic keys on. */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.util.GraftSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def est(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      println(f"STATS $name%-24s est=${bytes}%s (${bytes.toDouble / 1e6}%.2f MB)")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    est("documents(raw)", docs)
    est("documents(enriched)", graft.sources.Documents.enrich(
      docs, graft.Fixtures.documentsSchema, keyExpr = Some(col("doc_id"))))
    est("lineitem(raw)", spark.read.parquet(s"$sfDir/lineitem.parquet"))
    spark.stop()
  }
}
