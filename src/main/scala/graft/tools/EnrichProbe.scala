package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model._
import graft.sources.Documents

/** Ingest-side enrichment throughput: force every text-derived column
  * over the sf documents table and time the pass (run at two commits
  * for an isolated pair — the tokenization-consolidation measurement). */
object EnrichProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    val schema = IndexSchema("ep_t", Seq(
      FieldDef("text", TextField(withSuffixTrie = true)),
      FieldDef("lang", TagField()),
      FieldDef("n_chars", NumericField)))
    def force(): Long = Documents.enrich(raw, schema)
      .select(sum(size(col("__text__tokens"))) + sum(size(col("__text__terms"))) +
        sum(length(col("__text__joined"))) + sum(size(col("__lang__tags"))))
      .collect()(0).getLong(0)
    force() // warm
    val ts = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); force(); (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"PROBE enrich_force p50=${ts(2)}%.2f s " +
      ts.map(t => f"$t%.2f").mkString("[", ",", "]"))
    spark.stop()
  }
}
