package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{SearchEngine, SearchOptions}
import graft.model._
import graft.sources.{Documents, Layout}

/** Plan-audit for the partitioned document layouts (round-9 verdict
  * #5): writes sf0.01 documents under the tag / numeric-bucket /
  * key-prefix layouts, runs the engine queries, and prints the
  * PartitionFilters line plus files-read vs files-total per query. */
object LayoutAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout-audit").toString

    def files(path: String): Long = {
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try it.filter(p => p.toString.endsWith(".parquet")).count() finally it.close()
    }
    def partitionFilters(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
        .linesIterator.filter(_.contains("PartitionFilters")).mkString("; ").trim

    // tag layout: the engine's compiled predicate prunes natively
    Layout.saveTagPartitioned(docs, "lang", s"$tmp/bylang")
    val part = spark.read.parquet(s"$tmp/bylang")
    val tagSchema = IndexSchema("docs_lp", Seq(
      FieldDef("lang", TagField()), FieldDef("text", TextField())))
    val e1 = new SearchEngine().createIndex(tagSchema,
      Documents.enrich(part, tagSchema, keyExpr = Some(col("doc_id"))))
    val q1 = e1.search("docs_lp", "@lang:{de}",
      SearchOptions(limit = (0, 100000), noContent = true))
    println(s"TAG @lang:{de}  rows=${q1.count()}  " +
      s"filesRead=${part.filter(col("lang") === "de").select(input_file_name()).distinct().count()}" +
      s"/filesTotal=${files(s"$tmp/bylang")}")
    println(s"  ${partitionFilters(q1)}")

    // numeric bucket layout: prunes via the registered hint
    Layout.saveNumericBucketed(docs, "n_chars", 100.0, s"$tmp/bylen")
    val nb = spark.read.parquet(s"$tmp/bylen")
    val numSchema = IndexSchema("docs_nb", Seq(
      FieldDef("n_chars", NumericField), FieldDef("text", TextField())))
    val e2 = new SearchEngine().createIndex(numSchema,
      Documents.enrich(nb, numSchema, keyExpr = Some(col("doc_id"))))
    Layout.registerHints(e2, "docs_nb", spark, s"$tmp/bylen", "n_chars")
    val q2 = e2.search("docs_nb", "@n_chars:[250 449]",
      SearchOptions(limit = (0, 100000), noContent = true))
    println(s"NUM @n_chars:[250 449]  rows=${q2.count()}  " +
      s"filesRead=${nb.filter(col("__nb").between(2, 4)).select(input_file_name()).distinct().count()}" +
      s"/filesTotal=${files(s"$tmp/bylen")}")
    println(s"  ${partitionFilters(q2)}")

    // key-prefix layout: reader-side prune predicate
    val keyed = docs.select(concat(lit("doc"), col("doc_id")).as("k"), col("text"))
    Layout.saveKeyPrefixPartitioned(keyed, "k", s"$tmp/bykey", prefixLen = 4)
    val kp = spark.read.parquet(s"$tmp/bykey")
    val q3 = kp.filter(Layout.keyPrefixPredicate(col("k"), "doc12", 4))
    println(s"KEY prefix doc12  rows=${q3.count()}  " +
      s"filesRead=${q3.select(input_file_name()).distinct().count()}" +
      s"/filesTotal=${files(s"$tmp/bykey")}")
    println(s"  ${partitionFilters(q3)}")

    // key-prefix layout through the ENGINE: PREFIX-subscribed index +
    // registerHints → the subscription itself becomes a PartitionFilter
    val keyedN = docs.select(concat(lit("doc"), col("doc_id")).as("k"),
      col("n_chars"), col("text"))
    Layout.saveKeyPrefixPartitioned(keyedN, "k", s"$tmp/bykeyN", prefixLen = 4)
    val kpN = spark.read.parquet(s"$tmp/bykeyN")
    val e3 = new SearchEngine()
    val cmds = new graft.engine.Commands(e3, _ => (kpN, col("k")))
    cmds.execute(Seq("FT.CREATE", "docs_kp", "PREFIX", "1", "doc12",
      "SCHEMA", "n_chars", "NUMERIC"))
    Layout.registerHints(e3, "docs_kp", spark, s"$tmp/bykeyN", "k")
    val q4 = e3.search("docs_kp", "*",
      SearchOptions(limit = (0, 100000), noContent = true))
    println(s"KEY ENGINE PREFIX doc12 match-all  rows=${q4.count()}  " +
      s"filesRead=${kpN.filter(col("__kp") === "doc1" && col("k").startsWith("doc12"))
        .select(input_file_name()).distinct().count()}" +
      s"/filesTotal=${files(s"$tmp/bykeyN")}")
    println(s"  ${partitionFilters(q4)}")
    spark.stop()
  }
}
