package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, TextMetrics}

/**
 * Scale rehearsal for the round-5 curation operators (the gate corpus
 * tops out at 5k docs): 100k synthetic multi-line documents (~40
 * lines × ~6 words, per-source boilerplate planted) through
 * boilerplate removal, chunking, repetition stats and the samplers —
 * wall seconds per op, recorded in STATUS ("curation at 100k docs").
 */
object CurationSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toInt).getOrElse(100000)

    // deterministic multi-line docs: 40 lines of 6 hash-derived words,
    // a per-source header/footer and a 3/4-frequency ad line planted
    val word = (r: org.apache.spark.sql.Column) =>
      concat(lit("w"), pmod(r, lit(800)).cast("string"))
    val line = (i: Int) => concat_ws(" ", (0 until 6).map(j =>
      word(hash(col("doc_id"), lit(i), lit(j)))): _*)
    val body = concat_ws("\n", (0 until 40).map(line): _*)
    val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
        concat(lit("src"), pmod(col("id"), lit(20)).cast("string")).as("source"))
      .withColumn("text", concat_ws("\n",
        concat(lit("NAV "), col("source")),
        body,
        when(col("doc_id") % 4 =!= 0, lit("ad-block")).otherwise(lit("")),
        concat(lit("Copyright "), col("source"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"docs: ${docs.count()} (~${40 * 6} words each)")

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"OP $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($rows rows)")
    }
    t("boilerplate") {
      Curation.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 1000).count()
    }
    t("chunk 512/64") {
      Curation.chunkTokens(docs, "doc_id", "text", size = 512, overlap = 64).count()
    }
    t("chunk 64/8") {
      Curation.chunkTokens(docs, "doc_id", "text", size = 64, overlap = 8).count()
    }
    t("repetition") {
      docs.select(TextMetrics.repetitionStats(col("text")).as("r"))
        .filter(col("r.dup_line_frac") > 0.01).count()
    }
    t("decontaminate n=8") {
      Curation.contaminationHits(
        docs.filter(col("doc_id") % 97 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "text", n = 8).count()
    }
    t("sample temperature") {
      Curation.sampleByTemperature(docs, "doc_id", Seq("source"),
        alpha = 0.5, target = n / 10).count()
    }
    t("sample stratified") {
      Curation.sampleStratified(docs, "doc_id", Seq("source"), perGroup = 500).count()
    }
    t("pii redact") {
      Curation.redactPii(docs, "text").agg(sum("n_pii")).head(); 0L
    }
    spark.stop()
  }
}
