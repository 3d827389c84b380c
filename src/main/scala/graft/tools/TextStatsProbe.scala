package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TextMetrics

/**
 * One-pass TextStats vs the Column-algebra formulas it replaced, as a
 * function of document LENGTH: the HOF formulation re-splits the text
 * per metric (4+ regex splits + interpreted per-token lambdas), so its
 * cost multiplies with tokens/doc, while TextStats tokenizes once.
 * The gate corpora carry ~200-word docs where scan cost hides the
 * difference; curation corpora run to tens of thousands of words.
 */
object TextStatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // the replaced formulas (kept verbatim in TextStatsFuzzSpec as the
    // semantics model; duplicated here for the timing comparison)
    def oldStopword(text: Column) = {
      val ws = split(text, "\\s+")
      when(size(ws) === 0, lit(0.0))
        .otherwise(size(filter(ws, w => w.isin(TextMetrics.Stopwords: _*))).cast("double") /
          size(ws).cast("double"))
    }
    def oldMeanLen(text: Column) = {
      val ws = split(text, "\\s+")
      when(size(ws) === 0, lit(0.0))
        .otherwise(aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
          size(ws).cast("double"))
    }
    def oldLangId(text: Column) = {
      val ws = split(text, "\\s+")
      val counts = TextMetrics.LangProfiles.map { case (lang, words) =>
        lang -> size(filter(ws, w => w.isin(words: _*)))
      }
      val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
      counts.foldRight(lit("unknown")) { case ((lang, cnt), els) =>
        when(cnt === best && best > 0, lit(lang)).otherwise(els)
      }
    }
    def oldNTokens(text: Column) =
      when(length(text) === 0, lit(0.0))
        .otherwise(size(split(text, "\\s+")).cast("double"))

    Seq((50000, 200), (5000, 2000), (500, 20000)).foreach { case (nDocs, words) =>
      val docs = spark.range(nDocs.toLong).select(col("id"),
        array_join(transform(sequence(lit(0), lit(words - 1)),
          i => concat(lit("w"), pmod(col("id") * 31 + i, lit(1000)))), " ").as("text"))
        .persist()
      docs.count()
      def time(label: String)(c: => Column): Unit = {
        val f = () => docs.select(sum(crc32(c.cast("string")))).collect()
        f() // warm
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"PROBE docs=$nDocs words=$words $label p50=${ts(1)}%.2f s")
      }
      time("old_4metrics") {
        struct(oldNTokens(col("text")), oldStopword(col("text")),
          oldMeanLen(col("text")), oldLangId(col("text")))
      }
      time("new_4metrics") {
        struct(TextMetrics.tokenCountWs(col("text")),
          TextMetrics.stopwordRatio(col("text")),
          TextMetrics.meanTokenLen(col("text")), TextMetrics.langId(col("text")))
      }
      def oldGopher(text: Column) = {
        val ws2 = split(text, "\\s+")
        val wordsC = filter(ws2, w => length(w) > 0)
        val nWords = size(wordsC)
        val nW = nWords.cast("double")
        val meanLen = when(nWords === 0, lit(0.0))
          .otherwise(aggregate(wordsC, lit(0L), (a, w) => a + length(w)).cast("double") / nW)
        val symbolRatio = when(nWords === 0, lit(0.0))
          .otherwise(size(regexp_extract_all(text, lit("#|\\.\\.\\."), lit(0))).cast("double") / nW)
        val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
        val nLines = size(lines)
        val bulletFrac = when(nLines === 0, lit(0.0))
          .otherwise(size(filter(lines, l => trim(l).rlike("^[-*]"))).cast("double") / nLines.cast("double"))
        val ellipsisFrac = when(nLines === 0, lit(0.0))
          .otherwise(size(filter(lines, l => trim(l).rlike("\\.\\.\\.$"))).cast("double") / nLines.cast("double"))
        val alphaFrac = when(nWords === 0, lit(0.0))
          .otherwise(size(filter(wordsC, w => w.rlike("[a-zA-Z]"))).cast("double") / nW)
        val stopHits = size(array_intersect(
          array_distinct(transform(wordsC, w => lower(w))),
          lit(TextMetrics.GopherStops.toArray)))
        struct(nWords, meanLen, symbolRatio, bulletFrac, ellipsisFrac, alphaFrac, stopHits)
      }
      time("old_gopher") { oldGopher(col("text")) }
      time("new_gopher") { TextMetrics.gopherRules(col("text")) }
      docs.unpersist()
    }
    spark.stop()
  }
}
