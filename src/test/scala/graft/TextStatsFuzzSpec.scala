package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextMetrics

/**
 * Differential fuzz for the one-pass [[graft.functions.TextStats]]
 * expression: every TextMetrics function it now backs must be
 * BIT-IDENTICAL to the original Column-algebra formulas (re-split per
 * metric + HOF lambdas), which live here as the semantics MODEL —
 * including Spark's split(limit=-1) edge semantics (leading empty
 * token under leading whitespace, trailing empties kept, "" → [""]),
 * code-point token lengths, and byte-counted punctuation over
 * multibyte text.
 */
class TextStatsFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("text-stats-fuzz")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = ()

  // ---- the ORIGINAL formulas (the model) ----
  private def mTokenCountWs(text: org.apache.spark.sql.Column) =
    when(length(text) === 0, lit(0.0))
      .otherwise(size(split(text, "\\s+")).cast("double"))
  private def mPunct(text: org.apache.spark.sql.Column) =
    when(octet_length(text) === 0, lit(0.0))
      .otherwise((octet_length(text) -
        octet_length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))).cast("double") /
        octet_length(text))
  private def mStopword(text: org.apache.spark.sql.Column) = {
    val ws = split(text, "\\s+")
    when(size(ws) === 0, lit(0.0))
      .otherwise(size(filter(ws, w => w.isin(TextMetrics.Stopwords: _*))).cast("double") /
        size(ws).cast("double"))
  }
  private def mMeanLen(text: org.apache.spark.sql.Column) = {
    val ws = split(text, "\\s+")
    when(size(ws) === 0, lit(0.0))
      .otherwise(aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        size(ws).cast("double"))
  }
  private def mLangId(text: org.apache.spark.sql.Column) = {
    val ws = split(text, "\\s+")
    val counts = TextMetrics.LangProfiles.map { case (lang, words) =>
      lang -> size(filter(ws, w => w.isin(words: _*)))
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("unknown")) { case ((lang, cnt), els) =>
      when(cnt === best && best > 0, lit(lang)).otherwise(els)
    }
  }

  test("TextStats-backed metrics ≡ original Column formulas on 2000 fuzz cases + edges") {
    val rnd = new scala.util.Random(42)
    val vocab = Array("the", "and", "der", "die", "el", "de", "le", "les",
      "zai", "shi", "hello", "WORLD", "a", "punct!!!", "...", "§ü€漢字",
      "x" * 30, "", "1234", "mixed123abc", "\t", "  ")
    def randDoc(): String = {
      val n = rnd.nextInt(30)
      val sep = () => if (rnd.nextBoolean()) " " else Seq("  ", "\n", "\t", " \r ")(rnd.nextInt(4))
      val sb = new StringBuilder
      if (rnd.nextBoolean()) sb.append(sep())
      (0 until n).foreach { i =>
        if (i > 0) sb.append(sep())
        sb.append(vocab(rnd.nextInt(vocab.length)))
      }
      if (rnd.nextBoolean()) sb.append(sep())
      sb.toString
    }
    val edges = Seq("", " ", "   ", "\t\n", "the", " the ", "a b  c",
      "漢字 漢字", "ü", "de de de", "el de la", null)
    val docs = (edges ++ (1 to 2000).map(_ => randDoc())).zipWithIndex
    val sp = spark; import sp.implicits._
    val df = docs.map { case (t, i) => (i, t) }.toDF("id", "t")

    val out = df.select(col("id"),
      TextMetrics.tokenCountWs(col("t")).as("n_new"), mTokenCountWs(col("t")).as("n_old"),
      TextMetrics.punctRatio(col("t")).as("p_new"), mPunct(col("t")).as("p_old"),
      TextMetrics.stopwordRatio(col("t")).as("s_new"), mStopword(col("t")).as("s_old"),
      TextMetrics.meanTokenLen(col("t")).as("m_new"), mMeanLen(col("t")).as("m_old"),
      TextMetrics.langId(col("t")).as("l_new"), mLangId(col("t")).as("l_old"),
      TextMetrics.qualityScore(col("t")).as("q_new"))
      .collect()

    out.foreach { r =>
      val id = r.getInt(0)
      def eq(a: Any, b: Any, what: String): Unit =
        assert(a == b, s"doc $id $what: new=$a old=$b text=${docs(id)._1}")
      eq(r.get(1), r.get(2), "tokenCountWs")
      eq(r.get(3), r.get(4), "punctRatio")
      eq(r.get(5), r.get(6), "stopwordRatio")
      eq(r.get(7), r.get(8), "meanTokenLen")
      eq(r.get(9), r.get(10), "langId")
    }
  }

  // the ORIGINAL gopherRules HOF bundle (the model)
  private def mGopher(text: org.apache.spark.sql.Column,
                      minWords: Int = 50, maxWords: Int = 100000) = {
    val words = filter(split(text, "\\s+"), w => length(w) > 0)
    val nWords = size(words)
    val nW = nWords.cast("double")
    val meanLen = when(nWords === 0, lit(0.0))
      .otherwise(aggregate(words, lit(0L), (a, w) => a + length(w)).cast("double") / nW)
    val symbolRatio = when(nWords === 0, lit(0.0))
      .otherwise(size(regexp_extract_all(text, lit("#|\\.\\.\\."), lit(0)))
        .cast("double") / nW)
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val nLines = size(lines)
    val bulletFrac = when(nLines === 0, lit(0.0))
      .otherwise(size(filter(lines, l => trim(l).rlike("^[-*]"))).cast("double") /
        nLines.cast("double"))
    val ellipsisFrac = when(nLines === 0, lit(0.0))
      .otherwise(size(filter(lines, l => trim(l).rlike("\\.\\.\\.$"))).cast("double") /
        nLines.cast("double"))
    val alphaFrac = when(nWords === 0, lit(0.0))
      .otherwise(size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("double") / nW)
    val stopHits = size(array_intersect(
      array_distinct(transform(words, w => lower(w))),
      lit(TextMetrics.GopherStops.toArray)))
    val pass = nWords >= minWords && nWords <= maxWords &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      symbolRatio <= 0.1 && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
      alphaFrac >= 0.8 && stopHits >= 2
    struct(
      nWords.cast("long").as("word_count"),
      round(meanLen, 6).as("mean_word_len"),
      round(symbolRatio, 6).as("symbol_word_ratio"),
      round(bulletFrac, 6).as("bullet_line_frac"),
      round(ellipsisFrac, 6).as("ellipsis_line_frac"),
      round(alphaFrac, 6).as("alpha_word_frac"),
      stopHits.cast("long").as("stop_word_hits"),
      pass.as("pass"))
  }

  test("gopherRules over GopherCounts ≡ original HOF bundle on 1200 fuzz cases + edges") {
    val rnd = new scala.util.Random(7)
    val words = Array("the", "THE", "and", "That", "have", "with", "be",
      "word", "##tag", "...", "a...b", "###", "x", "漢字", "ümlauts",
      "-dash", "*star", "....", "w" * 12)
    def randDoc(): String = {
      val nLines = rnd.nextInt(6)
      (0 until nLines).map { _ =>
        val lead = Seq("", " ", "- ", "* ", "  - ")(rnd.nextInt(5))
        val tail = Seq("", "...", " ...", ".", " ")(rnd.nextInt(5))
        val n = rnd.nextInt(12)
        lead + (0 until n).map(_ => words(rnd.nextInt(words.length)))
          .mkString(" ") + tail
      }.mkString("\n")
    }
    val edges = Seq("", "\n\n", "   \n  ", "- only bullets\n* here",
      "ends in...\nhas ### the and that have", "the the the", null)
    val docs = (edges ++ (1 to 1200).map(_ => randDoc())).zipWithIndex
    val sp = spark; import sp.implicits._
    val df = docs.map { case (t, i) => (i, t) }.toDF("id", "t")
    val out = df.select(col("id"),
      TextMetrics.gopherRules(col("t"), 3, 20).as("n"),
      mGopher(col("t"), 3, 20).as("o")).collect()
    out.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"doc ${r.getInt(0)}: new=${r.get(1)} old=${r.get(2)} " +
          s"text=${docs(r.getInt(0))._1}")
    }
  }

  test("annotate runs on text_stats over a real scan (CSE dedupes the instances)") {
    // parquet-backed (a literal LocalRelation constant-folds the whole
    // projection away at optimize time)
    val df = TextMetrics.annotate(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(5), "text")
    assert(df.collect().length == 5)
    // the collapsed projection carries several syntactically-equal
    // text_stats instances; codegen subexpression elimination
    // evaluates the tokenization once per row
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("text_stats"), plan.take(500))
  }
}
