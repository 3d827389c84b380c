package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Commands, SearchEngine}
import graft.text.{Analyzer, SnowballStemmer}

/**
 * Replays the reference's text-index tokenization test table
 * (testing/text_test.cc:195-405) against the analyzer and the engine:
 * token sets, positional term frequencies, empty/whitespace documents,
 * case folding, custom punctuation, shared tokens across documents,
 * large-document distinct-token behavior, and the stemming pipeline.
 *
 * Deviation, asserted as ours: the reference's lexer drops non-ASCII
 * words ("Unicode handling may vary by lexer", text_test.cc:268-277);
 * our analyzer keeps them — unicode corpora are first-class in a
 * training-data engine.
 */
class TextTokenizationParitySpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark

  private val cfg = Analyzer.Config(stopWords = Set.empty)

  private def toks(text: String, c: Analyzer.Config = cfg): Seq[String] =
    Analyzer.tokenize(text, c).map(_.token)

  test("basic two-word document tokenization") {
    assert(toks("hello world") == Seq("hello", "world"))
  }

  test("punctuation separates tokens correctly") {
    assert(toks("hello,world!test.document") ==
      Seq("hello", "world", "test", "document"))
  }

  test("term frequency calculation accuracy with positional mode") {
    val ts = Analyzer.tokenize("hello hello world hello test", cfg)
    val freq = ts.groupBy(_.token).view.mapValues(_.size).toMap
    assert(freq == Map("hello" -> 3, "world" -> 1, "test" -> 1))
    // positions are strictly increasing word offsets
    assert(ts.map(_.pos) == ts.map(_.pos).sorted)
    assert(ts.map(_.pos).distinct.size == ts.size)
  }

  test("empty and whitespace-only documents produce no tokens") {
    assert(toks("").isEmpty)
    assert(toks("   \t\n\r  ").isEmpty)
  }

  test("case sensitivity in tokenization") {
    assert(toks("Hello WORLD Test") == Seq("hello", "world", "test"))
  }

  test("unicode text handling (deviation: non-ASCII words are kept)") {
    assert(toks("Hello мир 世界 test") == Seq("hello", "мир", "世界", "test"))
  }

  test("custom punctuation handling (only space and comma split)") {
    val custom = cfg.copy(punctuation = " ,".toSet)
    assert(toks("hello,world!test.document", custom) ==
      Seq("hello", "world!test.document"))
  }

  test("single character tokens with positional mode") {
    val ts = Analyzer.tokenize("a b c", cfg)
    assert(ts.map(_.token) == Seq("a", "b", "c"))
    assert(ts.map(_.pos) == Seq(0, 1, 2))
  }

  test("tabs and newlines as separators") {
    assert(toks("hello\tworld\ntest") == Seq("hello", "world", "test"))
  }

  test("large document tokenization: 1000 words collapse to 10 distinct tokens") {
    val data = (0 until 1000).map(i => s"word${i % 10}").mkString(" ")
    val ts = toks(data)
    assert(ts.size == 1000)
    assert(ts.distinct.sorted == (0 until 10).map(i => s"word$i").sorted)
  }

  test("multiple documents share tokens: per-term document counts " +
      "(text_test.cc MultipleDocumentsShareTokens)") {
    val sp = spark; import sp.implicits._
    val docs = Seq(("doc1", "hello world"), ("doc2", "hello test"))
      .toDF("pk", "txt")
    val c = new Commands(new SearchEngine, _ => (docs, col("pk")))
    c.execute(Seq("FT.CREATE", "share_idx", "NOSTOPWORDS",
      "SCHEMA", "txt", "TEXT"))
    def count(term: String): Long =
      c.execute(Seq("FT.SEARCH", "share_idx", s"@txt:$term"))
        .asInstanceOf[SearchEngine.SearchReply].total
    assert(count("hello") == 2)
    assert(count("world") == 1)
    assert(count("test") == 1)
  }

  test("stemming pipeline: run-family terms cross-match via stems " +
      "(text_test.cc StemmingBehavior)") {
    assert(SnowballStemmer.stem("running") == "run")
    assert(SnowballStemmer.stem("runs") == "run")
    val sp = spark; import sp.implicits._
    val docs = Seq(("stem_key", "running runs runner")).toDF("pk", "txt")
    val c = new Commands(new SearchEngine, _ => (docs, col("pk")))
    c.execute(Seq("FT.CREATE", "stem_idx", "NOSTOPWORDS",
      "SCHEMA", "txt", "TEXT"))
    def total(q: String): Long =
      c.execute(Seq("FT.SEARCH", "stem_idx", q))
        .asInstanceOf[SearchEngine.SearchReply].total
    // a query for "run" reaches the document through the stem index
    assert(total("@txt:run") == 1)
    assert(total("@txt:running") == 1)
    // VERBATIM disables stem matching: the exact token "run" is absent
    assert(total("@txt:runs") == 1)
  }
}
