package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Analyzer

/**
 * The reference's OWN lexer test table (testing/lexer_test.cc:80-175
 * AllTokenizationTests + LongWord + EmptyStopWordsHandling), replayed
 * against [[Analyzer.tokenize]] with the test fixture's exact
 * configuration (its punctuation string incl. `_` and backtick, stop
 * words {the, and, or}). The reference's Tokenize returns ORIGINAL
 * tokens (stemming feeds a separate stem map), which is exactly
 * [[Analyzer.tokenize]]'s contract — stem variants live in termSet.
 * The InvalidUTF8 case is not replayable from a JVM String (encoding
 * validity is owned by the parquet/UTF8String layer here).
 */
class AnalyzerLexerParitySpec extends AnyFunSuite {

  private val testPunct = " \t\n\r!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
  private def cfg(punct: String = testPunct,
                  stop: Set[String] = Set("the", "and", "or"),
                  stem: Boolean = true, minStem: Int = 3): Analyzer.Config =
    Analyzer.Config(punctuation = punct.toSet, stopWords = stop,
      stem = stem, minStemSize = minStem)

  private def toks(text: String, c: Analyzer.Config): Seq[String] =
    Analyzer.tokenize(text, c).map(_.token)

  // lexer_test.cc:80-153, verbatim
  private val vectors: Seq[(String, Seq[String], Analyzer.Config, String)] = Seq(
    ("", Seq(), cfg(), "Empty string returns no words"),
    ("   \t\n!@#$%^&*()   ", Seq(), cfg(), "Only punctuation returns no words"),
    ("hello,world!this-is_a.test",
      Seq("hello", "world", "this", "is", "a", "test"), cfg(),
      "Default punctuation handling"),
    ("hello,world!this-is_a.test",
      Seq("hello", "world!this-is_a.test"), cfg(punct = " ,"),
      "Custom punctuation handling"),
    ("HELLO World miXeD", Seq("hello", "world", "mixed"),
      cfg(stem = false), "Case conversion"),
    ("hello 世界 test café", Seq("hello", "世界", "test", "café"), cfg(),
      "UTF-8 support"),
    ("a b c", Seq("a", "b", "c"), cfg(), "Single character words"),
    ("hello\tworld\ntest", Seq("hello", "world", "test"), cfg(),
      "Tabs and newlines"),
    ("running jumping", Seq("running", "jumping"), cfg(),
      "Stemming enabled (originals returned)"),
    ("running jumping", Seq("running", "jumping"), cfg(stem = false),
      "Stemming disabled"),
    ("run running", Seq("run", "running"), cfg(minStem = 10),
      "Min stem size prevents stemming"),
    ("hello🙂world", Seq("hello🙂world"), cfg(),
      "Non-ASCII punctuation handling"),
    ("the cat and dog", Seq("cat", "dog"), cfg(),
      "Stop words filtered out"),
    ("the and or", Seq(), cfg(), "All stop words filtered out"))

  test("lexer_test.cc AllTokenizationTests table, verbatim") {
    vectors.foreach { case (in, want, c, desc) =>
      assert(toks(in, c) == want, s"case: $desc (input '$in')")
    }
  }

  test("LongWord: a 1000-char token survives intact (lexer_test.cc:167)") {
    val w = "a" * 1000
    assert(toks(w, cfg()) == Seq(w))
  }

  test("EmptyStopWordsHandling: all words preserved, originals not stems (lexer_test.cc:175)") {
    val got = toks("Hello, world! TESTING 123 with-dashes and/or symbols",
      cfg(stop = Set.empty))
    assert(got == Seq("hello", "world", "testing", "123", "with",
      "dashes", "and", "or", "symbols"))
  }
}
