package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.SnowballStemmer

/**
 * Golden-diff of the Scala Snowball English stemmer against the
 * REFERENCE stemmer (third_party/snowball v3.0.1 compiled verbatim,
 * fed the vocabulary in snowball_golden.tsv: ~6,900 words incl.
 * inflected/irregular forms covering every algorithm step — plurals,
 * -ed/-ing + doubling/e-restore, y-rules, exceptions, R1-prefix words,
 * -ization/-ational chains, -ogist, short-word edge cases).
 */
class SnowballStemmerSpec extends AnyFunSuite {

  private def golden: Seq[(String, String)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/snowball_golden.tsv"), "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val Array(w, s) = line.split("\t", 2)
      (w, s)
    }.toList
    finally src.close()
  }

  test("matches the reference Snowball stemmer on the golden vocabulary") {
    val pairs = golden
    assert(pairs.size >= 100, "golden vocabulary must cover >= 100 words")
    val mismatches = pairs.collect {
      case (w, want) if SnowballStemmer.stem(w) != want =>
        s"$w: got ${SnowballStemmer.stem(w)}, want $want"
    }
    assert(mismatches.isEmpty,
      s"${mismatches.size} mismatches:\n${mismatches.take(40).mkString("\n")}")
  }

  test("stem-variant pairs collapse to one term") {
    // query-side inflections must meet index-side base forms
    for ((a, b) <- Seq("merging" -> "merge", "queries" -> "query",
        "sorted" -> "sort", "joining" -> "join", "streams" -> "stream",
        "running" -> "runs", "happiness" -> "happy"))
      assert(SnowballStemmer.stem(a) == SnowballStemmer.stem(b), s"$a vs $b")
  }
}
