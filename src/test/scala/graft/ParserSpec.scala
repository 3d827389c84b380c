package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query._
import graft.text.{Analyzer, SnowballStemmer, Proximity}

class ParserSpec extends AnyFunSuite {

  test("match-all") {
    assert(FilterParser.parse("*").filter == MatchAll)
    assert(FilterParser.parse(" * ").filter == MatchAll)
  }

  test("numeric ranges") {
    assert(FilterParser.parse("@price:[10 100]").filter ==
      NumericRange("price", 10, true, 100, true))
    assert(FilterParser.parse("@price:[(10 100.5]").filter ==
      NumericRange("price", 10, false, 100.5, true))
    assert(FilterParser.parse("@price:[-inf (1e2]").filter ==
      NumericRange("price", Double.NegativeInfinity, true, 100, false))
    assert(FilterParser.parse("@price:[(10 +inf]").filter ==
      NumericRange("price", 10, false, Double.PositiveInfinity, true))
  }

  test("tags with prefixes and spaces") {
    assert(FilterParser.parse("@color:{blue | black}").filter ==
      TagMatch("color", Seq(TagPattern("blue", false), TagPattern("black", false))))
    assert(FilterParser.parse("@color:{black | fred*}").filter ==
      TagMatch("color", Seq(TagPattern("black", false), TagPattern("fred", true))))
    assert(FilterParser.parse("@color:{hello world | hello universe}").filter ==
      TagMatch("color", Seq(TagPattern("hello world", false), TagPattern("hello universe", false))))
  }

  test("boolean precedence: NOT > AND > OR") {
    val p = FilterParser.parse("@a:{x} @b:[1 2] | @c:{y}").filter
    assert(p == Or(Seq(
      And(Seq(TagMatch("a", Seq(TagPattern("x", false))), NumericRange("b", 1, true, 2, true))),
      TagMatch("c", Seq(TagPattern("y", false))))))
    val n = FilterParser.parse("-@a:{x} @b:[1 2]").filter
    assert(n == And(Seq(Not(TagMatch("a", Seq(TagPattern("x", false)))),
      NumericRange("b", 1, true, 2, true))))
  }

  test("parens") {
    val p = FilterParser.parse("(@a:{x} | @b:{y}) @c:[0 1]").filter
    assert(p.isInstanceOf[And])
    assert(p.asInstanceOf[And].children.head.isInstanceOf[Or])
  }

  test("text operators") {
    assert(FilterParser.parse("hello").filter == Term(None, "hello"))
    assert(FilterParser.parse("@t:hello").filter == Term(Some("t"), "hello"))
    assert(FilterParser.parse("hello*").filter == Prefix(None, "hello"))
    assert(FilterParser.parse("*hello").filter == Suffix(None, "hello"))
    assert(FilterParser.parse("*hel*").filter == Infix(None, "hel"))
    assert(FilterParser.parse("%hello%").filter == Fuzzy(None, "hello", 1))
    assert(FilterParser.parse("%%hello%%").filter == Fuzzy(None, "hello", 2))
    assert(FilterParser.parse("\"hello world\"").filter == Phrase(None, Seq("hello", "world")))
    assert(FilterParser.parse("@t:\"hello world\"").filter == Phrase(Some("t"), Seq("hello", "world")))
    intercept[FilterParser.ParseError](FilterParser.parse("%%hello%"))
  }

  test("KNN clause with params") {
    val vec = Array(1.0f, 2.0f, 3.0f)
    val q = FilterParser.parse("*=>[KNN 5 @v $vec EF_RUNTIME 20 AS dist]",
      Map("vec" -> VectorParam(vec)))
    assert(q.isMatchAll)
    val knn = q.knn.get
    assert(knn.k == 5 && knn.field == "v" && knn.efRuntime.contains(20) &&
      knn.asName.contains("dist") && knn.queryVector.sameElements(vec))
    val hybrid = FilterParser.parse("@price:[10 20]=>[KNN 3 @v $vec]",
      Map("vec" -> VectorParam(vec)))
    assert(hybrid.filter == NumericRange("price", 10, true, 20, true))
  }

  test("string params substitute in bounds and tags") {
    val q = FilterParser.parse("@p:[$lo $hi] @c:{$tag}",
      Map("lo" -> StringParam("5"), "hi" -> StringParam("7"), "tag" -> StringParam("red")))
    assert(q.filter == And(Seq(NumericRange("p", 5, true, 7, true),
      TagMatch("c", Seq(TagPattern("red", false))))))
  }

  test("analyzer: punctuation split, case fold, stop words, positions") {
    assert(Analyzer.words("hello, world!") == Seq("hello", "world"))
    assert(Analyzer.words("it's a test") == Seq("it", "s", "a", "test"))
    assert(Analyzer.words("hello-world") == Seq("hello", "world"))
    assert(Analyzer.words("price: $100") == Seq("price", "100"))
    assert(Analyzer.words("hello\\,world") == Seq("hello,world"))
    // positions after stop-word removal (search-data-formats.md:255)
    assert(Analyzer.tokenize("the quick brown fox is not fast") ==
      Seq(Analyzer.Token("quick", 0), Analyzer.Token("brown", 1),
        Analyzer.Token("fox", 2), Analyzer.Token("fast", 3)))
  }

  test("porter2 stemmer on known vectors") {
    val cases = Map(
      "running" -> "run", "flies" -> "fli", "happiness" -> "happi",
      "caresses" -> "caress", "ponies" -> "poni", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "motoring" -> "motor", "sing" -> "sing", "conflated" -> "conflat",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "failing" -> "fail", "filing" -> "file",
      "generalization" -> "general", "national" -> "nation",
      "merge" -> "merg", "dying" -> "die", "news" -> "news",
      "searches" -> "search", "consign" -> "consign", "consigned" -> "consign",
      "knack" -> "knack", "knot" -> "knot")
    cases.foreach { case (in, want) =>
      assert(SnowballStemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("fuzzy distance capped by fuzzy-max-distance (filter_parser.cc:59-74)") {
    import graft.query.FilterParser
    assert(FilterParser.parse("%%%word%%%").filter
      .isInstanceOf[graft.query.Fuzzy]) // 3 = default cap, allowed
    intercept[FilterParser.ParseError] {
      FilterParser.parse("%%%%word%%%%") // 4 > default cap
    }
    // configurable, like the reference's fuzzy-max-distance flag
    assert(FilterParser.parse("%%%%word%%%%", fuzzyMaxDistance = 4).filter
      .isInstanceOf[graft.query.Fuzzy])
  }

  test("proximity slop/inorder") {
    val toks = Seq(("quick", 0), ("brown", 1), ("fox", 2), ("jumped", 3), ("dog", 4))
    def spec(w: String) = Proximity.ExactSpec(w)
    assert(Proximity.matches(toks, Seq(spec("quick"), spec("fox")), 1, true))
    assert(!Proximity.matches(toks, Seq(spec("quick"), spec("fox")), 0, true))
    assert(Proximity.matches(toks, Seq(spec("fox"), spec("quick")), 1, false))
    assert(!Proximity.matches(toks, Seq(spec("fox"), spec("quick")), 5, true))
    assert(Proximity.matches(toks, Seq(spec("quick"), spec("brown"), spec("fox")), 0, true))
    assert(!Proximity.matches(toks, Seq(spec("quick"), spec("missing")), 9, false))
  }

  test("proximity specs honor the index analyzer config (term-path agreement)") {
    import graft.query.Term
    // Custom config: "merge" is a stop word, stemming at MINSTEMSIZE 4.
    val cfg = Analyzer.Default.copy(stopWords = Set("merge", "a", "the"))
    // Term under the custom config stems exactly like the term path:
    // "sorted" matches token "sort" (same stem group under cfg) …
    val sortedSpec = Proximity.toSpec(Term(Some("text"), "sorted"), cfg)
    assert(sortedSpec.matches("sort"))
    assert(sortedSpec.matches("sorted"))
    assert(!sortedSpec.matches("value"))
    // … and a NOSTEM/VERBATIM config yields an EXACT matcher, not a
    // stem group (the round-2 bug: proximity always used Default).
    val verbatim = cfg.copy(stem = false)
    val exactSpec = Proximity.toSpec(Term(Some("text"), "sorted"), verbatim)
    assert(exactSpec.matches("sorted"))
    assert(!exactSpec.matches("sort"))
    // Unicode query words case-fold the same way the lexer does
    // (caseFold, not toLowerCase — identical on ASCII, pinned here).
    assert(Proximity.toSpec(Term(None, "SORT"), verbatim).matches("sort"))
  }

  test("query complexity cap: too many terms / too-deep nesting rejected") {
    // reference query-string-terms-count (filter_parser.cc:40-57,
    // default 1000): "Query string is too complex"
    val wide = (1 to 1001).map(i => s"w$i").mkString(" ")
    val e1 = intercept[Exception] { FilterParser.parse(wide) }
    assert(e1.getMessage.contains("too complex"))
    // adversarial deep nesting must error, not blow the parser stack
    val deep = "(" * 5000 + "term" + ")" * 5000
    val e2 = intercept[Exception] { FilterParser.parse(deep) }
    assert(e2.getMessage.contains("too complex"))
    // a large-but-legal query still parses
    val ok = (1 to 999).map(i => s"w$i").mkString(" ")
    assert(FilterParser.parse(ok).filter.isInstanceOf[graft.query.And])
    // reference query-string-bytes (default 10240): a single oversized
    // token can't slip past the terms cap
    val long = "@text:" + "a" * 10300
    val e3 = intercept[Exception] { FilterParser.parse(long) }
    assert(e3.getMessage.contains("too long"))
  }

  test("tag wildcard validation: multiple stars and short prefixes reject") {
    // reference tag.cc:66 (IsValidPrefix) and tag.cc:163-167
    // (tag-min-prefix-length, default 2 chars before the `*`)
    val multi = intercept[Exception] { FilterParser.parse("@source:{ab**}") }
    assert(multi.getMessage.contains("ends with multiple *"))
    val short1 = intercept[Exception] { FilterParser.parse("@source:{a*}") }
    assert(short1.getMessage.contains("too short for prefix wildcard"))
    // two prefix chars is the boundary: accepted
    val ok = FilterParser.parse("@source:{ab*}").filter
      .asInstanceOf[graft.query.TagMatch]
    assert(ok.patterns == Seq(graft.query.TagPattern("ab", isPrefix = true)))
    // an escaped star is a literal, not a wildcard: no validation applies
    val lit = FilterParser.parse("@source:{a\\*}").filter
      .asInstanceOf[graft.query.TagMatch]
    assert(lit.patterns == Seq(graft.query.TagPattern("a*", isPrefix = false)))
    // escaped star BEFORE the trailing wildcard still rejects:
    // tag.cc IsValidPrefix inspects the RAW last two characters, so
    // `ab\**` ends in raw `**` and is "ends with multiple *"
    val escPre = intercept[Exception] { FilterParser.parse("@source:{ab\\**}") }
    assert(escPre.getMessage.contains("ends with multiple *"))
  }

  test("KNN parameter caps: k and EF_RUNTIME reject past the reference limits") {
    val params = Map("v" -> (graft.query.VectorParam(Array(1f, 0f)): graft.query.ParamValue))
    // valid at the boundary
    assert(FilterParser.parse("*=>[KNN 10000 @vec $v]", params).knn.get.k == 10000)
    val bigK = intercept[Exception] {
      FilterParser.parse("*=>[KNN 10001 @vec $v]", params)
    }
    assert(bigK.getMessage.contains("cannot exceed 10000"))
    val zeroK = intercept[Exception] {
      FilterParser.parse("*=>[KNN 0 @vec $v]", params)
    }
    assert(zeroK.getMessage.contains("positive integer"))
    val bigEf = intercept[Exception] {
      FilterParser.parse("*=>[KNN 5 @vec $v EF_RUNTIME 1000001]", params)
    }
    assert(bigEf.getMessage.contains("EF_RUNTIME"))
    assert(FilterParser.parse("*=>[KNN 5 @vec $v EF_RUNTIME 1000000]", params)
      .knn.get.efRuntime.contains(1000000))
  }

  test("damerau-levenshtein") {
    import graft.functions.DamerauLevenshtein.distance
    assert(distance("hello", "hello") == 0)
    assert(distance("hello", "hell") == 1)
    assert(distance("hello", "ehllo") == 1) // transposition
    assert(distance("hello", "hlelo") == 1)
    assert(distance("abc", "cab") == 2)
    assert(distance("", "abc") == 3)
  }
}
