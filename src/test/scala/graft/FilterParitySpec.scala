package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{SearchEngine, SearchOptions}
import graft.model._
import graft.query._
import graft.sources.Documents
import graft.text.Analyzer

/**
 * Replays the reference's filter-parser/evaluator test table
 * (testing/filter_test.cc:172-1747) through the public surface:
 * parse-accept/reject, the printed predicate-tree structure
 * (PrintPredicateTree format), and per-key evaluation over the exact
 * fixture dataset filter_test.cc:39-121 builds.
 *
 * The replay index mirrors the test schema CreateIndexSchema sets up
 * (testing/common.cc:113-121): punctuation is the default set WITHOUT
 * `?`, offsets on, NO stop words; tag fields are case-sensitive with
 * `,` separator (one case-insensitive with `@`); text_field1 carries
 * the suffix trie, text_field2 is NOSTEM.
 *
 * Two deliberate deviations from the reference, asserted as OUR
 * behavior: `*in*` infix is a supported operation (the reference
 * parses then rejects it, filter_parser.cc:745), and an unfielded
 * suffix/infix narrows to the suffix-capable fields instead of
 * requiring every text field to carry the trie.
 *
 * Field names: the reference uses `num_field_1.5`-style dotted aliases;
 * dots collide with Spark's nested-column syntax, so the replay uses
 * `_` and a direct parse assertion covers dotted field-name lexing.
 */
class FilterParitySpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark

  // common.cc:113: default punctuation minus '?'
  private val punct = ",.<>{}[]\"':;!@#$%^&*()-+=~/\\|"

  private val analyzerCfg = Analyzer.Config(
    punctuation = punct.toSet,
    stopWords = Set.empty,
    stem = true,
    minStemSize = 4,
    withOffsets = true)

  private val schema = IndexSchema("filter_parity", Seq(
    FieldDef("num_field_1_5", NumericField),
    FieldDef("num_field_2_0", NumericField),
    FieldDef("tag_field_1", TagField(separator = ",", caseSensitive = true)),
    FieldDef("tag_field_1_2", TagField(separator = ",", caseSensitive = true)),
    FieldDef("tag_field_with_space", TagField(separator = ",", caseSensitive = true)),
    FieldDef("tag_field_case_insensitive", TagField(separator = "@", caseSensitive = false)),
    FieldDef("text_field1", TextField(withSuffixTrie = true)),
    FieldDef("text_field2", TextField(noStem = true))),
    analyzer = analyzerCfg)

  private lazy val engine: SearchEngine = {
    val sp = spark; import sp.implicits._
    val testData = "word hello my name is hello how are you doing?"
    // (key, num1.5, num2.0, tag1, tag12, tagSpace, tagCI, text1, text2)
    val docs = Seq(
      ("key1", Some(1.5), Some(2.0), Some("tag1"), Some("tag2,tag1"),
        Some("tag 1 ,tag 2"), Some("tag1"), Some(testData), Some(testData)),
      ("key_pipe", None, None, Some("a|b"), None, None, None, None, None),
      ("key_backslash_pipe", None, None, Some("a\\|b"), None, None, None, None, None),
      ("key_backslash", None, None, Some("a\\"), None, None, None, None, None),
      ("key_brace", None, None, Some("a}b"), None, None, None, None, None),
      ("missing_key2", None, None, None, None, None, None, None, None))
      .toDF("__key", "num_field_1_5", "num_field_2_0", "tag_field_1",
        "tag_field_1_2", "tag_field_with_space", "tag_field_case_insensitive",
        "text_field1", "text_field2")
      .asInstanceOf[org.apache.spark.sql.DataFrame]
    new SearchEngine().createIndex(schema, Documents.enrich(docs, schema))
  }

  // ---- PrintPredicateTree-format renderer over our Predicate tree ----

  private val textMask = Map("text_field1" -> 1, "text_field2" -> 2)
  private def mask(field: Option[String]): Int =
    field.map(textMask).getOrElse(3)
  private def fold(w: String): String = Analyzer.asciiLower(w)

  private def printTree(p: Predicate, indent: Int = 0): String = {
    val pad = "  " * indent
    def kids(cs: Seq[Predicate], tag: String): String =
      s"$pad$tag{\n" + cs.map(printTree(_, indent + 1)).mkString + s"$pad}\n"
    p match {
      case NumericRange(f, _, _, _, _) => s"${pad}NUMERIC($f)\n"
      case TagMatch(f, _) => s"${pad}TAG($f)\n"
      case Term(f, w) => s"${pad}TEXT-TERM(\"${fold(w)}\", field_mask=${mask(f)})\n"
      case Prefix(f, w) => s"${pad}TEXT-PREFIX(\"${fold(w)}\", field_mask=${mask(f)})\n"
      case Suffix(f, w) => s"${pad}TEXT-SUFFIX(\"${fold(w)}\", field_mask=${mask(f)})\n"
      case Infix(f, w) => s"${pad}TEXT-INFIX(\"${fold(w)}\", field_mask=${mask(f)})\n"
      case Fuzzy(f, w, d) =>
        s"${pad}TEXT-FUZZY(\"${fold(w)}\", distance=$d, field_mask=${mask(f)})\n"
      case Phrase(f, words) =>
        s"${pad}AND(slop=0, inorder=true){\n" + words.map(w =>
          s"$pad  TEXT-TERM(\"${fold(w)}\", field_mask=${mask(f)})\n").mkString +
          s"$pad}\n"
      case And(cs) => kids(cs, "AND")
      case Or(cs) => kids(cs, "OR")
      case Not(c) => kids(Seq(c), "NOT")
      case MatchAll => s"${pad}MATCH-ALL\n"
      case other => s"$pad$other\n"
    }
  }

  private case class C(
      name: String,
      filter: String,
      createOk: Boolean,
      expectedError: String = "", // substring of the rejection message
      eval: Option[Boolean] = None,
      key: String = "key1",
      tree: String = "")

  private def subst(s: String): String =
    s.replace("num_field_1.5", "num_field_1_5")
      .replace("num_field_2.0", "num_field_2_0")

  private def parseOnly(filter: String): Either[Throwable, ParsedQuery] =
    try Right(FilterParser.parse(filter, Map.empty,
      FilterParser.DefaultFuzzyMaxDistance, analyzerCfg))
    catch { case e: Throwable => Left(e) }

  private def matchedKeys(filter: String): Either[Throwable, Set[String]] =
    try Right(engine.search("filter_parity", filter,
        SearchOptions(limit = (0, 50), noContent = true))
      .collect().map(_.getString(0)).toSet)
    catch { case e: Throwable => Left(e) }

  private def exercise(c: C): Unit = {
    val f = subst(c.filter)
    val parsed = parseOnly(f)
    // parse-level rejections reject at create; schema-level rejections
    // (unknown field, type mismatch, no suffix trie) surface when the
    // query is bound to the index — both are the reference's
    // create_success=false. Successful creates must also execute.
    val bound = if (parsed.isLeft) parsed.map(_ => Set.empty[String])
                else matchedKeys(f)
    assert(bound.isRight == c.createOk,
      s"${c.name}: expected createOk=${c.createOk}, got $bound")
    if (!c.createOk && c.expectedError.nonEmpty)
      assert(bound.swap.toOption.get.getMessage.contains(c.expectedError),
        s"${c.name}: message ${bound.swap.toOption.get.getMessage}")
    if (c.createOk && c.tree.nonEmpty)
      assert(printTree(parsed.toOption.get.filter) == subst(c.tree),
        s"${c.name}: tree\n${printTree(parsed.toOption.get.filter)}\nvs expected\n${subst(c.tree)}")
    c.eval.foreach { want =>
      val keys = bound.toOption.get
      assert(keys.contains(c.key) == want,
        s"${c.name}: key ${c.key} membership ${keys.contains(c.key)} != $want in $keys")
    }
  }

  private val N15 = "NUMERIC(num_field_1.5)\n"
  private val N20 = "NUMERIC(num_field_2.0)\n"
  private def and(inner: String*) =
    "AND{\n" + inner.map("  " + _.stripSuffix("\n").replace("\n", "\n  ") + "\n").mkString + "}\n"
  private def or(inner: String*) =
    "OR{\n" + inner.map("  " + _.stripSuffix("\n").replace("\n", "\n  ") + "\n").mkString + "}\n"
  private def not(inner: String) =
    "NOT{\n" + "  " + inner.stripSuffix("\n").replace("\n", "\n  ") + "\n}\n"

  private val cases = Seq(
    C("numeric_happy_path_1", "@num_field_1.5:[1.0 2.0]", createOk = true,
      eval = Some(true), tree = N15),
    C("numeric_happy_path_comma_separated", "@num_field_1.5:[1.0,2.0]",
      createOk = true, eval = Some(true), tree = N15),
    C("numeric_missing_key_1", "@num_field_1.5:[1.0 2.0]", createOk = true,
      eval = Some(false), key = "missing_key2", tree = N15),
    C("numeric_happy_path_2", "@num_field_2.0:[1.5 2.5] @num_field_1.5:[1.0 2.0]",
      createOk = true, eval = Some(true), tree = and(N20, N15)),
    C("numeric_happy_path_3", "@num_field_2.0:[-1.5 2.5] @num_field_1.5:[-1.0 2.0]",
      createOk = true, eval = Some(true), tree = and(N20, N15)),
    C("numeric_happy_path_scientific_notation",
      "@num_field_2.0:[1.0 1e2] @num_field_1.5:[1e0 1.5]",
      createOk = true, eval = Some(true), tree = and(N20, N15)),
    C("numeric_happy_path_scientific_notation_negative",
      "@num_field_2.0:[1e-2 1e+2] @num_field_1.5:[-1e2 1.5] @num_field_1.5:[-1e-2 1.5]",
      createOk = true, eval = Some(true), tree = and(N20, N15, N15)),
    C("numeric_invalid_embedded_minus", "@num_field_1.5:[1-2 2.0]",
      createOk = false,
      expectedError = "Expected space or `,` between start and end values"),
    C("numeric_invalid_leading_plus", "@num_field_1.5:[+1 2.0]",
      createOk = false, expectedError = "Invalid number: "),
    C("numeric_happy_path_inclusive_1",
      "@num_field_2.0:[2 2.5] @num_field_1.5:[1.0 1.5]",
      createOk = true, eval = Some(true), tree = and(N20, N15)),
    C("numeric_invalid_range1", "@num_field_2.0:[2.8 2.5] @num_field_1.5:[1.0 1.5]",
      createOk = false,
      expectedError = "Start and end values of a numeric field indicate an empty range"),
    C("numeric_invalid_range2", "@num_field_2.0:[2.5 (2.5] @num_field_1.5:[1.0 1.5]",
      createOk = false,
      expectedError = "Start and end values of a numeric field indicate an empty range"),
    C("numeric_invalid_range3", "@num_field_2.0:[(2.5 2.5] @num_field_1.5:[1.0 1.5]",
      createOk = false,
      expectedError = "Start and end values of a numeric field indicate an empty range"),
    C("numeric_valid_range1", "@num_field_2.0:[2.5 2.5] @num_field_1.5:[1.0 1.5]",
      createOk = true, eval = Some(false), tree = and(N20, N15)),
    C("complex_nested_expression",
      "@num_field_1.5:[1.0 2.0] @num_field_2.0:[1.5 2.5] | " +
        "(@tag_field_1:{tag1} @tag_field_1_2:{tag2} | " +
        "(@num_field_1.5:[1.0 2.0] @num_field_2.0:[1.5 2.5] | " +
        "@tag_field_1:{tag1} @tag_field_1_2:{tag2} " +
        "(@num_field_1.5:[1.0 2.0] @num_field_2.0:[1.5 2.5]) ) ) " +
        "@tag_field_1:{tag1} @tag_field_1_2:{tag2} | " +
        "@num_field_1.5:[1.0 2.0] @num_field_2.0:[1.5 2.5] | " +
        "@tag_field_1:{tag1} @tag_field_1_2:{tag2}",
      createOk = true, eval = Some(true),
      tree = or(
        and(N15, N20),
        and(
          or(
            and("TAG(tag_field_1)\n", "TAG(tag_field_1_2)\n"),
            or(
              and(N15, N20),
              and("TAG(tag_field_1)\n", "TAG(tag_field_1_2)\n", and(N15, N20)))),
          "TAG(tag_field_1)\n", "TAG(tag_field_1_2)\n"),
        and(N15, N20),
        and("TAG(tag_field_1)\n", "TAG(tag_field_1_2)\n"))),
    C("numeric_happy_path_inclusive_2",
      "@num_field_2.0:[1 2] @num_field_1.5:[1.0 1.5]",
      createOk = true, eval = Some(true), tree = and(N20, N15)),
    C("numeric_happy_path_exclusive_1",
      "@num_field_2.0:[(2 2.5] @num_field_1.5:[1.0 1.5]",
      createOk = true, eval = Some(false), tree = and(N20, N15)),
    C("numeric_happy_path_exclusive_2",
      "@num_field_2.0:[1 (2.0] @num_field_1.5:[1.0 1.5]",
      createOk = true, eval = Some(false), tree = and(N20, N15)),
    C("numeric_happy_path_inf_1",
      "@num_field_2.0:[-inf 2.5] @num_field_1.5:[1.0 1.5]",
      createOk = true, eval = Some(true), tree = and(N20, N15)),
    C("numeric_happy_path_inf_2",
      " @num_field_1.5:[1.0 1.5]  @num_field_2.0:[1 +inf] ",
      createOk = true, eval = Some(true), tree = and(N15, N20)),
    C("numeric_happy_path_inf_3",
      " @num_field_1.5:[1.0 1.5]  @num_field_2.0:[1 inf] ",
      createOk = true, eval = Some(true), tree = and(N15, N20)),
    C("numeric_negate_1", " -@num_field_1.5:[1.0 1.4]  @num_field_2.0:[1 +inf] ",
      createOk = true, eval = Some(true), tree = and(not(N15), N20)),
    C("numeric_negate_twice_with_and",
      " -@num_field_1.5:[1.0 1.4]  -@num_field_2.0:[3 +inf] ",
      createOk = true, eval = Some(true), tree = and(not(N15), not(N20))),
    C("numeric_negate_twice_with_and_1",
      " -@num_field_1.5:[1.0 1.5]  -@num_field_2.0:[3 +inf] ",
      createOk = true, eval = Some(false), tree = and(not(N15), not(N20))),
    C("numeric_negate_twice_with_and_2",
      " -@num_field_1.5:[1.0 1.4]  -@num_field_2.0:[2 +inf] ",
      createOk = true, eval = Some(false), tree = and(not(N15), not(N20))),
    C("numeric_negate_twice_with_and_3",
      " -@num_field_1.5:[1.0 1.5]  -@num_field_2.0:[2 +inf] ",
      createOk = true, eval = Some(false), tree = and(not(N15), not(N20))),
    C("numeric_negate_twice_with_or_1",
      " -@num_field_1.5:[1.0 1.4] | -@num_field_2.0:[2 +inf] ",
      createOk = true, eval = Some(true), tree = or(not(N15), not(N20))),
    C("numeric_negate_twice_with_or_2",
      " -@num_field_1.5:[1.0 1.6] | -@num_field_2.0:[3 +inf] ",
      createOk = true, eval = Some(true), tree = or(not(N15), not(N20))),
    C("numeric_negate_twice_with_or_3",
      " -@num_field_1.5:[1.0 1.5] | -@num_field_2.0:[2 +inf] ",
      createOk = true, eval = Some(false), tree = or(not(N15), not(N20))),
    C("numeric_negate_2", " @num_field_1.5:[1.0 1.5]  -@num_field_2.0:[5 +inf] ",
      createOk = true, eval = Some(true), tree = and(N15, not(N20))),
    C("numeric_negate_3", " @num_field_1.5:[1.0 1.4]  @num_field_2.0:[3 +inf] ",
      createOk = true, eval = Some(false), tree = and(N15, N20)),
    C("numeric_negate_4", " -(@num_field_1.5:[1.0 1.4]  @num_field_2.0:[3 +inf]) ",
      createOk = true, eval = Some(true), tree = not(and(N15, N20))),
    C("numeric_negate_5",
      " - ( - (@num_field_1.5:[1.0 1.4]  @num_field_2.0:[3 +inf]) )",
      createOk = true, eval = Some(false), tree = not(not(and(N15, N20)))),
    C("numeric_negate_6", " -(@num_field_1.5:[1.0 1.4] | @num_field_2.0:[3 +inf]) ",
      createOk = true, eval = Some(true), tree = not(or(N15, N20))),
    C("numeric_negate_7", " -(@num_field_1.5:[1.0,2] | @num_field_2.0:[3 +inf]) ",
      createOk = true, eval = Some(false), tree = not(or(N15, N20))),
    C("numeric_happy_path_or_1", " (@num_field_1.5:[1.0 1.5])",
      createOk = true, eval = Some(true), tree = N15),
    C("numeric_happy_path_or_2", " ( (@num_field_1.5:[1.0 1.5])  )",
      createOk = true, eval = Some(true), tree = N15),
    C("numeric_happy_path_or_3",
      "(@num_field_1.5:[5.0 6.5]) | (@num_field_1.5:[1.0 1.5])",
      createOk = true, eval = Some(true), tree = or(N15, N15)),
    C("numeric_happy_path_or_4",
      "( (   (@num_field_1.5:[5.0 6.5]) | (@num_field_1.5:[1.0 1.5]) ) ) ",
      createOk = true, eval = Some(true), tree = or(N15, N15)),
    C("tag_happy_path_1", "@tag_field_1:{tag1}", createOk = true,
      eval = Some(true), tree = "TAG(tag_field_1)\n"),
    C("tag_case_sensitive_1", "@tag_field_1:{Tag1}", createOk = true,
      eval = Some(false), tree = "TAG(tag_field_1)\n"),
    C("tag_case_sensitive_2", "@tag_field_case_insensitive:{Tag1}",
      createOk = true, eval = Some(true),
      tree = "TAG(tag_field_case_insensitive)\n"),
    C("tag_case_sensitive_3", "@tag_field_case_insensitive:{Tag0|Tag1}",
      createOk = true, eval = Some(true),
      tree = "TAG(tag_field_case_insensitive)\n"),
    C("tag_case_sensitive_4", "@tag_field_case_insensitive:{Tag0@Tag5}",
      createOk = true, eval = Some(false),
      tree = "TAG(tag_field_case_insensitive)\n"),
    C("tag_missing_key_1", "@tag_field_1:{tag1}", createOk = true,
      eval = Some(false), key = "missing_key2", tree = "TAG(tag_field_1)\n"),
    C("tag_happy_path_2", "@tag_field_1:{tag1|tag2}", createOk = true,
      eval = Some(true), tree = "TAG(tag_field_1)\n"),
    C("tag_happy_path_4", "@tag_field_with_space:{tag 1|tag4}", createOk = true,
      eval = Some(true), tree = "TAG(tag_field_with_space)\n"),
    C("tag_not_found_1", "@tag_field_1:{tag3 , tag4}", createOk = true,
      eval = Some(false), tree = "TAG(tag_field_1)\n"),
    C("tag_not_found_2", "-@tag_field_with_space:{tag1|tag 2}", createOk = true,
      eval = Some(false), tree = not("TAG(tag_field_with_space)\n")),
    C("missing_closing_bracket", "@tag_field_with_space:{tag1 , tag 2",
      createOk = false, expectedError = "Missing closing TAG bracket, '}'"),
    C("left_associative_1",
      "@num_field_2.0:[23 25] @num_field_2.0:[23 25] | @num_field_2.0:[-inf 2.5]",
      createOk = true, eval = Some(true), tree = or(and(N20, N20), N20)),
    C("left_associative_2",
      "@num_field_2.0:[23 25] @num_field_2.0:[23 25] | @num_field_2.0:[23 25]",
      createOk = true, eval = Some(false), tree = or(and(N20, N20), N20)),
    C("left_associative_3",
      "@num_field_2.0:[0 2.5] @num_field_2.0:[23 25] | @num_field_2.0:[-inf 2.5]",
      createOk = true, eval = Some(true), tree = or(and(N20, N20), N20)),
    C("left_associative_4",
      "@num_field_2.0 : [23 25] @num_field_2.0:[0 2.5] | @num_field_2.0:[23 25]",
      createOk = true, eval = Some(false), tree = or(and(N20, N20), N20)),
    C("or_precedence_1",
      "@num_field_2.0 : [23 25] @num_field_2.0:[23 25] | @num_field_2.0:[0 2.5]",
      createOk = true, eval = Some(true), tree = or(and(N20, N20), N20)),
    C("or_precedence_2",
      "@num_field_2.0 : [23 25] @num_field_2.0:[23 25] | " +
        "@num_field_2.0:[0 2.5] @num_field_2.0:[0 2.5]",
      createOk = true, eval = Some(true), tree = or(and(N20, N20), and(N20, N20))),
    C("or_precedence_3",
      "@num_field_2.0 : [23 25] @num_field_2.0:[23 25] | " +
        "@num_field_2.0:[23 25] @num_field_2.0:[0 2.5]",
      createOk = true, eval = Some(false), tree = or(and(N20, N20), and(N20, N20))),
    C("or_precedence_4",
      "@num_field_2.0 : [23 25] @num_field_2.0:[23 25] | " +
        "@num_field_2.0:[0 2.5] @num_field_2.0:[23 25]",
      createOk = true, eval = Some(false), tree = or(and(N20, N20), and(N20, N20))),
    C("or_precedence_5",
      "@num_field_2.0 : [0 2.5] @num_field_2.0:[23 25] | " +
        "@num_field_2.0:[0 2.5] @num_field_2.0:[23 25]",
      createOk = true, eval = Some(false), tree = or(and(N20, N20), and(N20, N20))),
    C("or_precedence_6",
      "@num_field_2.0 : [23 25] @num_field_2.0:[0 2.5] | " +
        "@num_field_2.0:[0 2.5] @num_field_2.0:[23 25]",
      createOk = true, eval = Some(false), tree = or(and(N20, N20), and(N20, N20))),
    C("or_precedence_7",
      "@num_field_2.0 : [0 2.5] @num_field_2.0:[0 2.5] | " +
        "@num_field_2.0:[0 2.5] @num_field_2.0:[23 25]",
      createOk = true, eval = Some(true), tree = or(and(N20, N20), and(N20, N20))),
    C("exact_term", "@text_field1:word", createOk = true, eval = Some(true),
      tree = "TEXT-TERM(\"word\", field_mask=1)\n"),
    C("exact_prefix", "@text_field1:word*", createOk = true, eval = Some(true),
      tree = "TEXT-PREFIX(\"word\", field_mask=1)\n"),
    C("exact_suffix_supported", "@text_field1:*word", createOk = true,
      eval = Some(true), tree = "TEXT-SUFFIX(\"word\", field_mask=1)\n"),
    C("exact_suffix_unsupported", "@text_field2:*word", createOk = false,
      expectedError = "Field does not support suffix search"),
    // DEVIATION: the reference rejects infix ("Unsupported query
    // operation"); ours executes it against the suffix trie
    C("exact_inffix_deviation_supported", "@text_field1:*word*",
      createOk = true, eval = Some(true),
      tree = "TEXT-INFIX(\"word\", field_mask=1)\n"),
    C("exact_fuzzy1", "@text_field1:%word%", createOk = true, eval = Some(true),
      tree = "TEXT-FUZZY(\"word\", distance=1, field_mask=1)\n"),
    C("exact_fuzzy2", "@text_field1:%%word%%", createOk = true, eval = Some(true),
      tree = "TEXT-FUZZY(\"word\", distance=2, field_mask=1)\n"),
    C("exact_fuzzy3", "@text_field1:%%%word%%%", createOk = true,
      eval = Some(true),
      tree = "TEXT-FUZZY(\"word\", distance=3, field_mask=1)\n"),
    C("proximity1", "@text_field1:\"hello my name is\"", createOk = true,
      eval = Some(true),
      tree = "AND(slop=0, inorder=true){\n" +
        "  TEXT-TERM(\"hello\", field_mask=1)\n" +
        "  TEXT-TERM(\"my\", field_mask=1)\n" +
        "  TEXT-TERM(\"name\", field_mask=1)\n" +
        "  TEXT-TERM(\"is\", field_mask=1)\n" +
        "}\n"),
    C("proximity2",
      "@text_field1:hello @text_field2:my @text_field1:name @text_field2:is",
      createOk = true, eval = Some(true),
      tree = and(
        "TEXT-TERM(\"hello\", field_mask=1)\n",
        "TEXT-TERM(\"my\", field_mask=2)\n",
        "TEXT-TERM(\"name\", field_mask=1)\n",
        "TEXT-TERM(\"is\", field_mask=2)\n")),
    C("default_field_text", "Hello, how are you doing?", createOk = true,
      eval = Some(true),
      tree = and(
        "TEXT-TERM(\"hello\", field_mask=3)\n",
        "TEXT-TERM(\"how\", field_mask=3)\n",
        "TEXT-TERM(\"are\", field_mask=3)\n",
        "TEXT-TERM(\"you\", field_mask=3)\n",
        "TEXT-TERM(\"doing?\", field_mask=3)\n")),
    C("default_field_exact_phrase", "\"Hello, how are you doing?\"",
      createOk = true, eval = Some(true),
      tree = "AND(slop=0, inorder=true){\n" +
        "  TEXT-TERM(\"hello\", field_mask=3)\n" +
        "  TEXT-TERM(\"how\", field_mask=3)\n" +
        "  TEXT-TERM(\"are\", field_mask=3)\n" +
        "  TEXT-TERM(\"you\", field_mask=3)\n" +
        "  TEXT-TERM(\"doing?\", field_mask=3)\n" +
        "}\n"),
    C("default_field_exact_phrase_with_punct", "\"Hello, h(ow a)re yo#u doi_n$g?\"",
      createOk = true,
      tree = "AND(slop=0, inorder=true){\n" +
        "  TEXT-TERM(\"hello\", field_mask=3)\n" +
        "  TEXT-TERM(\"h\", field_mask=3)\n" +
        "  TEXT-TERM(\"ow\", field_mask=3)\n" +
        "  TEXT-TERM(\"a\", field_mask=3)\n" +
        "  TEXT-TERM(\"re\", field_mask=3)\n" +
        "  TEXT-TERM(\"yo\", field_mask=3)\n" +
        "  TEXT-TERM(\"u\", field_mask=3)\n" +
        "  TEXT-TERM(\"doi_n\", field_mask=3)\n" +
        "  TEXT-TERM(\"g?\", field_mask=3)\n" +
        "}\n"),
    C("default_field_with_escape1",
      "\"" + """\\\\\Hello, \how \\are \\\you \\\\doing?""" + "\"",
      createOk = true,
      tree = "AND(slop=0, inorder=true){\n" +
        "  TEXT-TERM(\"" + """\\""" + "\", field_mask=3)\n" +
        "  TEXT-TERM(\"hello\", field_mask=3)\n" +
        "  TEXT-TERM(\"how\", field_mask=3)\n" +
        "  TEXT-TERM(\"" + """\are""" + "\", field_mask=3)\n" +
        "  TEXT-TERM(\"" + """\""" + "\", field_mask=3)\n" +
        "  TEXT-TERM(\"you\", field_mask=3)\n" +
        "  TEXT-TERM(\"" + """\\doing?""" + "\", field_mask=3)\n" +
        "}\n"),
    C("default_field_with_escape2",
      """\\\\\Hello, \how \\are \\\you \\\\doing?""",
      createOk = true,
      tree = and(
        "TEXT-TERM(\"" + """\\""" + "\", field_mask=3)\n",
        "TEXT-TERM(\"hello\", field_mask=3)\n",
        "TEXT-TERM(\"how\", field_mask=3)\n",
        "TEXT-TERM(\"" + """\are""" + "\", field_mask=3)\n",
        "TEXT-TERM(\"" + """\""" + "\", field_mask=3)\n",
        "TEXT-TERM(\"you\", field_mask=3)\n",
        "TEXT-TERM(\"" + """\\doing?""" + "\", field_mask=3)\n")),
    C("default_field_with_escape3", """Hel\(lo, ho\$w a\*re yo\{u do\|ing?""",
      createOk = true,
      tree = and(
        "TEXT-TERM(\"hel(lo\", field_mask=3)\n",
        "TEXT-TERM(\"ho$w\", field_mask=3)\n",
        "TEXT-TERM(\"a*re\", field_mask=3)\n",
        "TEXT-TERM(\"yo{u\", field_mask=3)\n",
        "TEXT-TERM(\"do|ing?\", field_mask=3)\n")),
    C("default_field_with_escape4",
      """\\\\\(Hello, \$how \\\*are \\\-you \\\\\%doing?""",
      createOk = true,
      tree = and(
        "TEXT-TERM(\"" + """\\(hello""" + "\", field_mask=3)\n",
        "TEXT-TERM(\"$how\", field_mask=3)\n",
        "TEXT-TERM(\"" + """\*are""" + "\", field_mask=3)\n",
        "TEXT-TERM(\"" + """\-you""" + "\", field_mask=3)\n",
        "TEXT-TERM(\"" + """\\%doing?""" + "\", field_mask=3)\n")),
    C("default_field_with_escape5", """Hello, how are you\% doing""",
      createOk = true,
      tree = and(
        "TEXT-TERM(\"hello\", field_mask=3)\n",
        "TEXT-TERM(\"how\", field_mask=3)\n",
        "TEXT-TERM(\"are\", field_mask=3)\n",
        "TEXT-TERM(\"you%\", field_mask=3)\n",
        "TEXT-TERM(\"doing\", field_mask=3)\n")),
    C("default_field_with_escape6", """Hello, how are you\\\\\% doing""",
      createOk = true,
      tree = and(
        "TEXT-TERM(\"hello\", field_mask=3)\n",
        "TEXT-TERM(\"how\", field_mask=3)\n",
        "TEXT-TERM(\"are\", field_mask=3)\n",
        "TEXT-TERM(\"" + """you\\%""" + "\", field_mask=3)\n",
        "TEXT-TERM(\"doing\", field_mask=3)\n")),
    C("default_field_with_escape_query_syntax",
      """Hello, how are you\]\[\$\}\{\;\:\)\(\| \-doing""",
      createOk = true,
      tree = and(
        "TEXT-TERM(\"hello\", field_mask=3)\n",
        "TEXT-TERM(\"how\", field_mask=3)\n",
        "TEXT-TERM(\"are\", field_mask=3)\n",
        "TEXT-TERM(\"you][$}{;:)(|\", field_mask=3)\n",
        "TEXT-TERM(\"-doing\", field_mask=3)\n")),
    // DEVIATION: the reference rejects ("Unsupported query operation",
    // infix); ours narrows the unfielded suffix to the trie-bearing
    // field and executes the infix — accepted, and `*oda*` matches
    // nothing so the whole AND evaluates false
    C("default_field_with_all_operations_deviation", "%Hllo%, how are *ou do* *oda*",
      createOk = true, eval = Some(false)),
    C("mixed_fulltext",
      "@text_field1:\"Advanced Neural Networking in plants\" | " +
        "@text_field1:Advanced @text_field2:neu* @text_field1:network" +
        "@num_field_2.0:[10 100] @text_field1:hello | " +
        "@tag_field_1:{books} @text_field2:Neural | " +
        "@text_field1:%%%word%%% @text_field2:network",
      createOk = true,
      tree = or(
        "AND(slop=0, inorder=true){\n" +
          "  TEXT-TERM(\"advanced\", field_mask=1)\n" +
          "  TEXT-TERM(\"neural\", field_mask=1)\n" +
          "  TEXT-TERM(\"networking\", field_mask=1)\n" +
          "  TEXT-TERM(\"in\", field_mask=1)\n" +
          "  TEXT-TERM(\"plants\", field_mask=1)\n" +
          "}\n",
        and(
          "TEXT-TERM(\"advanced\", field_mask=1)\n",
          "TEXT-PREFIX(\"neu\", field_mask=2)\n",
          "TEXT-TERM(\"network\", field_mask=1)\n",
          N20,
          "TEXT-TERM(\"hello\", field_mask=1)\n"),
        and(
          "TAG(tag_field_1)\n",
          "TEXT-TERM(\"neural\", field_mask=2)\n"),
        and(
          "TEXT-FUZZY(\"word\", distance=3, field_mask=1)\n",
          "TEXT-TERM(\"network\", field_mask=2)\n"))),
    C("fuzzy_ignored_in_exact_phrase", "@text_field1:\" Advanced Neural %%%word%%%\"",
      createOk = true,
      tree = "AND(slop=0, inorder=true){\n" +
        "  TEXT-TERM(\"advanced\", field_mask=1)\n" +
        "  TEXT-TERM(\"neural\", field_mask=1)\n" +
        "  TEXT-TERM(\"word\", field_mask=1)\n" +
        "}\n"),
    C("invalid_fuzzy1", "Hello, how are you% doing", createOk = false,
      expectedError = "Invalid fuzzy '%' markers"),
    C("invalid_fuzzy2", "Hello, how are %you%% doing", createOk = false,
      expectedError = "Invalid fuzzy '%' markers"),
    C("invalid_fuzzy3", "Hello, how are %%you% doing", createOk = false,
      expectedError = "Invalid fuzzy '%' markers"),
    C("invalid_fuzzy4", "Hello, how are %%%you%%%doing%%%", createOk = false,
      expectedError = "Invalid fuzzy '%' markers"),
    C("invalid_fuzzy5", "Hello, how are %%%  %%%", createOk = false,
      expectedError = "Invalid fuzzy '%' markers"),
    C("invalid_fuzzy6", "Hello, how are %%%*%%%", createOk = false,
      expectedError = "Invalid fuzzy '%' markers"),
    C("invalid_escape1", """\\\\\(Hello, \$how \\*are \\\-you \\\\%doing?""",
      createOk = false, expectedError = "Invalid fuzzy '%' markers"),
    C("invalid_wildcard1", "Hello, how are **you* doing", createOk = false,
      expectedError = "Invalid wildcard '*' markers"),
    // reference error is "Unsupported query operation" (infix); ours
    // accepts `*you*` as infix but the dangling second `*` is still an
    // invalid wildcard token
    C("invalid_wildcard2", "Hello, how are *you** doing", createOk = false,
      expectedError = "Invalid wildcard '*' markers"),
    C("bad_filter_1", "@num_field_2.0 : [23 25] -| @num_field_2.0:[0 2.5] ",
      createOk = false, expectedError = "Unexpected character"),
    C("bad_filter_2", "@num_field_2.0 : [23 25] - | @num_field_2.0:[0 2.5] ",
      createOk = false, expectedError = "Unexpected character"),
    C("bad_filter_3", "@num_field_2.0 : [23 25] | num_field_2.0:[0 2.5] ",
      createOk = false, expectedError = "Unexpected character"),
    C("bad_filter_4", "@num_field_2.0 : [23 25] | @num_field_2.0[0 2.5] ",
      createOk = false, expectedError = "expecting `:`"),
    C("bad_filter_5", "@num_field_2.0 : [23 25] $  @num_field_2.0:[0 2.5] ",
      createOk = false),
    C("bad_filter_6", "@num_field_2.0 : [23 25]   @aa:[0 2.5] ",
      createOk = false, expectedError = "`aa`"),
    C("bad_filter_7", "@num_field_2.0 : [23 25]   @ :[0 2.5] ",
      createOk = false),
    C("bad_filter_8", "@num_field_2.0 : [23 25]   @num_field_2.0:{0 2.5] ",
      createOk = false),
    C("bad_filter_9", "@num_field_2.0 : [23 25]   @num_field_2.0:[0 2.5} ",
      createOk = false, expectedError = "Expected ']' got '}'"),
    C("bad_filter_10", "@num_field_2.0 : [23 25]   @aa:{tag1} ",
      createOk = false, expectedError = "`aa`"),
    C("bad_filter_11", "@num_field_2.0 : [23 25]   @tag_field_1:[tag1} ",
      createOk = false),
    C("bad_filter_12", "@num_field_2.0 : [23 25]   @tag_field_1:{tag1] ",
      createOk = false, expectedError = "Missing closing TAG bracket, '}'"),
    C("bad_filter_13", "hello{world", createOk = false,
      expectedError = "Unexpected character at position 6: `{`"),
    C("bad_filter_14", "hello}world", createOk = false,
      expectedError = "Unexpected character at position 6: `}`"),
    C("bad_filter_15", "hello$world", createOk = false,
      expectedError = "Unexpected character at position 6: `$`"),
    C("bad_filter_16", "hello[world", createOk = false,
      expectedError = "Unexpected character at position 6: `[`"),
    C("bad_filter_17", "hello]world", createOk = false,
      expectedError = "Unexpected character at position 6: `]`"),
    C("bad_filter_18", "hello:world", createOk = false,
      expectedError = "Unexpected character at position 6: `:`"),
    C("bad_filter_19", "hello;world", createOk = false,
      expectedError = "Unexpected character at position 6: `;`"),
    C("nested_brackets_and_1",
      "(@num_field_1.5:[1.0 2.0] @num_field_2.0:[1.0 3.0]) @tag_field_1:{tag1}",
      createOk = true, eval = Some(true),
      tree = and(and(N15, N20), "TAG(tag_field_1)\n")),
    C("nested_brackets_and_2",
      "(@num_field_1.5:[1.0 2.0] (@num_field_2.0:[1.0 3.0] " +
        "(@tag_field_1:{tag1} (@tag_field_1_2:{tag1|tag2} " +
        "(@num_field_1.5:[1.0 2.0] @num_field_2.0:[1.0 3.0]) " +
        "@tag_field_1:{tag1}))))",
      createOk = true, eval = Some(true),
      tree = and(N15, and(N20, and("TAG(tag_field_1)\n",
        and("TAG(tag_field_1_2)\n", and(N15, N20), "TAG(tag_field_1)\n"))))),
    C("nested_brackets_and_3",
      "@num_field_1.5:[1.0 2.0] (@num_field_2.0:[1.0 3.0] " +
        "(@tag_field_1:{tag1} (@tag_field_1_2:{tag1|tag2} " +
        "(@num_field_1.5:[1.0 2.0] @num_field_2.0:[1.0 3.0]))))",
      createOk = true, eval = Some(true),
      tree = and(N15, and(N20, and("TAG(tag_field_1)\n",
        and("TAG(tag_field_1_2)\n", and(N15, N20)))))),
    C("nested_brackets_or_1",
      "(@num_field_1.5:[5.0 6.0] | (@num_field_2.0:[5.0 6.0] | " +
        "(@tag_field_1:{tag2} | (@tag_field_1_2:{tag3} | " +
        "(@num_field_1.5:[1.0 2.0] | @num_field_2.0:[1.0 3.0]) | " +
        "@tag_field_1:{tag1}))))",
      createOk = true, eval = Some(true),
      tree = or(N15, or(N20, or("TAG(tag_field_1)\n",
        or("TAG(tag_field_1_2)\n", or(N15, N20), "TAG(tag_field_1)\n"))))),
    C("nested_brackets_or_2",
      "(@num_field_1.5:[5.0 6.0] | @num_field_2.0:[5.0 6.0]) | " +
        "(@tag_field_1:{tag2} | @tag_field_1_2:{tag3}) | " +
        "(@num_field_1.5:[1.0 2.0] | @num_field_2.0:[1.0 3.0])",
      createOk = true, eval = Some(true),
      tree = or(or(N15, N20), or("TAG(tag_field_1)\n", "TAG(tag_field_1_2)\n"),
        or(N15, N20))),
    C("nested_brackets_or_3",
      "(@num_field_1.5:[5.0 6.0] | @num_field_2.0:[5.0 6.0]) | " +
        "(@tag_field_1:{tag2} | @tag_field_1_2:{tag3}) | " +
        "(@num_field_1.5:[1.0 2.0] | @num_field_2.0:[1.0 3.0]) |" +
        "(@tag_field_1:{tag2} | @tag_field_1_2:{tag3}) | " +
        "(@num_field_1.5:[1.0 2.0] | @num_field_2.0:[1.0 3.0])",
      createOk = true, eval = Some(true),
      tree = or(or(N15, N20), or("TAG(tag_field_1)\n", "TAG(tag_field_1_2)\n"),
        or(N15, N20), or("TAG(tag_field_1)\n", "TAG(tag_field_1_2)\n"),
        or(N15, N20))),
    C("mixed_and_or_1",
      "@num_field_1.5:[1.0 2.0] @num_field_2.0:[1.0 3.0] " +
        "(@tag_field_1:{tag1} @tag_field_1_2:{tag1,tag2}) " +
        "@num_field_1.5:[1.0 2.0] | (@num_field_2.0:[1.0 3.0] | " +
        "@tag_field_1:{tag1})",
      createOk = true, eval = Some(true),
      tree = or(
        and(N15, N20, and("TAG(tag_field_1)\n", "TAG(tag_field_1_2)\n"), N15),
        or(N20, "TAG(tag_field_1)\n"))),
    C("mixed_and_or_2",
      "( @num_field_1.5:[5.0 6.0] (@num_field_2.0:[5.0 6.0] " +
        "(@tag_field_1:{tag2} (@tag_field_1_2:{tag3} " +
        "@num_field_1.5:[5.0 6.0]))) | ( @num_field_1.5:[1.0 2.0] " +
        "(@num_field_2.0:[1.0 3.0] (@tag_field_1:{tag1} " +
        "(@tag_field_1_2:{tag1,tag2} | @num_field_1.5:[1.0 2.0])))))",
      createOk = true, eval = Some(true),
      tree = or(
        and(N15, and(N20, and("TAG(tag_field_1)\n",
          and("TAG(tag_field_1_2)\n", N15)))),
        and(N15, and(N20, and("TAG(tag_field_1)\n",
          or("TAG(tag_field_1_2)\n", N15)))))),
    C("complex_nested_or",
      "@num_field_1.5:[5.0 6.0] | @num_field_2.0:[5.0 6.0] | " +
        "@tag_field_1:{tag2} | @tag_field_1_2:{tag3} | @num_field_1.5:[1.0 2.0]",
      createOk = true, eval = Some(true),
      tree = or(N15, N20, "TAG(tag_field_1)\n", "TAG(tag_field_1_2)\n", N15)),
    C("nested_single_brackets_1",
      "(@num_field_1.5:[1.0 2.0]) (@num_field_2.0:[1.0 3.0]) (@tag_field_1:{tag1})",
      createOk = true, eval = Some(true),
      tree = and(N15, N20, "TAG(tag_field_1)\n")),
    C("mixed_brackets_with_negation",
      "-(@num_field_1.5:[5.0 6.0] @num_field_2.0:[5.0 6.0]) | " +
        "(@tag_field_1:{tag1} @tag_field_1_2:{tag1,tag2})",
      createOk = true, eval = Some(true),
      tree = or(not(and(N15, N20)),
        and("TAG(tag_field_1)\n", "TAG(tag_field_1_2)\n"))),
    C("empty_brackets_with_content",
      "@num_field_1.5:[1.0 2.0] (@num_field_2.0:[1.0 3.0] () @tag_field_1:{tag1})",
      createOk = false, expectedError = "Empty brackets detected"),
    C("empty_brackets_with_or",
      "@num_field_1.5:[1.0 2.0] ( @num_field_2.0:[1.0 3.0] | ())",
      createOk = false, expectedError = "Empty brackets detected"),
    // rejected by the match-all pre-scan, like the reference's
    // IsMatchAllExpression (filter_parser.cc:384-421)
    C("empty_brackets_only", "()", createOk = false,
      expectedError = "Unexpected character at position 2: `)`"),
    C("or_with_missing_left_operand",
      "@num_field_1.5:[1.0 2.0] ( | @tag_field_1:{tag1})",
      createOk = false, expectedError = "Missing OR term"),
    C("or_with_missing_both_operands", "@num_field_1.5:[1.0 2.0] ( | )",
      createOk = false, expectedError = "Missing OR term"),
    C("or_with_missing_right_operand_trailing_pipe", "@num_field_1.5:[1.0 2.0]|",
      createOk = false, expectedError = "Missing OR term"),
    C("or_with_missing_right_operand_trailing_pipe_space",
      "@num_field_1.5:[1.0 2.0] |",
      createOk = false, expectedError = "Missing OR term"),
    C("or_with_missing_right_operand_trailing_pipe_in_parens",
      "(@num_field_1.5:[1.0 2.0]|)",
      createOk = false, expectedError = "Missing OR term"),
    C("tag_escaped_pipe_matches_literal_pipe", """@tag_field_1:{a\|b}""",
      createOk = true, eval = Some(true), key = "key_pipe"),
    C("tag_escaped_backslash_matches_literal_backslash", """@tag_field_1:{a\\}""",
      createOk = true, eval = Some(true), key = "key_backslash"),
    C("tag_escaped_backslash_pipe_matches_literal", """@tag_field_1:{a\\\|b}""",
      createOk = true, eval = Some(true), key = "key_backslash_pipe"),
    C("tag_escaped_pipe_or_unescaped_first_matches", """@tag_field_1:{a\|b|tag1}""",
      createOk = true, eval = Some(true), key = "key_pipe"),
    C("tag_escaped_pipe_or_unescaped_second_matches", """@tag_field_1:{a\|b|tag1}""",
      createOk = true, eval = Some(true), key = "key1"),
    C("tag_escaped_backslash_or_literal", """@tag_field_1:{a\\|b}""",
      createOk = true, eval = Some(true), key = "key_backslash"),
    C("tag_escaped_pipe_no_match", """@tag_field_1:{x\|y}""",
      createOk = true, eval = Some(false), key = "key1"),
    C("tag_escaped_brace_matches_literal_brace", """@tag_field_1:{a\}b}""",
      createOk = true, eval = Some(true), key = "key_brace"),
    C("tag_escaped_brace_no_match", """@tag_field_1:{x\}y}""",
      createOk = true, eval = Some(false), key = "key1"),
    C("tag_escaped_brace_missing_close_bracket", """@tag_field_1:{a\}b""",
      createOk = false, expectedError = "Missing closing TAG bracket, '}'"),
    C("tag_escaped_with_and_numeric",
      """@tag_field_1:{a\|b|tag1} @num_field_1.5:[1.0 2.0]""",
      createOk = true, eval = Some(true), key = "key1"),
    C("tag_only_escaped_matches_with_or_numeric",
      """@tag_field_1:{a\|b} | @num_field_1.5:[100 200]""",
      createOk = true, eval = Some(true), key = "key_pipe"))

  for (c <- cases)
    test(s"filter/${c.name}") { exercise(c) }

  test("dotted field names lex like the reference's ParseFieldName") {
    val p = FilterParser.parse("@num_field_1.5:[1.0 2.0]").filter
    assert(p == NumericRange("num_field_1.5", 1.0, true, 2.0, true))
  }

  test("query-tag escape parsing replays ParseSearchTags/UnescapeTag " +
      "(tag_index_test.cc:281-435)") {
    def tags(raw: String): Seq[String] =
      FilterParser.parse(s"@tag_field_1:{$raw}").filter match {
        case TagMatch(_, ps) => ps.map(_.value)
        case other => fail(s"not a tag match: $other")
      }
    assert(tags("""foo\|bar""") == Seq("foo|bar"))
    assert(tags("""a\|b|c""") == Seq("a|b", "c"))
    assert(tags("""foo\\|bar""") == Seq("foo\\", "bar"))
    assert(tags("""foo\\\|bar""") == Seq("foo\\|bar"))
    assert(tags("""a\|b\|c|d\|e""") == Seq("a|b|c", "d|e"))
    assert(tags("""foo\\""") == Seq("foo\\"))
    assert(tags("""foo\|""") == Seq("foo|"))
    // permissive escape of a regular char: \x → x (Tag::UnescapeTag)
    assert(tags("""test\value""") == Seq("testvalue"))
    // empty tags between separators and whitespace-only tags drop
    assert(tags("a||b") == Seq("a", "b"))
    assert(tags("a|   |b") == Seq("a", "b"))
    // unicode preserved
    assert(tags("日本語|中文") == Seq("日本語", "中文"))
    // prefix shorter than tag-min-prefix-length and bare `*` reject
    intercept[FilterParser.ParseError] { tags("b*") }
    intercept[FilterParser.ParseError] { tags("*") }
    // `{}` / `{   }` parse to an empty set that matches nothing
    assert(tags("") == Nil)
    assert(tags("   ") == Nil)
    assert(matchedKeys(subst("@tag_field_1:{}")) == Right(Set.empty))
  }
}
