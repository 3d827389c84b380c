package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.query.{FilterParser, ParamValue, StringParam}

/**
 * Adversarial-input robustness for the filter parser: FT.SEARCH query
 * strings arrive from untrusted clients, so for ANY input the parser
 * must either return a ParsedQuery or throw its own ParseError — never
 * a NumberFormatException / MatchError / IndexOutOfBounds / stack
 * overflow escaping from parsing internals (the reference's parser has
 * the same total-function shape via absl::Status).
 *
 * Deterministic seeded generators: raw noise over the full syntax
 * alphabet, token soup biased toward query-shaped fragments, and
 * mutations of known valid queries (char flips / deletions / inserts).
 */
class FilterParserFuzzSpec extends AnyFunSuite {

  private val params: Map[String, ParamValue] = Map(
    "p" -> StringParam("10"), "tag" -> StringParam("blue"),
    "BLOB" -> StringParam(new String(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0), java.nio.charset.StandardCharsets.ISO_8859_1)))

  private def parses(q: String): Unit =
    try { FilterParser.parse(q, params); () }
    catch {
      case _: FilterParser.ParseError => ()
      case other: Throwable =>
        fail(s"non-ParseError escaped for input `${q.take(120)}`: $other")
    }

  private val syntaxChars = "@:[]{}|-()%*\"\\$,;.+=><_ \t".toCharArray
  private def randChar(rnd: scala.util.Random): Char = rnd.nextInt(4) match {
    case 0 => syntaxChars(rnd.nextInt(syntaxChars.length))
    case 1 => ('a' + rnd.nextInt(26)).toChar
    case 2 => ('0' + rnd.nextInt(10)).toChar
    case _ => Seq('ÿ', 'é', '中', 'ß', ' ')(rnd.nextInt(5))
  }

  test("raw noise: any character soup parses or raises ParseError") {
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 4000) {
      val n = rnd.nextInt(120)
      parses(new String(Array.fill(n)(randChar(rnd))))
    }
  }

  test("token soup: query-shaped fragments compose safely") {
    val fragments = Array(
      "@price:[10 20]", "@price:[", "[1,", "@c:{a|b}", "@c:{", "{}", "()",
      "(", ")", "|", "-", "word", "wor*", "*wor", "*w*", "%w%", "%%w%%",
      "\"a b\"", "\"", "\\", "\\%", "$p", "$missing", "@t:", "@:", "=>",
      "[KNN 3 @v $BLOB]", "[KNN", "AS x", "EF_RUNTIME 5", "*", "-inf",
      "+inf", "@n:[-inf +inf]", "@n:[(1 (2]", "@x:{ab*}", "@x:{a\\*}")
    val rnd = new scala.util.Random(8L)
    for (_ <- 1 to 4000) {
      val n = rnd.nextInt(8)
      parses(Seq.fill(n)(fragments(rnd.nextInt(fragments.length)))
        .mkString(" "))
    }
  }

  test("mutations of valid queries stay total") {
    val valid = Array(
      "@l_quantity:[10 20] @l_returnflag:{A|R}",
      "(@a:{x} | @b:{y}) -@c:[0 5]",
      "hello world \"exact phrase\" pre* *suf %fuz%",
      "* => [KNN 3 @v $BLOB EF_RUNTIME 5 AS d]",
      "@t:%%word%% | -(@n:[-inf 3] @c:{tag1|tag 2})")
    val rnd = new scala.util.Random(99L)
    for (_ <- 1 to 4000) {
      val q = valid(rnd.nextInt(valid.length))
      val i = rnd.nextInt(q.length)
      val c = randChar(rnd)
      val mutated = rnd.nextInt(3) match {
        case 0 => q.updated(i, c)
        case 1 => q.substring(0, i) + q.substring(math.min(i + 1, q.length))
        case _ => q.substring(0, i) + c + q.substring(i)
      }
      parses(mutated)
    }
  }

  test("pathological shapes reject via the caps, not the stack") {
    parses("(" * 4000 + "x" + ")" * 4000)
    parses(("a|" * 2000) + "a")
    parses("%" * 500 + "w" + "%" * 500)
    parses("\"" + "a " * 3000)
    parses("@f:" + "{" + "x" * 5000)
    parses("-" * 3000 + "x")
  }
}
