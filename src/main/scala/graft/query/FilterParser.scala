package graft.query

/**
 * Recursive-descent parser for the dialect-2 filter query language.
 * Grammar from docs/topics/search-query.md:55-68; behavior cross-checked
 * against the reference parser (src/query/filter_parser.cc:439-1054).
 *
 * Precedence: NOT > AND (space) > OR (`|`), parenthesized grouping.
 * The `=>[KNN ...]` vector tail is split off first
 * (kVectorFilterDelimiter, src/query/search.h:72).
 */
object FilterParser {

  final case class ParseError(msg: String, pos: Int)
      extends RuntimeException(s"$msg at position $pos")

  /** `query-string-terms-count` default (reference filter_parser.cc:44):
    * max predicate-tree nodes per query. */
  val MaxQueryTerms: Int = 1000

  /** `tag-min-prefix-length` default (reference valkey_search_options
    * .cc:344): a tag prefix pattern's length INCLUDING the trailing `*`
    * must exceed this. */
  val TagMinPrefixLength: Int = 2

  /** `query-string-bytes` default (reference valkey_search_options
    * .cc:65; enforced search.cc:1071). */
  val MaxQueryStringBytes: Int = 10240

  /** `max-vector-knn` default (reference ft_search_parser.cc:35). */
  val MaxVectorKnn: Int = 10000

  /** `max-vector-ef-runtime` default (reference ft_create_parser.cc:73). */
  val MaxEfRuntime: Int = 1000000

  /** `fuzzy-max-distance` config default (reference
    * filter_parser.cc:59-74: default 3, range 1..50) — caps the %-count
    * so adversarial queries can't request unbounded-cost edit-distance
    * DPs. */
  val DefaultFuzzyMaxDistance = 3

  def parse(query: String, params: Map[String, ParamValue] = Map.empty,
            fuzzyMaxDistance: Int = DefaultFuzzyMaxDistance): ParsedQuery = {
    // reference PreParseQueryString (search.cc:1069-1075)
    if (query.getBytes(java.nio.charset.StandardCharsets.UTF_8).length >
        MaxQueryStringBytes)
      throw ParseError(
        s"Query string is too long, max length is $MaxQueryStringBytes bytes.", 0)
    val used = scala.collection.mutable.Set.empty[String]
    val arrow = findTopLevelArrow(query)
    arrow match {
      case Some(i) =>
        val filterPart = query.substring(0, i).trim
        val knnPart = query.substring(i + 2).trim
        val filter =
          if (filterPart == "*" || filterPart.isEmpty) MatchAll
          else new P(filterPart, params, fuzzyMaxDistance, used).parseFilter()
        ParsedQuery(filter, Some(parseKnn(knnPart, params, used)), used.toSet)
      case None =>
        val t = query.trim
        val filter =
          if (t == "*" || t.isEmpty) MatchAll
          else new P(t, params, fuzzyMaxDistance, used).parseFilter()
        ParsedQuery(filter, None, used.toSet)
    }
  }

  /** Find `=>` outside quotes/braces (the KNN delimiter). */
  private def findTopLevelArrow(s: String): Option[Int] = {
    var i = 0; var depth = 0; var inQuote = false
    while (i < s.length - 1) {
      val c = s.charAt(i)
      if (c == '\\') i += 1
      else if (c == '"') inQuote = !inQuote
      else if (!inQuote) {
        if (c == '{' || c == '[' || c == '(') depth += 1
        else if (c == '}' || c == ']' || c == ')') depth -= 1
        else if (depth == 0 && c == '=' && s.charAt(i + 1) == '>') return Some(i)
      }
      i += 1
    }
    None
  }

  /** Parse `[KNN k @field $param [EF_RUNTIME e] [AS name]]`.
    *
    * k, EF_RUNTIME and AS values may each be a `$param` reference —
    * the reference substitutes all three after parse
    * (search.cc:1140-1175 PostParseVectorParameters / SubstituteParam). */
  private def parseKnn(s: String, params: Map[String, ParamValue],
                       used: scala.collection.mutable.Set[String]): KnnClause = {
    // resolve a token that may be `$name`; counts the param as used
    def substitute(tok: String): String =
      if (!tok.startsWith("$")) tok
      else params.get(tok.drop(1)) match {
        case Some(StringParam(v)) => used += tok.drop(1); v
        case Some(VectorParam(_)) =>
          throw ParseError(s"param ${tok.drop(1)} is a vector, expected string", 0)
        case None => throw ParseError(s"missing PARAM ${tok.drop(1)}", 0)
      }
    def substituteInt(tok: String): Int =
      substitute(tok).toIntOption.getOrElse(throw ParseError(
        s"Error parsing vector similarity parameters: `$tok` is not a " +
          "valid numeric value", 0))
    val inner = {
      val t = s.trim
      if (!t.startsWith("[") || !t.endsWith("]"))
        throw ParseError("KNN clause must be bracketed", 0)
      t.substring(1, t.length - 1).trim
    }
    val toks = inner.split("\\s+").toList
    toks match {
      case kw :: kStr :: fieldTok :: paramTok :: rest if kw.equalsIgnoreCase("KNN") =>
        val k = substituteInt(kStr)
        // reference Verify (ft_search_parser.cc:72-77; max-vector-knn
        // default 10000): an unbounded k turns top-k into a full sort
        if (k < 1 || k > MaxVectorKnn)
          throw ParseError(
            "KNN parameter must be a positive integer greater than 0 and " +
              s"cannot exceed $MaxVectorKnn.", 0)
        // empty `@` rejected like the reference ("Expecting a vector
        // field name, starting with '@'", filter_parser.cc)
        if (!fieldTok.startsWith("@") || fieldTok.length < 2)
          throw ParseError(s"Unexpected argument `$fieldTok`. Expecting a " +
            "vector field name, starting with '@'", 0)
        if (!paramTok.startsWith("$")) throw ParseError("KNN vector must be a $param", 0)
        val vec = params.get(paramTok.drop(1)) match {
          case Some(VectorParam(v)) => used += paramTok.drop(1); v
          case Some(StringParam(raw)) => used += paramTok.drop(1); decodeFloat32LE(raw)
          case None => throw ParseError(s"missing PARAM ${paramTok.drop(1)}", 0)
        }
        var ef: Option[Int] = None
        var as: Option[String] = None
        var r = rest
        while (r.nonEmpty) r match {
          case e :: v :: t if e.equalsIgnoreCase("EF_RUNTIME") =>
            val efv = substituteInt(v)
            // reference Verify (ft_search_parser.cc:63-71;
            // max-vector-ef-runtime default 1000000)
            if (efv < 1 || efv > MaxEfRuntime)
              throw ParseError(
                "`EF_RUNTIME` must be a positive integer greater than 0 and " +
                  s"cannot exceed $MaxEfRuntime.", 0)
            ef = Some(efv); r = t
          case a :: v :: t if a.equalsIgnoreCase("AS") => as = Some(substitute(v)); r = t
          case a :: Nil if a.equalsIgnoreCase("AS") =>
            throw ParseError("AS argument is missing", 0)
          case e :: Nil if e.equalsIgnoreCase("EF_RUNTIME") =>
            throw ParseError("EF_RUNTIME argument is missing", 0)
          case other => throw ParseError(s"Unexpected argument `${other.head}`", 0)
        }
        KnnClause(k, fieldTok.drop(1), vec, ef, as)
      case kw :: Nil if kw.equalsIgnoreCase("KNN") =>
        throw ParseError("KNN argument is missing", 0)
      case kw :: _ :: Nil if kw.equalsIgnoreCase("KNN") =>
        throw ParseError("Vector field argument is missing", 0)
      case kw :: _ :: _ :: Nil if kw.equalsIgnoreCase("KNN") =>
        throw ParseError("Blob attribute argument is missing", 0)
      case t if t.nonEmpty && t.head.nonEmpty && !t.head.equalsIgnoreCase("KNN") =>
        throw ParseError(s"`${t.head}`. Expecting `KNN`", 0)
      case _ => throw ParseError("Missing parameters", 0)
    }
  }

  /** Wire format: packed little-endian IEEE-754 float32 (COMMANDS.md:205). */
  def decodeFloat32LE(raw: String): Array[Float] = {
    val bytes = raw.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 4)(bb.getFloat)
  }

  // Characters that terminate a bare term token.
  private val TermStop = " \t\n\r|(){}[]\"%*:=".toSet

  private final class P(s: String, params: Map[String, ParamValue],
                        fuzzyMaxDistance: Int = DefaultFuzzyMaxDistance,
                        used: scala.collection.mutable.Set[String] =
                          scala.collection.mutable.Set.empty) {
    private var pos = 0
    // Predicate-tree complexity cap (reference query-string-terms-count,
    // filter_parser.cc:40-57: default 1000): counted per matcher/group so
    // an adversarial query can neither blow the parser stack with deep
    // nesting nor build an unboundedly wide plan.
    private var nodeCount = 0
    private def countNode(): Unit = {
      nodeCount += 1
      if (nodeCount > FilterParser.MaxQueryTerms)
        throw ParseError(
          "Query string is too complex: max number of terms can't exceed " +
            FilterParser.MaxQueryTerms, pos)
    }

    def parseFilter(): Predicate = {
      val p = parseOr()
      skipWs()
      if (pos < s.length) throw ParseError(s"trailing input '${s.substring(pos)}'", pos)
      p
    }

    private def parseOr(): Predicate = {
      val children = scala.collection.mutable.ArrayBuffer(parseAnd())
      skipWs()
      while (pos < s.length && peek == '|') {
        pos += 1
        children += parseAnd()
        skipWs()
      }
      if (children.size == 1) children.head else Or(children.toSeq)
    }

    private def parseAnd(): Predicate = {
      val children = scala.collection.mutable.ArrayBuffer(parseNot())
      var continue = true
      while (continue) {
        skipWs()
        if (pos >= s.length || peek == '|' || peek == ')') continue = false
        else children += parseNot()
      }
      if (children.size == 1) children.head else And(children.toSeq)
    }

    private def parseNot(): Predicate = {
      skipWs()
      if (pos < s.length && peek == '-') { pos += 1; countNode(); Not(parseNot()) }
      else parseMatcher()
    }

    private def parseMatcher(): Predicate = {
      skipWs()
      countNode()
      if (pos >= s.length) throw ParseError("unexpected end of query", pos)
      peek match {
        case '(' =>
          pos += 1
          val inner = parseOr()
          skipWs()
          expect(')')
          inner
        case '@' => parseFielded()
        case '"' => Phrase(None, parsePhraseWords())
        case '%' => parseFuzzy(None)
        case '*' =>
          pos += 1
          // `*` alone = match-all; `*word` = suffix; `*word*` = infix.
          if (pos >= s.length || TermStop.contains(peek) && peek != '*') MatchAll
          else {
            val w = parseTermWord()
            if (pos < s.length && peek == '*') { pos += 1; Infix(None, w) }
            else Suffix(None, w)
          }
        case _ => parseTermLike(None)
      }
    }

    /** `@field:` followed by `[range]`, `{tags}`, `"phrase"`, `%fuzzy%`, term. */
    private def parseFielded(): Predicate = {
      expect('@')
      val field = parseIdent()
      expect(':')
      skipWs()
      if (pos >= s.length) throw ParseError("expected matcher after field", pos)
      peek match {
        case '[' => parseNumericRange(field)
        case '{' => parseTagMatch(field)
        case '"' => Phrase(Some(field), parsePhraseWords())
        case '%' => parseFuzzy(Some(field))
        case '*' =>
          pos += 1
          val w = parseTermWord()
          if (pos < s.length && peek == '*') { pos += 1; Infix(Some(field), w) }
          else Suffix(Some(field), w)
        case _ => parseTermLike(Some(field))
      }
    }

    private def parseTermLike(field: Option[String]): Predicate = {
      val w = parseTermWord()
      if (w.isEmpty) throw ParseError("expected term", pos)
      if (pos < s.length && peek == '*') { pos += 1; Prefix(field, w) }
      else Term(field, w)
    }

    private def parseFuzzy(field: Option[String]): Predicate = {
      var lead = 0
      while (pos < s.length && peek == '%') { lead += 1; pos += 1 }
      val w = parseTermWord()
      var trail = 0
      while (pos < s.length && peek == '%') { trail += 1; pos += 1 }
      if (lead != trail)
        throw ParseError(s"fuzzy %-count mismatch ($lead vs $trail)", pos)
      if (lead > fuzzyMaxDistance)
        throw ParseError(
          s"fuzzy distance $lead exceeds fuzzy-max-distance $fuzzyMaxDistance", pos)
      Fuzzy(field, w, lead)
    }

    private def parsePhraseWords(): Seq[String] = {
      expect('"')
      val sb = new StringBuilder
      while (pos < s.length && peek != '"') {
        if (peek == '\\' && pos + 1 < s.length) { pos += 1; sb += s.charAt(pos) }
        else sb += peek
        pos += 1
      }
      expect('"')
      sb.toString.split("\\s+").filter(_.nonEmpty).toSeq
    }

    /** `[ [(]bound [(]bound ]` with ±inf (search-query.md:101-140). */
    private def parseNumericRange(field: String): Predicate = {
      expect('[')
      skipWs()
      val (min, minIncl) = parseBound()
      skipWs()
      val (max, maxIncl) = parseBound()
      skipWs()
      expect(']')
      NumericRange(field, min, minIncl, max, maxIncl)
    }

    private def parseBound(): (Double, Boolean) = {
      var inclusive = true
      if (peek == '(') { inclusive = false; pos += 1; skipWs() }
      val start = pos
      while (pos < s.length && !peek.isWhitespace && peek != ']' && peek != '(') pos += 1
      val tok = s.substring(start, pos)
      val resolved = if (tok.startsWith("$")) stringParam(tok.drop(1)) else tok
      val v = resolved.toLowerCase match {
        case "inf" | "+inf" | "infinity" | "+infinity" => Double.PositiveInfinity
        case "-inf" | "-infinity" => Double.NegativeInfinity
        case n =>
          try n.toDouble
          catch { case _: NumberFormatException =>
            throw ParseError(s"bad numeric bound '$tok'", start) }
      }
      (v, inclusive)
    }

    /** `{t1 | t2 | pre*}`; tags may contain spaces and escapes (tag.cc:145). */
    private def parseTagMatch(field: String): Predicate = {
      expect('{')
      val patterns = scala.collection.mutable.ArrayBuffer.empty[TagPattern]
      val sb = new StringBuilder
      var done = false
      def flush(): Unit = {
        var t = sb.toString.trim
        sb.clear()
        if (t.startsWith("$")) t = stringParam(t.drop(1))
        if (t.nonEmpty) {
          if (t.endsWith("*") && !t.endsWith("\\*")) {
            // reference tag wildcard validation (tag.cc:66,154-158):
            // IsValidPrefix inspects the RAW last two characters, so
            // ANY tag ending in `**` rejects — including `ab\**`,
            // where the escaped star is still a raw `*` at length-2.
            // (Our buffer keeps the `\` before `*`, matching raw.)
            if (t.length >= 2 && t.charAt(t.length - 2) == '*')
              throw ParseError(s"Tag string `$t` ends with multiple *.", pos)
            if (t.length <= FilterParser.TagMinPrefixLength)
              throw ParseError(
                s"Tag string `$t` is too short for prefix wildcard.", pos)
            patterns += TagPattern(t.dropRight(1).replace("\\*", "*"),
              isPrefix = true)
          } else patterns += TagPattern(t.replace("\\*", "*"), isPrefix = false)
        }
      }
      while (!done) {
        if (pos >= s.length) throw ParseError("unterminated tag set", pos)
        peek match {
          case '}' => flush(); pos += 1; done = true
          case '|' => flush(); pos += 1
          case '\\' if pos + 1 < s.length =>
            val c = s.charAt(pos + 1)
            // keep escape for `*` so flush can tell literal-star from prefix
            if (c == '*') { sb += '\\'; sb += c } else sb += c
            pos += 2
          case c => sb += c; pos += 1
        }
      }
      if (patterns.isEmpty) throw ParseError("empty tag set", pos)
      TagMatch(field, patterns.toSeq)
    }

    private def parseTermWord(): String = {
      val sb = new StringBuilder
      var done = false
      while (!done && pos < s.length) {
        peek match {
          case '\\' if pos + 1 < s.length => sb += s.charAt(pos + 1); pos += 2
          case '$' if sb.isEmpty =>
            pos += 1; sb ++= stringParam(parseIdent()); done = true
          case c if TermStop.contains(c) || c == '@' || c == '-' => done = true
          case c => sb += c; pos += 1
        }
      }
      sb.toString
    }

    private def parseIdent(): String = {
      val start = pos
      while (pos < s.length &&
        (peek.isLetterOrDigit || peek == '_')) pos += 1
      if (pos == start) throw ParseError("expected identifier", pos)
      s.substring(start, pos)
    }

    private def stringParam(name: String): String = params.get(name) match {
      case Some(StringParam(v)) => used += name; v
      case Some(VectorParam(_)) =>
        throw ParseError(s"param $name is a vector, expected string", pos)
      case None => throw ParseError(s"missing PARAM $name", pos)
    }

    private def peek: Char = s.charAt(pos)
    private def skipWs(): Unit = while (pos < s.length && peek.isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      if (pos >= s.length || peek != c) throw ParseError(s"expected '$c'", pos)
      pos += 1
    }
  }
}
