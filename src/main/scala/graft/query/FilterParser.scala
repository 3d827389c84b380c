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
            fuzzyMaxDistance: Int = DefaultFuzzyMaxDistance,
            analyzer: graft.text.Analyzer.Config = graft.text.Analyzer.Default)
      : ParsedQuery = {
    // reference PreParseQueryString (search.cc:1069-1075)
    if (query.getBytes(java.nio.charset.StandardCharsets.UTF_8).length >
        MaxQueryStringBytes)
      throw ParseError(
        s"Query string is too long, max length is $MaxQueryStringBytes bytes.", 0)
    val used = scala.collection.mutable.Set.empty[String]
    def filterOf(part: String): Predicate =
      if (isMatchAll(part)) MatchAll
      else new P(part, params, fuzzyMaxDistance, used, analyzer).parseFilter()
    val arrow = findTopLevelArrow(query)
    arrow match {
      case Some(i) =>
        val filterPart = query.substring(0, i).trim
        val knnPart = query.substring(i + 2).trim
        ParsedQuery(filterOf(filterPart), Some(parseKnn(knnPart, params, used)),
          used.toSet)
      case None =>
        ParsedQuery(filterOf(query.trim), None, used.toSet)
    }
  }

  /** `*`, `(*)`, `( * )` (and only those forms) are the match-all
    * expression; `*)`/`(*` are the reference's dedicated errors
    * (IsMatchAllExpression, filter_parser.cc:384-421). */
  private def isMatchAll(expr: String): Boolean = {
    if (expr.isEmpty) return true
    var pos = 0
    var openBracket = false; var closeBracket = false; var asterisk = false
    def skipWs(): Unit = while (pos < expr.length && expr.charAt(pos).isWhitespace) pos += 1
    var scanning = true
    while (scanning && pos < expr.length) {
      skipWs()
      if (pos >= expr.length) scanning = false
      else expr.charAt(pos) match {
        case '*' =>
          if (asterisk || closeBracket)
            throw ParseError(s"Unexpected character at position ${pos + 1}: `*`", pos)
          asterisk = true; pos += 1
        case '(' =>
          if (asterisk || closeBracket)
            throw ParseError(s"Unexpected character at position ${pos + 1}: `(`", pos)
          if (openBracket) return false
          openBracket = true; pos += 1
        case ')' =>
          if (!closeBracket && asterisk && openBracket) { closeBracket = true; pos += 1 }
          else throw ParseError(s"Unexpected character at position ${pos + 1}: `)`", pos)
        case _ => scanning = false
      }
    }
    if (!asterisk) return false
    if (pos >= expr.length) {
      if (openBracket == closeBracket) return true
      throw ParseError("Missing `)`", pos)
    }
    false
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

  /**
   * Recursive-descent core. Text-token lexing mirrors the reference's
   * ParseUnquotedTextToken / ParseQuotedTextToken / HandleBackslashEscape
   * (filter_parser.cc:548-903): token boundaries come from the INDEX's
   * punctuation set (the schema's lexer in the reference), `{}[]:;$` are
   * reserved characters that error mid-token, `()|@` break to query
   * syntax, `-` at token start breaks to negation, and backslash escapes
   * punctuation-or-backslash only (an escaped non-punctuation character
   * ends the token when `\` itself is punctuation).
   *
   * Deliberate extensions over the reference (kept, spec'd):
   *  - `*in*` infix is a supported operation (the reference parses it
   *    then rejects "Unsupported query operation", filter_parser.cc:745)
   *  - `$param` at token start substitutes a PARAMS value into a term
   */
  private final class P(s: String, params: Map[String, ParamValue],
                        fuzzyMaxDistance: Int = DefaultFuzzyMaxDistance,
                        used: scala.collection.mutable.Set[String] =
                          scala.collection.mutable.Set.empty,
                        analyzer: graft.text.Analyzer.Config =
                          graft.text.Analyzer.Default) {
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

    // punctuation ≡ the reference lexer's bitmap: configured punctuation
    // PLUS whitespace/control (lexer.cc:30-45 BuildPunctuationBitmap)
    private def isPunct(c: Char): Boolean =
      c.isWhitespace || c.isControl || analyzer.punctuation.contains(c)

    def parseFilter(): Predicate = {
      val p = parseOr()
      skipWs()
      if (pos < s.length) throw ParseError(s"trailing input '${s.substring(pos)}'", pos)
      p.getOrElse(throw ParseError("Invalid Query Syntax", pos))
    }

    private def parseOr(): Option[Predicate] = {
      val children = scala.collection.mutable.ArrayBuffer.empty[Predicate]
      var sawPipe = false
      def take(side: Option[Predicate]): Unit = side match {
        case Some(p) => children += p
        case None if sawPipe => throw ParseError("Missing OR term", pos)
        case None => ()
      }
      take(parseAnd())
      skipWs()
      while (pos < s.length && peek == '|') {
        pos += 1
        sawPipe = true
        if (children.isEmpty) throw ParseError("Missing OR term", pos)
        take(parseAnd())
        skipWs()
      }
      if (children.isEmpty) None
      else if (children.size == 1) Some(children.head)
      else Some(Or(children.toSeq))
    }

    private def parseAnd(): Option[Predicate] = {
      val children = scala.collection.mutable.ArrayBuffer.empty[Predicate]
      var continue = true
      while (continue) {
        skipWs()
        if (pos >= s.length || peek == '|' || peek == ')') continue = false
        else parseNot().foreach(children += _)
      }
      if (children.isEmpty) None
      else if (children.size == 1) Some(children.head)
      else Some(And(children.toSeq))
    }

    private def parseNot(): Option[Predicate] = {
      skipWs()
      if (pos < s.length && peek == '-') {
        pos += 1; countNode()
        // `- |` / `-|` → the reference's dedicated error (ParseExpression:
        // negate followed by an OR operator, filter_parser.cc:986-988)
        skipWs()
        if (pos < s.length && peek == '|')
          throw ParseError(s"Unexpected character at position ${pos + 1}: `|`", pos)
        parseNot().map(Not)
      } else parseMatcher()
    }

    private def parseMatcher(): Option[Predicate] = {
      skipWs()
      countNode()
      if (pos >= s.length) throw ParseError("unexpected end of query", pos)
      peek match {
        case '(' =>
          pos += 1
          val inner = parseOr()
          skipWs()
          expect(')')
          inner match {
            case None => throw ParseError(
              s"Empty brackets detected at Position: $pos", pos)
            case some => some
          }
        case '@' => parseFielded()
        case '"' => parsePhrase(None)
        case _ => parseTextToken(None)
      }
    }

    /** `@field:` followed by `[range]`, `{tags}`, `"phrase"`, or a text
      * token. Field-name lexing per the reference (ParseFieldName,
      * filter_parser.cc:226-247): everything up to `:` or whitespace —
      * dots and dashes included, empty allowed (rejected at compile). */
    private def parseFielded(): Option[Predicate] = {
      expect('@')
      val start = pos
      while (pos < s.length && peek != ':' && !peek.isWhitespace) pos += 1
      val field = s.substring(start, pos)
      skipWs()
      if (pos >= s.length || peek != ':')
        throw ParseError(
          s"Unexpected character at position ${pos + 1}: " +
            s"`${if (pos < s.length) peek else ' '}`, expecting `:`", pos)
      pos += 1
      skipWs()
      if (pos >= s.length) throw ParseError("expected matcher after field", pos)
      peek match {
        case '[' => Some(parseNumericRange(field))
        case '{' => Some(parseTagMatch(field))
        case '"' => parsePhrase(Some(field))
        case _ => parseTextToken(Some(field))
      }
    }

    // ---- text-token lexing (reference filter_parser.cc:548-760) ----

    /** Backslash escape inside a token. Returns true to continue the
      * token, false to break it (the backslash is consumed either way). */
    private def handleEscape(sb: StringBuilder): Boolean = {
      if (pos >= s.length || peek != '\\') return true
      pos += 1
      if (pos >= s.length)
        throw ParseError("Invalid escape sequence: backslash at end of input", pos)
      val next = peek
      if (next == '\\' || isPunct(next)) { sb += next; pos += 1; true }
      else if (isPunct('\\')) false // token break, `\` consumed
      else { sb += next; pos += 1; true }
    }

    /** One unquoted text token: term / prefix / suffix / infix / fuzzy.
      * Returns None for an empty token (leading punctuation — consumed
      * so the caller makes progress, like ParseTextTokens' ++pos_). */
    private def parseTextToken(field: Option[String]): Option[Predicate] = {
      val sb = new StringBuilder
      var startsStar = false; var endsStar = false
      var lead = 0; var trail = 0
      var breakOnSyntax = false
      var done = false
      val tokenStart = pos
      while (!done && pos < s.length) {
        if (peek == '\\') { if (!handleEscape(sb)) done = true }
        else peek match {
          case ')' | '|' | '(' | '@' => breakOnSyntax = true; done = true
          case '$' if sb.isEmpty && lead == 0 && !startsStar =>
            // extension: $param substitutes a PARAMS value as the term
            pos += 1; sb ++= stringParam(parseIdent()); done = true
          case c @ ('{' | '}' | '[' | ']' | ':' | ';' | '$') =>
            throw ParseError(
              s"Unexpected character at position ${pos + 1}: `$c`", pos)
          case '-' if sb.isEmpty => breakOnSyntax = true; done = true
          case '"' => done = true
          case '%' =>
            // leading markers re-count whenever content is still empty
            // (reference filter_parser.cc:676-693: the trailing branch
            // only runs with non-empty content, so stray `%` runs can
            // only ever produce the markers mismatch error)
            if (sb.isEmpty) {
              while (pos < s.length && peek == '%' && lead <= fuzzyMaxDistance) {
                lead += 1; pos += 1
              }
              if (lead > fuzzyMaxDistance)
                while (pos < s.length && peek == '%') pos += 1
            } else if (lead == 0) done = true
            else {
              while (trail < lead && pos < s.length && peek == '%') {
                trail += 1; pos += 1
              }
              done = true
            }
          case '*' =>
            pos += 1
            if (sb.isEmpty && !startsStar) startsStar = true
            else { endsStar = true; done = true }
          case c if isPunct(c) => done = true
          case c => sb += c; pos += 1
        }
      }
      val content = sb.toString
      if (lead > 0) {
        if (trail != lead || lead > fuzzyMaxDistance)
          throw ParseError("Invalid fuzzy '%' markers", pos)
        if (content.isEmpty) throw ParseError("Empty fuzzy token", pos)
        Some(Fuzzy(field, content, lead))
      } else if (startsStar) {
        if (content.isEmpty) throw ParseError("Invalid wildcard '*' markers", pos)
        if (endsStar) Some(Infix(field, content)) // extension (see class doc)
        else Some(Suffix(field, content))
      } else if (endsStar) {
        if (content.isEmpty) throw ParseError("Invalid wildcard '*' markers", pos)
        Some(Prefix(field, content))
      } else if (content.isEmpty) {
        // leading punctuation: consume one char so the scan advances
        if (!breakOnSyntax && pos == tokenStart && pos < s.length) pos += 1
        None
      } else Some(Term(field, content))
    }

    /** Quoted exact phrase: every punctuation-split token between the
      * quotes; fuzzy/wildcard markers are NOT operators inside quotes
      * (ParseQuotedTextToken). One token → plain term; n → Phrase. */
    private def parsePhrase(field: Option[String]): Option[Predicate] = {
      expect('"')
      val words = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      def flush(): Unit = { if (sb.nonEmpty) { words += sb.toString; sb.clear() } }
      var done = false
      while (!done && pos < s.length) {
        if (peek == '\\') { if (!handleEscape(sb)) flush() }
        else if (peek == '"') { pos += 1; done = true }
        else if (isPunct(peek)) { flush(); pos += 1 }
        else { sb += peek; pos += 1 }
      }
      flush()
      // Unbalanced quote = syntax error: the reference server rejects
      // queries whose exact phrase never closes (compatibility corpus
      // test_text_search_unescaped — `many"few` errors while the
      // escaped `chat\"gpt` parses as a term).
      if (!done)
        throw ParseError("Unbalanced quotes in query string", pos)
      if (words.isEmpty) None
      else if (words.size == 1) Some(Term(field, words.head))
      else Some(Phrase(field, words.toSeq))
    }

    /** `[ [(]bound [(]bound ]` with ±inf (search-query.md:101-140);
      * number charset, space-or-comma separator, and empty-range
      * verification per the reference (filter_parser.cc:254-327). */
    private def parseNumericRange(field: String): Predicate = {
      expect('[')
      skipWs()
      var minIncl = true
      if (pos < s.length && peek == '(') { minIncl = false; pos += 1; skipWs() }
      val min = parseNumber()
      // separator: one literal space, or optional-ws comma
      if (pos < s.length && peek == ' ') pos += 1
      else {
        skipWs()
        if (pos < s.length && peek == ',') pos += 1
        else throw ParseError(
          "Expected space or `,` between start and end values of a " +
            s"numeric field. Position: $pos", pos)
      }
      skipWs()
      var maxIncl = true
      if (pos < s.length && peek == '(') { maxIncl = false; pos += 1; skipWs() }
      val max = parseNumber()
      skipWs()
      if (pos >= s.length || peek != ']')
        throw ParseError(
          s"Expected ']' got '${if (pos < s.length) peek else ' '}'. " +
            s"Position: ${pos + 1}", pos)
      pos += 1
      if (min > max || (min == max && !(minIncl && maxIncl)))
        throw ParseError(
          "Start and end values of a numeric field indicate an empty " +
            s"range. Position: $pos", pos)
      NumericRange(field, min, minIncl, max, maxIncl)
    }

    /** Reference ParseNumber (filter_parser.cc:246-281): ±inf forms,
      * leading `-` only (a leading `+` is invalid), digits/`.`, one
      * exponent with optional sign. `$param` substitution kept. */
    private def parseNumber(): Double = {
      skipWs()
      def matchInsensitive(w: String): Boolean = {
        if (pos + w.length <= s.length &&
            s.regionMatches(true, pos, w, 0, w.length)) { pos += w.length; true }
        else false
      }
      if (matchInsensitive("-infinity") || matchInsensitive("-inf"))
        return Double.NegativeInfinity
      if (matchInsensitive("+infinity") || matchInsensitive("+inf") ||
          matchInsensitive("infinity") || matchInsensitive("inf"))
        return Double.PositiveInfinity
      if (pos < s.length && peek == '$') {
        pos += 1
        val resolved = stringParam(parseIdent())
        return resolved.toLowerCase match {
          case "inf" | "+inf" | "infinity" | "+infinity" => Double.PositiveInfinity
          case "-inf" | "-infinity" => Double.NegativeInfinity
          case n => n.toDoubleOption.getOrElse(
            throw ParseError(s"Invalid number: $n", pos))
        }
      }
      val sb = new StringBuilder
      if (pos < s.length && peek == '-') { sb += '-'; pos += 1 }
      var exponentSeen = false
      var exponentSignAllowed = false
      var done = false
      while (!done && pos < s.length) {
        val c = peek
        if (c.isDigit || c == '.') { sb += c; pos += 1; exponentSignAllowed = false }
        else if ((c == 'e' || c == 'E') && !exponentSeen) {
          sb += c; pos += 1; exponentSeen = true; exponentSignAllowed = true
        } else if ((c == '+' || c == '-') && exponentSignAllowed) {
          sb += c; pos += 1; exponentSignAllowed = false
        } else done = true
      }
      val str = sb.toString
      str.toDoubleOption.getOrElse(
        throw ParseError(s"Invalid number: $str", pos))
    }

    /** `{t1 | t2 | pre*}`; tags may contain spaces and escapes (tag.cc:145).
      * The query-side separator is ALWAYS `|` regardless of the field's
      * declared separator (filter_parser.cc:352-359 ParseQueryTags). */
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
        if (pos >= s.length)
          throw ParseError("Missing closing TAG bracket, '}'", pos)
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
      // `{}` / `{   }` parse to an empty tag set that matches nothing —
      // the reference accepts them (ParseSearchTags("") → ok empty set,
      // tag.cc; the TagPredicate then fetches zero entries)
      TagMatch(field, patterns.toSeq)
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
