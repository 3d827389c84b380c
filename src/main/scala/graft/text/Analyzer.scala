package graft.text

/**
 * Lexical pipeline for TEXT fields: punctuation split → lowercase →
 * stop-word removal → (optional) stemming. Mirrors the behavior spec in
 * reference docs/topics/search-data-formats.md:210-300 and
 * src/indexes/text/lexer.cc:100-165.
 *
 * Positions are assigned AFTER stop-word removal (removed stop words do
 * not occupy a position — search-data-formats.md:255).
 */
object Analyzer {

  /** Default punctuation set (reference: ft_create_parser.h:27-28). */
  val DefaultPunctuation: String = ",.<>{}[]\"':;!@#$%^&*()-+=~/\\|?"

  /** Default English stop words (reference: ft_create_parser.h:32-36). */
  val DefaultStopWords: Set[String] = Set(
    "a", "is", "the", "an", "and", "are", "as", "at", "be",
    "but", "by", "for", "if", "in", "into", "it", "no", "not",
    "of", "on", "or", "such", "that", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with")

  final case class Config(
      punctuation: Set[Char] = DefaultPunctuation.toSet,
      stopWords: Set[String] = DefaultStopWords,
      stem: Boolean = true,
      minStemSize: Int = 4,
      // WITHOFFSETS/NOOFFSETS (ft_create_parser.cc:98-99): without
      // offsets the index stores no positions, so phrase and
      // SLOP/INORDER queries are rejected at compile time.
      withOffsets: Boolean = true)

  val Default: Config = Config()
  /** No stemming, no stop words — used for exact-oracle test queries. */
  val Verbatim: Config = Config(stopWords = Set.empty, stem = false)

  final case class Token(token: String, pos: Int)

  private def isBoundary(c: Char, cfg: Config): Boolean =
    c.isWhitespace || cfg.punctuation.contains(c)

  /** ASCII-only lowercase (reference tag folding, tag.cc:87: bytes
    * ≥ 0x80 untouched). */
  def asciiLower(s: String): String = {
    val out = new Array[Char](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      out(i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      i += 1
    }
    new String(out)
  }

  /**
   * Token case folding, mirroring the reference lexer
   * (lexer.cc:193-199): ASCII fast path lowercases a-z only; non-ASCII
   * tokens take a Unicode fold (ROOT locale here vs ICU foldCase there
   * — the two agree on the common bicameral scripts; known divergences
   * are the special folds like ß→ss that only full case folding does).
   */
  def caseFold(s: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) {
      val out = new Array[Char](s.length)
      i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        out(i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        i += 1
      }
      new String(out)
    } else s.toLowerCase(java.util.Locale.ROOT)
  }

  /**
   * Raw word split (pre stop-word/stem): contiguous non-punctuation,
   * non-whitespace runs, lowercased. Backslash escapes a punctuation
   * char into the word (search-data-formats.md:233).
   */
  def words(text: String, cfg: Config = Default): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    def flush(): Unit = { if (sb.nonEmpty) { out += caseFold(sb.toString); sb.clear() } }
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\\' && i + 1 < text.length &&
          (text.charAt(i + 1) == '\\' || cfg.punctuation.contains(text.charAt(i + 1)))) {
        sb += text.charAt(i + 1); i += 2
      } else if (isBoundary(c, cfg)) { flush(); i += 1 }
      else { sb += c; i += 1 }
    }
    flush()
    out.toSeq
  }

  /** Full pipeline: words → drop stop words → assign positions. */
  def tokenize(text: String, cfg: Config = Default): Seq[Token] =
    words(text, cfg).filterNot(cfg.stopWords.contains)
      .zipWithIndex.map { case (w, p) => Token(w, p) }

  /** Stem a single (already lowercased) token per MINSTEMSIZE rule.
    * Snowball English — the same algorithm revision the reference links
    * (third_party/snowball v3.0.1), golden-diffed in SnowballStemmerSpec. */
  def stemToken(w: String, cfg: Config = Default): String =
    if (cfg.stem && w.length >= cfg.minStemSize) SnowballStemmer.stem(w) else w

  /**
   * Index-side term set for a text value: distinct stems of its tokens.
   * Query-side term search compares stem(query) against this set —
   * equivalent to the reference's stem-variant expansion
   * (text_index.h:119-125) since stem(a)==stem(b) ⟺ same variant group.
   */
  def termSet(text: String, cfg: Config = Default): Seq[String] =
    tokenize(text, cfg).map(t => stemToken(t.token, cfg)).distinct
}
