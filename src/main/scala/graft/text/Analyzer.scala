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
      withOffsets: Boolean = true,
      // ICU-style FULL case folding (the reference's CaseFoldInPlace,
      // src/indexes/text/unicode_normalizer.cc:22-28 = icu foldCase):
      // applies the multi-char special folds (ß→ss class) simple
      // lowercasing misses. Off by default — the two paths agree
      // wherever the special-fold table doesn't apply, and the simple
      // fold is the established behavior for existing indexes.
      fullFold: Boolean = false)

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

  /** Config-aware fold: simple ROOT lowercase, or ICU-parity full
    * folding when the index declares it. */
  def caseFold(s: String, cfg: Config): String =
    if (cfg.fullFold) fullCaseFold(s) else caseFold(s)

  /**
   * FULL case folding, matching ICU `foldCase()` (U_FOLD_CASE_DEFAULT)
   * — the one Unicode API the reference's normalizer actually
   * implements (unicode_normalizer.cc:22-28) — on the scripts its
   * corpora use: the multi-char F-folds for Latin (ß→ss, ﬁ→fi, ŉ, ǰ,
   * ẖ ẗ ẘ ẙ ẚ), Greek monotonic (ς→σ, ΐ, ΰ), Armenian ligatures (ﬓ-ﬗ,
   * և) plus the C-folds simple lowercasing misses (µ→μ, ſ→s, İ→i̇).
   * Per-codepoint processing deliberately skips java.lang's contextual
   * final-sigma rule — folding is context-free. Cherokee folds to the
   * UPPERCASE syllabary like ICU (CaseFolding.txt C-entries), and the
   * polytonic-Greek iota-subscript F-folds (ᾼ→αι class) derive from
   * the JDK's canonical-decomposition data.
   */
  def fullCaseFold(s: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) caseFold(s)
    else {
      val sb = new java.lang.StringBuilder(s.length + 4)
      i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        val special = SpecialFolds.get(cp)
        if (special.isDefined) sb.append(special.get)
        // Cherokee folds TO UPPERCASE (Unicode CaseFolding.txt C-entries:
        // the syllabary predates its lowercase, so ICU folds small
        // letters up): ꭰ-ꮿ → Ꭰ-Ᏼ and ᏸ-ᏽ → Ᏸ-Ᏽ; uppercase stays.
        // Without this, java's toLowerCase folds the OPPOSITE way —
        // self-consistent but byte-divergent from ICU.
        else if (cp >= 0xAB70 && cp <= 0xABBF) sb.appendCodePoint(cp - 0xAB70 + 0x13A0)
        else if (cp >= 0x13F8 && cp <= 0x13FD) sb.appendCodePoint(cp - 8)
        else if (cp >= 0x13A0 && cp <= 0x13F5) sb.appendCodePoint(cp)
        // Polytonic-Greek iota-subscript F-folds (ᾼ→αι class): derived
        // from the JDK's own decomposition data instead of a hand table
        else if (cp >= 0x1F80 && cp <= 0x1FFC && iotaSubscriptFold(cp).isDefined)
          sb.append(iotaSubscriptFold(cp).get)
        else sb.appendCodePoint(Character.toLowerCase(cp))
        i += Character.charCount(cp)
      }
      sb.toString
    }
  }

  /**
   * F-fold for a precomposed character carrying COMBINING GREEK
   * YPOGEGRAMMENI (U+0345): Unicode defines these folds as the base
   * letter's fold followed by ι (CaseFolding.txt, e.g. ᾼ; F; 03B1 03B9).
   * Derived from the JDK's canonical-decomposition data — NFD exposes
   * the 0345 mark, the remainder lowercases and NFC-recomposes back to
   * the precomposed base ICU emits (ᾷ → ᾶι). Cached per codepoint.
   */
  private val iotaFoldCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Option[String]]()
  private def iotaSubscriptFold(cp: Int): Option[String] =
    iotaFoldCache.computeIfAbsent(cp, { cp =>
      val nfd = java.text.Normalizer.normalize(
        new String(Character.toChars(cp)), java.text.Normalizer.Form.NFD)
      if (nfd.indexOf('ͅ') < 0) None
      else Some(java.text.Normalizer.normalize(
        nfd.filter(_ != 'ͅ').toLowerCase(java.util.Locale.ROOT),
        java.text.Normalizer.Form.NFC) + "ι")
    })

  /** Unicode CaseFolding F-entries (+ divergent C-entries) for the
    * Latin / Greek-monotonic / Armenian repertoire. */
  private val SpecialFolds: Map[Int, String] = Map(
    0x00DF -> "ss",             // ß LATIN SMALL SHARP S
    0x1E9E -> "ss",             // ẞ LATIN CAPITAL SHARP S
    0x0130 -> "i̇",        // İ I WITH DOT ABOVE
    0x0149 -> "ʼn",        // ŉ N PRECEDED BY APOSTROPHE
    0x01F0 -> "ǰ",        // ǰ J WITH CARON
    0x017F -> "s",              // ſ LONG S
    0x1E9B -> "ṡ",         // ẛ LONG S WITH DOT ABOVE
    0x1E96 -> "ẖ",
    0x1E97 -> "ẗ",
    0x1E98 -> "ẘ",
    0x1E99 -> "ẙ",
    0x1E9A -> "aʾ",
    0x00B5 -> "μ",         // µ MICRO SIGN → GREEK MU
    0x0390 -> "ΐ", // ΐ
    0x03B0 -> "ΰ", // ΰ
    0x03C2 -> "σ",         // ς FINAL SIGMA (context-free fold)
    0x0345 -> "ι",         // bare COMBINING YPOGEGRAMMENI → iota
    0xFB00 -> "ff", 0xFB01 -> "fi", 0xFB02 -> "fl",
    0xFB03 -> "ffi", 0xFB04 -> "ffl", 0xFB05 -> "st", 0xFB06 -> "st",
    0x0587 -> "եւ",   // և ARMENIAN ECH-YIWN
    0xFB13 -> "մն", 0xFB14 -> "մե",
    0xFB15 -> "մի", 0xFB16 -> "վն",
    0xFB17 -> "մխ")

  /**
   * Raw word split (pre stop-word/stem): contiguous non-punctuation,
   * non-whitespace runs, lowercased. Backslash escapes a punctuation
   * char into the word (search-data-formats.md:233).
   */
  def words(text: String, cfg: Config = Default): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    def flush(): Unit = { if (sb.nonEmpty) { out += caseFold(sb.toString, cfg); sb.clear() } }
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
