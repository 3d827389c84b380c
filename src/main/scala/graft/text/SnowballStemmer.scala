package graft.text

/**
 * Snowball English stemmer ("Porter2", algorithm revision 3.0.x) — the
 * stemmer the reference links (third_party/snowball VERSION v3.0.1,
 * src/indexes/text/lexer.cc:86-168 via sb_stemmer). Implemented from
 * the published Snowball English algorithm description; behavior
 * golden-diffed against the reference stemmer build over a 6,929-word
 * vocabulary (SnowballStemmerSpec, src/test/resources/snowball_golden.tsv).
 *
 * Differences from classic Porter (why the engine ships this and not
 * Porter1): y→Y vowel marking, R1/R2 region conditions, the special
 * R1 prefixes (gener-, commun-, …), the 3.0 ing-exception list
 * (herring, evening, …), -ogist/-ogi handling, and the "past" short-v
 * special. Porter1 and Snowball disagree on a meaningful fraction of
 * English words, which silently breaks term matching parity.
 */
object SnowballStemmer {

  private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  /** v ∪ {w, x, Y} — the "non-short-ending" grouping for shortv. */
  private def isVwxy(c: Char): Boolean = isV(c) || c == 'w' || c == 'x' || c == 'Y'

  private val ValidLi = Set('c', 'd', 'e', 'g', 'h', 'k', 'm', 'n', 'r', 't')
  private val Doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

  /** Whole-word exceptions: invariants + irregular -ly/-ies forms. */
  private val Exceptions: Map[String, String] = Map(
    "skies" -> "sky", "early" -> "earli", "gently" -> "gentl",
    "idly" -> "idl", "only" -> "onli", "singly" -> "singl", "ugly" -> "ugli",
    "andes" -> "andes", "atlas" -> "atlas", "bias" -> "bias",
    "cosmos" -> "cosmos", "howe" -> "howe", "news" -> "news", "sky" -> "sky")

  /** Prefixes whose R1 starts right after them (longest first). */
  private val R1Prefixes = Seq(
    "univers", "commun", "arsen", "emerg", "gener", "later", "organ", "past")

  /** -ing forms left intact when the whole prefix is one of these. */
  private val IngExceptions = Set("even", "cann", "inn", "earr", "herr", "out")

  // Step suffix tables, longest-first so linear scan = longest match.
  private val Step2: Seq[(String, String)] = Seq(
    "ization" -> "ize", "ational" -> "ate", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous",
    "tional" -> "tion", "lessli" -> "less", "biliti" -> "ble",
    "entli" -> "ent", "fulli" -> "ful", "ousli" -> "ous", "aliti" -> "al",
    "iviti" -> "ive", "alism" -> "al", "ation" -> "ate", "ogist" -> "og",
    "enci" -> "ence", "anci" -> "ance", "abli" -> "able", "izer" -> "ize",
    "alli" -> "al", "ator" -> "ate",
    "bli" -> "ble", "ogi" -> "og", "li" -> "")

  private val Step3: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion",
    "icate" -> "ic", "iciti" -> "ic", "alize" -> "al", "ative" -> "",
    "ical" -> "ic", "ness" -> "", "ful" -> "")

  private val Step4: Seq[String] = Seq(
    "ement",
    "ance", "ence", "able", "ible", "ment",
    "ate", "ive", "ize", "iti", "ism", "ous", "ant", "ent", "ion",
    "ic", "al", "er")

  /** Region start after the first non-vowel that follows a vowel. */
  private def regionAfterVC(w: String, from: Int): Int = {
    var c = from
    while (c < w.length && !isV(w.charAt(c))) c += 1
    if (c >= w.length) return w.length
    c += 1
    while (c < w.length && isV(w.charAt(c))) c += 1
    if (c >= w.length) return w.length
    c + 1
  }

  /** Short-syllable test with the cursor at `end` (exclusive). */
  private def isShortV(w: String, end: Int): Boolean =
    (end >= 3 && !isVwxy(w.charAt(end - 1)) && isV(w.charAt(end - 2)) &&
      !isV(w.charAt(end - 3))) ||
    (end == 2 && isV(w.charAt(0)) && !isV(w.charAt(1))) ||
    (end >= 4 && w.regionMatches(end - 4, "past", 0, 4))

  def stem(input: String): String = {
    Exceptions.get(input) match {
      case Some(s) => return s
      case None =>
    }
    if (input.length < 3) return input

    // ---- prelude: strip leading ', mark consonant-y as Y ---- //
    var w = if (input.charAt(0) == '\'') input.substring(1) else input
    var yFound = false
    val sb = new StringBuilder(w)
    if (sb.nonEmpty && sb.charAt(0) == 'y') { sb.setCharAt(0, 'Y'); yFound = true }
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isV(sb.charAt(i - 1))) {
        sb.setCharAt(i, 'Y'); yFound = true
      }
      i += 1
    }
    w = sb.toString

    // ---- mark regions ---- //
    val r1 = R1Prefixes.find(w.startsWith) match {
      case Some(p) => p.length
      case None => regionAfterVC(w, 0)
    }
    val r2 = regionAfterVC(w, r1)

    // ---- step 1a ---- //
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies") || w.endsWith("ied"))
      w = w.dropRight(3) + (if (w.length - 3 >= 2) "i" else "ie")
    else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s") && w.length >= 2 &&
      w.substring(0, w.length - 2).exists(isV)) w = w.dropRight(1)

    // ---- step 1b ---- //
    Seq("eedly", "ingly", "edly", "eed", "ing", "ed").find(w.endsWith) match {
      case Some(s) if s == "eed" || s == "eedly" =>
        val start = w.length - s.length
        val pre = w.substring(0, start)
        // whole words succeed/proceed/exceed (+ -ly) are left alone
        if (pre != "succ" && pre != "proc" && pre != "exc" && start >= r1)
          w = pre + "ee"
      case Some(s) =>
        val start = w.length - s.length
        val pre = w.substring(0, start)
        val special = s == "ing" && {
          if (pre.length == 2 && pre.charAt(1) == 'y' && !isV(pre.charAt(0))) {
            w = pre.dropRight(1) + "ie" // dying→die, lying→lie, tying→tie
            true
          } else IngExceptions.contains(pre) // evening, herring, outing, …
        }
        if (!special && pre.exists(isV)) {
          w = pre
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
          else if (w.length >= 2 && Doubles.contains(w.substring(w.length - 2))) {
            // keep the double when it IS the word minus one a/e/o (add, egg)
            val keep = w.length == 3 && (w.charAt(0) == 'a' ||
              w.charAt(0) == 'e' || w.charAt(0) == 'o')
            if (!keep) w = w.dropRight(1)
          } else if (w.length == r1 && isShortV(w, w.length)) w += "e"
        }
      case None =>
    }

    // ---- step 1c: y→i after a non-initial consonant ---- //
    if (w.length >= 3 && (w.last == 'y' || w.last == 'Y') &&
      !isV(w.charAt(w.length - 2)))
      w = w.dropRight(1) + "i"

    // ---- step 2 (R1) ---- //
    Step2.find { case (sfx, _) => w.endsWith(sfx) } match {
      case Some((sfx, repl)) =>
        val start = w.length - sfx.length
        if (start >= r1) sfx match {
          case "ogi" =>
            if (start >= 1 && w.charAt(start - 1) == 'l')
              w = w.substring(0, start) + "og"
          case "li" =>
            if (start >= 1 && ValidLi.contains(w.charAt(start - 1)))
              w = w.substring(0, start)
          case _ => w = w.substring(0, start) + repl
        }
      case None =>
    }

    // ---- step 3 (R1; ative needs R2) ---- //
    Step3.find { case (sfx, _) => w.endsWith(sfx) } match {
      case Some((sfx, repl)) =>
        val start = w.length - sfx.length
        if (start >= r1 && (sfx != "ative" || start >= r2))
          w = w.substring(0, start) + repl
      case None =>
    }

    // ---- step 4 (R2) ---- //
    Step4.find(w.endsWith) match {
      case Some(sfx) =>
        val start = w.length - sfx.length
        if (start >= r2 &&
          (sfx != "ion" || (start >= 1 &&
            (w.charAt(start - 1) == 's' || w.charAt(start - 1) == 't'))))
          w = w.substring(0, start)
      case None =>
    }

    // ---- step 5 ---- //
    if (w.endsWith("e")) {
      val pos = w.length - 1
      if (pos >= r2 || (pos >= r1 && !isShortV(w, pos))) w = w.dropRight(1)
    } else if (w.endsWith("l")) {
      val pos = w.length - 1
      if (pos >= r2 && pos >= 1 && w.charAt(pos - 1) == 'l') w = w.dropRight(1)
    }

    // ---- postlude ---- //
    if (yFound) w.map(c => if (c == 'Y') 'y' else c) else w
  }
}
