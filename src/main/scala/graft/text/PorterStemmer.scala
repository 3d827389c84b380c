package graft.text

/**
 * English Snowball stemmer ("Porter2"), implemented from the published
 * algorithm description (snowballstem.org/algorithms/english/stemmer.html).
 * The reference links libstemmer for the same algorithm
 * (reference: src/indexes/text/lexer.cc:170-180, sb_stemmer_new("english")).
 *
 * Input is expected lowercase ASCII (the lexer lowercases first).
 */
object PorterStemmer {

  private val vowels = "aeiouy".toSet
  private val doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val liEnding = "cdeghkmnrt".toSet

  private val exceptions1 = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val exceptions1a = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  def stem(input: String): String = {
    if (input.length <= 2) return input
    exceptions1.get(input) match {
      case Some(out) => return out
      case None =>
    }

    var w = if (input.startsWith("'")) input.substring(1) else input
    // Mark consonant-y: initial y, or y after a vowel → 'Y'
    val sb = new StringBuilder(w)
    if (sb.nonEmpty && sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && vowels.contains(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString

    def isVowel(c: Char) = vowels.contains(c) // 'Y' is a consonant

    def computeR1(s: String): Int = {
      for (p <- Seq("gener", "commun", "arsen")) if (s.startsWith(p)) return p.length
      var j = 0
      while (j < s.length && !isVowel(s.charAt(j))) j += 1
      while (j < s.length && isVowel(s.charAt(j))) j += 1
      if (j < s.length) j + 1 else s.length
    }
    def computeR2(s: String, r1: Int): Int = {
      var j = r1
      while (j < s.length && !isVowel(s.charAt(j))) j += 1
      while (j < s.length && isVowel(s.charAt(j))) j += 1
      if (j < s.length) j + 1 else s.length
    }

    // Short syllable: vowel followed by non-vowel at word start, or
    // non-vowel + vowel + non-vowel(≠ w,x,Y) elsewhere.
    def endsShortSyllable(s: String): Boolean = {
      val n = s.length
      if (n == 2) isVowel(s.charAt(0)) && !isVowel(s.charAt(1))
      else if (n >= 3) {
        val c = s.charAt(n - 1); val v = s.charAt(n - 2); val p = s.charAt(n - 3)
        !isVowel(c) && c != 'w' && c != 'x' && c != 'Y' && isVowel(v) && !isVowel(p)
      } else false
    }

    var word = w

    // Step 0: trailing ', 's, 's'
    if (word.endsWith("'s'")) word = word.dropRight(3)
    else if (word.endsWith("'s")) word = word.dropRight(2)
    else if (word.endsWith("'")) word = word.dropRight(1)

    // Step 1a
    if (word.endsWith("sses")) word = word.dropRight(2)
    else if (word.endsWith("ied") || word.endsWith("ies")) {
      word = if (word.length > 4) word.dropRight(2) else word.dropRight(1)
    } else if (word.endsWith("us") || word.endsWith("ss")) { /* no-op */ }
    else if (word.endsWith("s")) {
      val stemPart = word.dropRight(1)
      // delete if the preceding word part contains a vowel not
      // immediately before the s
      if (stemPart.dropRight(1).exists(isVowel)) word = stemPart
    }

    if (exceptions1a.contains(word)) return word.toLowerCase

    var r1 = computeR1(word)
    var r2 = computeR2(word, r1)
    def inR1(s: String, suffix: String) = s.length - suffix.length >= r1
    def inR2(s: String, suffix: String) = s.length - suffix.length >= r2

    // Step 1b
    if (word.endsWith("eedly")) {
      if (inR1(word, "eedly")) word = word.dropRight(3)
    } else if (word.endsWith("eed")) {
      if (inR1(word, "eed")) word = word.dropRight(1)
    } else {
      val suf = Seq("ingly", "edly", "ing", "ed").find(word.endsWith)
      suf match {
        case Some(sx) =>
          val base = word.dropRight(sx.length)
          if (base.exists(isVowel)) {
            word = base
            if (word.endsWith("at") || word.endsWith("bl") || word.endsWith("iz"))
              word += "e"
            else if (word.length >= 2 && doubles.contains(word.takeRight(2)))
              word = word.dropRight(1)
            else if (computeR1(word) == word.length && endsShortSyllable(word))
              word += "e"
            r1 = computeR1(word); r2 = computeR2(word, r1)
          }
        case None =>
      }
    }

    // Step 1c: y/Y → i when preceded by a non-vowel that isn't the first char
    if (word.length > 2 && (word.endsWith("y") || word.endsWith("Y")) &&
        !isVowel(word.charAt(word.length - 2)))
      word = word.dropRight(1) + "i"

    r1 = computeR1(word); r2 = computeR2(word, r1)

    // Step 2 (longest suffix, act only if in R1)
    val step2: Seq[(String, String => Option[String])] = Seq(
      "ization" -> (b => Some(b + "ize")),
      "ational" -> (b => Some(b + "ate")),
      "fulness" -> (b => Some(b + "ful")),
      "ousness" -> (b => Some(b + "ous")),
      "iveness" -> (b => Some(b + "ive")),
      "tional" -> (b => Some(b + "tion")),
      "biliti" -> (b => Some(b + "ble")),
      "lessli" -> (b => Some(b + "less")),
      "entli" -> (b => Some(b + "ent")),
      "ation" -> (b => Some(b + "ate")),
      "alism" -> (b => Some(b + "al")),
      "aliti" -> (b => Some(b + "al")),
      "ousli" -> (b => Some(b + "ous")),
      "iviti" -> (b => Some(b + "ive")),
      "fulli" -> (b => Some(b + "ful")),
      "enci" -> (b => Some(b + "ence")),
      "anci" -> (b => Some(b + "ance")),
      "abli" -> (b => Some(b + "able")),
      "izer" -> (b => Some(b + "ize")),
      "ator" -> (b => Some(b + "ate")),
      "alli" -> (b => Some(b + "al")),
      "bli" -> (b => Some(b + "ble")),
      "ogi" -> (b => if (b.endsWith("l")) Some(b + "og") else None),
      "li" -> (b => if (b.nonEmpty && liEnding.contains(b.last)) Some(b) else None))
    step2.find { case (sx, _) => word.endsWith(sx) } match {
      case Some((sx, f)) if inR1(word, sx) =>
        f(word.dropRight(sx.length)).foreach(word = _)
      case _ =>
    }

    r1 = computeR1(word); r2 = computeR2(word, r1)

    // Step 3
    val step3: Seq[(String, String => Option[String])] = Seq(
      "ational" -> (b => Some(b + "ate")),
      "tional" -> (b => Some(b + "tion")),
      "alize" -> (b => Some(b + "al")),
      "icate" -> (b => Some(b + "ic")),
      "iciti" -> (b => Some(b + "ic")),
      "ative" -> (b => if (word.length - 5 >= r2) Some(b) else None),
      "ical" -> (b => Some(b + "ic")),
      "ness" -> (b => Some(b)),
      "ful" -> (b => Some(b)))
    step3.find { case (sx, _) => word.endsWith(sx) } match {
      case Some((sx, f)) if inR1(word, sx) =>
        f(word.dropRight(sx.length)).foreach(word = _)
      case _ =>
    }

    r1 = computeR1(word); r2 = computeR2(word, r1)

    // Step 4 (in R2)
    val step4 = Seq("ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
      "al", "er", "ic")
    step4.find(word.endsWith) match {
      case Some("ion") if inR2(word, "ion") &&
          (word.length >= 4 && (word.charAt(word.length - 4) == 's' ||
            word.charAt(word.length - 4) == 't')) =>
        word = word.dropRight(3)
      case Some("ion") => // no-op unless preceded by s/t
      case Some(sx) if inR2(word, sx) => word = word.dropRight(sx.length)
      case _ =>
    }

    r1 = computeR1(word); r2 = computeR2(word, r1)

    // Step 5
    if (word.endsWith("e")) {
      val rest = word.dropRight(1)
      if (word.length - 1 >= r2 ||
          (word.length - 1 >= r1 && !endsShortSyllable(rest)))
        word = rest
    } else if (word.endsWith("l") && word.length - 1 >= r2 &&
        word.length >= 2 && word.charAt(word.length - 2) == 'l')
      word = word.dropRight(1)

    word.replace('Y', 'y')
  }
}
