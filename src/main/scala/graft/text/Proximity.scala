package graft.text

import graft.query._

/**
 * Positional (SLOP/INORDER) matching over a token-position list
 * (reference: src/indexes/text/proximity.h:22-51, orproximity.cc).
 *
 * A match is an assignment of one token occurrence per matcher such
 * that max(pos) − min(pos) − (k−1) ≤ slop, and, when `inorder`, the
 * chosen positions are strictly increasing in matcher order.
 */
object Proximity {

  /** Serializable token matcher (closure-safe for UDF capture). */
  sealed trait Spec extends Serializable {
    def matches(tok: String): Boolean
  }
  final case class ExactSpec(w: String) extends Spec {
    def matches(t: String): Boolean = t == w
  }
  final case class StemSpec(stem: String, cfg: Analyzer.Config) extends Spec {
    def matches(t: String): Boolean = Analyzer.stemToken(t, cfg) == stem
  }
  final case class PrefixSpec(p: String) extends Spec {
    def matches(t: String): Boolean = t.startsWith(p)
  }
  final case class SuffixSpec(s: String) extends Spec {
    def matches(t: String): Boolean = t.endsWith(s)
  }
  final case class InfixSpec(s: String) extends Spec {
    def matches(t: String): Boolean = t.contains(s)
  }
  final case class FuzzySpec(w: String, d: Int) extends Spec {
    def matches(t: String): Boolean =
      math.abs(t.length - w.length) <= d &&
        graft.functions.DamerauLevenshtein.distance(t, w) <= d
  }
  /** A phrase behaves as consecutive exact words. */
  final case class PhraseSpec(words: Seq[String]) extends Spec {
    def matches(t: String): Boolean = t == words.head
  }

  /**
   * Builds the matcher for one predicate under the EFFECTIVE analyzer
   * config of the field being matched — the same config the plain term
   * path uses (index STOPWORDS/MINSTEMSIZE/NOSTEM + the query's
   * VERBATIM override), so a SLOP query and a term query never disagree
   * on what a word matches.
   */
  def toSpec(t: TextPredicate, cfg: Analyzer.Config): Spec = t match {
    case Term(_, w) =>
      val f = Analyzer.caseFold(w, cfg)
      if (cfg.stem) StemSpec(Analyzer.stemToken(f, cfg), cfg) else ExactSpec(f)
    case Prefix(_, p) => PrefixSpec(Analyzer.caseFold(p, cfg))
    case Suffix(_, s) => SuffixSpec(Analyzer.caseFold(s, cfg))
    case Infix(_, s) => InfixSpec(Analyzer.caseFold(s, cfg))
    case Fuzzy(_, w, d) => FuzzySpec(Analyzer.caseFold(w, cfg), d)
    case Phrase(_, ws) => PhraseSpec(ws.map(Analyzer.caseFold(_, cfg)))
  }

  def matches(tokens: Seq[(String, Int)], specs: Seq[Spec],
              slop: Int, inorder: Boolean): Boolean = {
    val k = specs.length
    if (k == 0) return true
    // candidate positions per matcher
    val cands: Array[Array[Int]] = specs.map { s =>
      tokens.filter(tp => s.matches(tp._1)).map(_._2).toArray
    }.toArray
    if (cands.exists(_.isEmpty)) return false
    // backtracking over assignments (candidate lists are tiny in practice)
    val chosen = new Array[Int](k)
    def rec(i: Int): Boolean = {
      if (i == k) {
        val mn = chosen.min; val mx = chosen.max
        mx - mn - (k - 1) <= slop
      } else cands(i).exists { p =>
        if (chosen.take(i).contains(p)) false
        else if (inorder && i > 0 && p <= chosen(i - 1)) false
        else { chosen(i) = p; rec(i + 1) }
      }
    }
    rec(0)
  }
}
