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
  /** OR alternatives as ONE matcher — the reference's
    * OrProximityIterator (orproximity.h:20-31): inside a proximity
    * constraint, an OR subtree supplies the union of its branches'
    * positions, so `(cat|dog) fast` with SLOP means cat-or-dog near
    * fast. */
  final case class AnySpec(branches: Seq[Spec]) extends Spec {
    def matches(t: String): Boolean = branches.exists(_.matches(t))
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
    // candidate positions per matcher (ascending: token-stream order)
    val cands: Array[Array[Int]] = specs.map { s =>
      tokens.filter(tp => s.matches(tp._1)).map(_._2).toArray
    }.toArray
    if (cands.exists(_.isEmpty)) return false
    if (k == 1) return true
    // Bounded algorithms — naive assignment backtracking is exponential
    // when a long document repeats every query term and nothing lands
    // in a window (the reject path must EXHAUST the cross product: one
    // adversarial 100k-token doc would stall an executor task).
    if (inorder) matchesInorder(cands, slop)
    else matchesWindow(cands, slop)
  }

  /** INORDER: for each start in the first matcher's list, greedily take
    * the smallest strictly-larger position per subsequent matcher —
    * the minimal window end for that start (exchange argument), so the
    * slop test against it is exact. Greedy ends are monotone in the
    * start, so one exhausted matcher list ends the search.
    * O(|c0| · k · log n). */
  private def matchesInorder(cands: Array[Array[Int]], slop: Int): Boolean = {
    val k = cands.length
    var si = 0
    while (si < cands(0).length) {
      val start = cands(0)(si)
      var cur = start
      var i = 1
      while (i < k) {
        val c = cands(i)
        val j = firstGreater(c, cur)
        if (j >= c.length) return false // larger starts only push cur higher
        cur = c(j); i += 1
      }
      if (cur.toLong - start - (k - 1) <= slop.toLong) return true
      si += 1
    }
    false
  }

  /** First index in ascending `c` whose value is > `x` (binary search). */
  private def firstGreater(c: Array[Int], x: Int): Int = {
    var lo = 0; var hi = c.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (c(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Unordered: slide a window of span slop + (k−1) over the merged
    * candidate positions; a window matches when a system of DISTINCT
    * representatives exists (one position per matcher — bipartite
    * augmenting-path matching; per-position BitSets, so ANY matcher
    * count stays on this path). O(P · k² · w) with w ≤ window width —
    * bounded, no exponential reject path. */
  private def matchesWindow(cands: Array[Array[Int]], slop: Int): Boolean = {
    val k = cands.length
    val span = slop.toLong + (k - 1)
    // merged distinct positions; per position, the set of matchers it serves
    val merged = scala.collection.mutable.TreeSet.empty[Int]
    cands.foreach(_.foreach(merged.add))
    val positions = merged.toArray
    val n = positions.length
    val rank = positions.zipWithIndex.toMap
    val serves = Array.fill(n)(new java.util.BitSet(k))
    var m = 0
    while (m < k) {
      val c = cands(m)
      var j = 0
      while (j < c.length) { serves(rank(c(j))).set(m); j += 1 }
      m += 1
    }

    def windowMatches(loIdx: Int, hiIdx: Int): Boolean = {
      val w = hiIdx - loIdx + 1
      if (w < k) return false
      val matchOfPos = Array.fill(w)(-1)
      def augment(matcher: Int, visited: Array[Boolean]): Boolean = {
        var pi = 0
        while (pi < w) {
          if (!visited(pi) && serves(loIdx + pi).get(matcher)) {
            visited(pi) = true
            if (matchOfPos(pi) < 0 || augment(matchOfPos(pi), visited)) {
              matchOfPos(pi) = matcher; return true
            }
          }
          pi += 1
        }
        false
      }
      var matcher = 0
      while (matcher < k) {
        if (!augment(matcher, new Array[Boolean](w))) return false
        matcher += 1
      }
      true
    }

    if (positions(n - 1).toLong - positions(0) <= span)
      return windowMatches(0, n - 1) // one window covers everything
    var lo = 0
    var hi = 0
    while (hi < n) {
      while (positions(hi).toLong - positions(lo) > span) lo += 1
      if (windowMatches(lo, hi)) return true
      hi += 1
    }
    false
  }

  /** The naive assignment search — the semantics MODEL spec fuzzing
    * compares the bounded algorithms against (never on a query path). */
  private[graft] def matchesBacktrack(cands: Array[Array[Int]], slop: Int,
                                      inorder: Boolean): Boolean = {
    val k = cands.length
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
