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

  def toSpec(t: TextPredicate): Spec = t match {
    case Term(_, w) => StemSpec(Analyzer.stemToken(w.toLowerCase, Analyzer.Default), Analyzer.Default)
    case Prefix(_, p) => PrefixSpec(p.toLowerCase)
    case Suffix(_, s) => SuffixSpec(s.toLowerCase)
    case Infix(_, s) => InfixSpec(s.toLowerCase)
    case Fuzzy(_, w, d) => FuzzySpec(w.toLowerCase, d)
    case Phrase(_, ws) => PhraseSpec(ws.map(_.toLowerCase))
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
