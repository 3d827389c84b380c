package graft.query

/**
 * Predicate tree for the dialect-2 filter query language
 * (reference: src/query/predicate.h:41-380, grammar
 * docs/topics/search-query.md:55-68).
 *
 * Semantics notes preserved from the reference:
 *  - NOT matches documents that are *missing* the field too
 *    (search-query.md:203-207) — the compiler therefore evaluates every
 *    leaf as a strict (null-safe) boolean and negates that, rather than
 *    relying on SQL three-valued logic.
 *  - An unfielded text predicate searches ALL text fields of the index
 *    (search-query.md:149-155).
 */
sealed trait Predicate

case object MatchAll extends Predicate

/** @f:[(a (b] — a ≤/< f ≤/< b (search-query.md:101-140). */
final case class NumericRange(
    field: String,
    min: Double, minInclusive: Boolean,
    max: Double, maxInclusive: Boolean) extends Predicate

/** One tag pattern: exact string or prefix (trailing `*`). */
final case class TagPattern(value: String, isPrefix: Boolean)

/** @f:{t1 | t2 | pre*} (search-query.md:74-99). */
final case class TagMatch(field: String, patterns: Seq[TagPattern]) extends Predicate

sealed trait TextPredicate extends Predicate { def field: Option[String] }
/** Single word, subject to stemming unless VERBATIM (predicate.h:201-229). */
final case class Term(field: Option[String], word: String) extends TextPredicate
/** `w*` (predicate.h:231-257). */
final case class Prefix(field: Option[String], prefix: String) extends TextPredicate
/** `*w` (predicate.h:259-285). */
final case class Suffix(field: Option[String], suffix: String) extends TextPredicate
/** `*w*` (predicate.h:287-315). */
final case class Infix(field: Option[String], infix: String) extends TextPredicate
/** %w% / %%w%% — Damerau-Levenshtein ≤ maxDist (predicate.h:315-345). */
final case class Fuzzy(field: Option[String], word: String, maxDist: Int) extends TextPredicate
/** "w1 w2" — adjacent in order, no stem/stopword removal (phrase.md:1-9). */
final case class Phrase(field: Option[String], words: Seq[String]) extends TextPredicate

final case class And(children: Seq[Predicate]) extends Predicate
final case class Or(children: Seq[Predicate]) extends Predicate
final case class Not(child: Predicate) extends Predicate

/**
 * `[KNN k @field $param EF_RUNTIME e AS name]` tail of a vector query
 * (search-query.md:11-45). The query vector is resolved from PARAMS at
 * parse time.
 */
final case class KnnClause(
    k: Int,
    field: String,
    queryVector: Array[Float],
    efRuntime: Option[Int],
    asName: Option[String])

/** A fully parsed query string: filter half + optional KNN half.
  * `usedParams` records which PARAMS names the parse consumed — the
  * reference rejects a command whose PARAMS carry never-referenced
  * entries (ft_search_parser.cc:91-99 "Parameter `x` not used."). */
final case class ParsedQuery(filter: Predicate, knn: Option[KnnClause],
                             usedParams: Set[String] = Set.empty) {
  def isMatchAll: Boolean = filter == MatchAll
}

/** PARAMS values (reference: search.h:230-236). */
sealed trait ParamValue
final case class StringParam(value: String) extends ParamValue
final case class VectorParam(value: Array[Float]) extends ParamValue
