package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.IndexSchema

/**
 * Inverted posting relation for TEXT term lookup — the storage-level
 * analogue of the reference's radix-tree text index
 * (src/indexes/text/text_index.h:57-88, docs/full-text/index.md:1-25:
 * `Word → Postings(key)`).
 *
 * The enriched-document scan answers every text predicate correctly,
 * but a bare term query reads every document's token arrays. At 100 TB
 * that is the wrong I/O shape: a term lookup should read the posting
 * slice for THAT term and nothing else. This index provides it with
 * zero custom physical operators:
 *
 *  - build: explode the per-document distinct stem sets into
 *    `(term, __key)` — map-only, one shuffle to range-partition;
 *  - layout: `repartitionByRange(term).sortWithinPartitions(term)` →
 *    every parquet row-group covers a narrow term range, so a
 *    `term = 'x'` lookup is a PushedFilter that row-group min/max
 *    stats prune to ~one row-group per file (and file-level stats
 *    prune whole files);
 *  - query: the matched key set semi-joins the document relation —
 *    small term → AQE broadcasts the keys, the doc scan stays pruned.
 *
 * [[graft.engine.SearchEngine.registerPosting]] attaches one to an
 * index; the filter compiler then routes top-level AND'ed fielded
 * Term predicates through it (the reference's X2 "AND-min-child"
 * fetch: retrieve by posting list, verify the rest) and keeps every
 * other predicate on the columnar path.
 */
object PostingIndex {

  /** One posting relation per text field: (term, __key), distinct. */
  def build(enrichedDocs: DataFrame, schema: IndexSchema,
            fieldAlias: String): DataFrame =
    enrichedDocs.select(col(schema.keyColumn).as("__key"),
      explode(col(s"__${fieldAlias}__terms")).as("term"))

  /**
   * Posting relation for a TAG field — the analogue of the reference's
   * per-tag radix postings (src/indexes/tag.h:33-44). Terms are the
   * already-normalized tag values (trimmed, ASCII-folded unless
   * CASESENSITIVE — [[graft.sources.Documents.enrich]]), so an exact
   * tag lookup is `term = v` and a prefix lookup `term LIKE 'v%'`:
   * both reach the term-sorted parquet as pushed filters (equality and
   * StringStartsWith respectively) and row-group-prune, instead of
   * scanning every document's tag arrays.
   */
  def buildTags(enrichedDocs: DataFrame, schema: IndexSchema,
                fieldAlias: String): DataFrame =
    enrichedDocs.select(col(schema.keyColumn).as("__key"),
      explode(col(schema.tagsCol(fieldAlias))).as("term"))

  /**
   * Suffix posting for a TEXT field — the storage form of the
   * reference's WITHSUFFIXTRIE (src/indexes/text/suffix.h: a trie over
   * every suffix of every indexed word, answering `pre*`, `*suf` and
   * `*in*` without scanning the vocabulary). Here: one row per suffix
   * of each distinct ORIGINAL token (post stop-word, pre-stem — the
   * same stream pattern matchers run on), `full` marking the row whose
   * suffix is the whole token. Term-sorted parquet makes all three
   * pattern classes storage-pruned:
   *
   *  - prefix `p*`:  `term STARTSWITH p AND full` (pushed StartsWith);
   *  - suffix `*s`:  `term = s`                  (pushed EqualTo);
   *  - infix  `*i*`: `term STARTSWITH i`         (pushed StartsWith —
   *    a token contains i ⟺ one of its suffixes starts with i).
   *
   * Size is Σ|token| rows ≈ 5-7× the token posting — the same
   * space-for-navigation trade the reference's trie makes in RAM.
   */
  // Lambda-free (see Documents.joinedUdf: registered plans are shared
  // across query threads, and HOF lambdas carry a shared mutable
  // NamedLambdaVariable slot): struct-field extraction via getField
  // (GetArrayStructFields, no lambda) and suffix expansion via a UDF.
  private val suffixesUdf = udf((tok: String) =>
    if (tok == null) null
    else Array.tabulate(tok.length)(i => tok.substring(i)))

  def buildSuffixes(enrichedDocs: DataFrame, schema: IndexSchema,
                    fieldAlias: String): DataFrame = {
    val toks = enrichedDocs.select(col(schema.keyColumn).as("__key"),
      explode(array_distinct(
        col(schema.tokensCol(fieldAlias)).getField("_1"))).as("tok"))
    toks.select(col("__key"),
        explode(suffixesUdf(col("tok"))).as("term"),
        col("tok"))
      .withColumn("full", col("term") === col("tok"))
      .drop("tok")
  }

  /**
   * Positional posting for a TEXT field — the storage form of the
   * reference's postings-with-offsets (src/indexes/text/text_index.h:
   * 57-88 keeps word positions inside each posting; WITHOFFSETS,
   * ft_create_parser.cc:98-99). One row per token OCCURRENCE:
   * `(term, __key, pos)`, where `term` is the case-folded ORIGINAL
   * token (post stop-word — the stream phrase adjacency is defined
   * over) and `pos` its post-stop-word position.
   *
   * A phrase `w1 … wn` then resolves entirely posting-side: fetch each
   * word's slice (pushed EqualTo on the term-sorted parquet) and chain
   * semi-joins on `(__key, pos + i)` — adjacency in the token stream ⟺
   * consecutive positions ([[Analyzer.tokenize]] assigns positions
   * after stop-word removal). No document text is read to find
   * candidates; the columnar verify then runs only on true matches.
   *
   * Size is one row per corpus token occurrence — the same
   * space-for-navigation trade the reference's offset postings make.
   */
  def buildPositions(enrichedDocs: DataFrame, schema: IndexSchema,
                     fieldAlias: String): DataFrame =
    enrichedDocs
      .select(col(schema.keyColumn).as("__key"),
        explode(col(schema.tokensCol(fieldAlias))).as("tp"))
      .select(col("tp._1").as("term"), col("__key"), col("tp._2").as("pos"))

  /** Term-sorted parquet layout: row-group/file stats prune lookups. */
  def save(posting: DataFrame, path: String, numPartitions: Int = 32): Unit =
    posting
      .repartitionByRange(numPartitions, col("term"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Keys of documents containing `term` (already stemmed/folded). */
  def lookup(posting: DataFrame, term: String): DataFrame =
    posting.filter(col("term") === term).select("__key")
}
