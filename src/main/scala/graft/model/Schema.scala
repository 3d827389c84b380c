package graft.model

/**
 * Index schema model — the Spark-native equivalent of the reference's
 * `FT.CREATE ... SCHEMA ...` declaration (reference:
 * src/index_schema.proto:1-96, src/commands/ft_create_parser.cc:41-106).
 *
 * A schema declares typed fields over a document DataFrame. The loader
 * ([[Documents]]) derives auxiliary columns (normalized tag arrays,
 * token arrays, unit-normalized vectors) so that query compilation is
 * pure column algebra with full Catalyst pushdown.
 */
sealed trait FieldType

/** 64-bit double field (reference: src/indexes/numeric.cc). */
case object NumericField extends FieldType

/**
 * Tag field: raw string split on a single-char separator; case-folded
 * unless `caseSensitive` (reference: src/indexes/tag.h:33-44,
 * COMMANDS.md:44-48).
 */
final case class TagField(separator: String = ",", caseSensitive: Boolean = false)
    extends FieldType

/**
 * Full-text field (reference: src/indexes/text/text_index.h:57-88,
 * lexer options src/commands/ft_create_parser.cc:96-106).
 */
final case class TextField(
    noStem: Boolean = false,
    // Opt-in like the reference (ft_create_parser.cc:512 defaults
    // with_suffix_trie=false): gates only the suffix-posting
    // accelerator — pattern predicates stay correct either way.
    withSuffixTrie: Boolean = false,
    // ≤ 0 = inherit the index-level MINSTEMSIZE (IndexSchema.analyzer);
    // the reference declares MINSTEMSIZE per index, not per field.
    minStemSize: Int = -1,
    weight: Double = 1.0)
    extends FieldType

sealed trait DistanceMetric { def name: String }
object DistanceMetric {
  case object L2 extends DistanceMetric { val name = "L2" }
  case object IP extends DistanceMetric { val name = "IP" }
  case object Cosine extends DistanceMetric { val name = "COSINE" }
  def parse(s: String): DistanceMetric = s.toUpperCase match {
    case "L2" => L2
    case "IP" => IP
    case "COSINE" => Cosine
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }
}

/**
 * Vector field: FLOAT32, fixed dim, L2 | IP | COSINE
 * (reference: COMMANDS.md:50-66, src/indexes/vector_base.cc:113-133 for
 * cosine ingest-normalization).
 */
final case class VectorField(
    dim: Int,
    metric: DistanceMetric,
    hnswM: Int = 16,
    efConstruction: Int = 200,
    efRuntime: Int = 10,
    // Reference behavior: cosine vectors are unit-normalized at ingest
    // (vector_base.cc:113-133) so queries run the cheaper IP loop.
    // Disable to keep raw vectors and compute full cosine per query.
    normalizeAtIngest: Boolean = true)
    extends FieldType

/**
 * One declared field: `identifier` is the source column; `alias` the
 * query-visible name (`AS` clause, ft_create_parser.cc:41-60).
 */
final case class FieldDef(identifier: String, alias: String, ftype: FieldType)
object FieldDef {
  def apply(identifier: String, ftype: FieldType): FieldDef =
    FieldDef(identifier, identifier, ftype)
}

/**
 * A named index over a document table. `keyColumn` plays the role of the
 * Valkey key (`__key` pseudo-field, reference ft_aggregate.cc:95-105).
 */
final case class IndexSchema(
    name: String,
    fields: Seq[FieldDef],
    keyColumn: String = "__key",
    // Index-level text options: STOPWORDS/NOSTOPWORDS, PUNCTUATION,
    // MINSTEMSIZE, NOSTEM, WITHOFFSETS/NOOFFSETS
    // (reference ft_create_parser.cc:96-106, 640-725).
    analyzer: graft.text.Analyzer.Config = graft.text.Analyzer.Default,
    // Per-document score plumbing (reference index_schema.cc:631-645:
    // SCORE default / SCORE_FIELD override stored per key, surfaced by
    // FT.INFO; no scoring algorithm consumes it in the query path yet —
    // parity means store + surface, not invent a scorer). Named
    // docScore* to stay clear of scoreField(vectorAlias) below.
    docScore: Double = 1.0,
    docScoreField: Option[String] = None,
    // Normalized PREFIX subscriptions (reference index_schema.cc:321-334,
    // surfaced by FT.INFO's index_definition block); Nil when the index
    // was bound directly to a table rather than through FT.CREATE.
    subscribedPrefixes: Seq[String] = Nil,
    // ON JSON document model (reference attribute_data_type.h:117-135
    // JsonAttributeDataType): field identifiers are JSONPaths into the
    // serialized document held in [[IndexSchema.DocColumn]], and
    // no-RETURN replies serve the whole document under `$` instead of
    // per-field pairs (response_generator.cc GetContentNoReturnJson).
    onJson: Boolean = false) {

  private val byAlias: Map[String, FieldDef] = fields.map(f => f.alias -> f).toMap

  def field(alias: String): Option[FieldDef] = byAlias.get(alias)
  // message parity: reference index_schema.cc:473-480
  def fieldOrFail(alias: String): FieldDef =
    byAlias.getOrElse(alias, throw new IllegalArgumentException(
      s"Index field `$alias` does not exist"))

  def textFields: Seq[FieldDef] = fields.filter(_.ftype.isInstanceOf[TextField])
  def tagFields: Seq[FieldDef] = fields.filter(_.ftype.isInstanceOf[TagField])
  def numericFields: Seq[FieldDef] = fields.filter(_.ftype == NumericField)
  def vectorFields: Seq[FieldDef] = fields.filter(_.ftype.isInstanceOf[VectorField])

  /** Derived-column name holding the normalized tag array for a tag field. */
  def tagsCol(alias: String): String = s"__${alias}__tags"
  /** Derived-column name holding token structs for a text field. */
  def tokensCol(alias: String): String = s"__${alias}__tokens"
  /** Pseudo-field carrying KNN distance (reference: COMMANDS.md:195-199). */
  def scoreField(vectorAlias: String): String = s"__${vectorAlias}_score"
}

object IndexSchema {
  /** Column holding the serialized JSON document for ON JSON indexes —
    * named after the JSONPath root the reference fetches it by
    * (attribute_data_type.h kJsonRootElementQuery). A JSON-bound source
    * must provide it; field identifiers `$.x` extract from it. */
  val DocColumn = "$"
}
