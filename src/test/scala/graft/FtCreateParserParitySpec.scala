package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Commands, SearchEngine}

/**
 * Replays the reference's FT.CREATE command-parser test table
 * (testing/ft_create_parser_test.cc:276-1905) through the public
 * command surface: accept/reject parity with the reference's error
 * messages, and FT.INFO-observable schema effects for the happy paths.
 *
 * Command strings are tokenized exactly like the reference's test
 * driver (vmsdk ToValkeyStringVector, testing_infra/utils.cc:18-46):
 * split on single spaces, empties dropped, one layer of matching
 * surrounding quotes stripped per token.
 *
 * The doc source is an EMPTY typed DataFrame carrying every identifier
 * the table references — creation binds the schema lazily, so one
 * fixture serves commands that declare different dims over the same
 * column. Three cases re-type hash_field1 as a scalar; they get the
 * string-typed variant.
 */
class FtCreateParserParitySpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark

  private def emptyDocs(hashField1Vector: Boolean): DataFrame = {
    val vec = ArrayType(FloatType)
    val fields = Seq(
      StructField("pk", StringType),
      StructField("hash_field1", if (hashField1Vector) vec else StringType),
      StructField("hash_field3", vec),
      StructField("hash_field4", vec),
      StructField("vector_field", vec),
      StructField("hash_field10", StringType),
      StructField("hash_field20", StringType),
      StructField("hash_field21", StringType),
      StructField("hash_field22", StringType),
      StructField("text_field", StringType),
      StructField("text1", StringType),
      StructField("text2", StringType))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], StructType(fields))
  }

  /** ToValkeyStringVector: single-space split, skip empty, strip one
    * layer of matching surrounding quotes. */
  private def tokenize(s: String): Seq[String] =
    s.split(" ").toSeq.filter(_.nonEmpty).map { t =>
      if (t.length >= 2 &&
          ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
        t.substring(1, t.length - 1)
      else t
    }

  private val scalarHashField1 = Set(
    "happy_path_numeric_index_on_hash", "happy_path_tag_index_on_hash",
    "happy_path_skip_initial_scan")

  private def run(name: String, cmd: String): Either[Throwable, Commands] = {
    val engine = new SearchEngine
    val cmds = new Commands(engine,
      _ => (emptyDocs(!scalarHashField1.contains(name)), col("pk")))
    try { cmds.execute("FT.CREATE" +: tokenize(cmd)); Right(cmds) }
    catch { case e: Throwable => Left(e) }
  }

  private case class C(name: String, ok: Boolean, cmd: String, err: String = "")

  private val cases = Seq(
    C("happy_path_hnsw", ok = true,
      " idx1 on HASH PREFIx 3 abc def ghi LANGUAGe ENGLISh SCORE 1.0 SChema hash_field1 as hash_field11 vector hnsw 14 TYPE  FLOAT32 DIM 3  DISTANCE_METRIC IP M 2 EF_CONSTRUCTION 5  INITIAL_CAP 15000 EF_RUNTIME 25 "),
    C("happy_path_flat", ok = true,
      " idx1 on HASH PREFIx 3 abc def ghi LANGUAGe ENGLISh SCORE 1.0 SChema hash_field1 as hash_field11 vector flat 10 TYPE  FLOAT32 DIM 3  DISTANCE_METRIC IP   INITIAL_CAP 15000 BLOCK_SIZE 25 "),
    C("happy_path_hnsw_and_numeric", ok = true,
      " idx1 on HASH PREFIx 3 abc def ghi LANGUAGe ENGLISh SCORE 1.0 SChema hash_field10 as hash_field10 numeric hash_field1 as hash_field11 vector hnsw 14 TYPE  FLOAT32 DIM 3  DISTANCE_METRIC IP M 2 EF_CONSTRUCTION 5  INITIAL_CAP 15000 EF_RUNTIME 25 "),
    C("happy_path_hnsw_and_tag_1", ok = true,
      " idx1 on HASH PREFIx 3 abc def ghi LANGUAGe ENGLISh SCORE 1.0 SChema hash_field10 as hash_field10 tag SEPARATOR '|' CASESENSITIVE hash_field1 as hash_field11 vector hnsw 14 TYPE  FLOAT32 DIM 3  DISTANCE_METRIC IP M 2 EF_CONSTRUCTION 5  INITIAL_CAP 15000 EF_RUNTIME 25 "),
    C("happy_path_hnsw_and_tag_2", ok = true,
      " idx1 on HASH PREFIx 3 abc def ghi LANGUAGe ENGLISh SCORE 1.0 SChema hash_field20 as hash_field20 tag SEPARATOR '|' CASESENSITIVE hash_field21 as hash_field21 tag SEPARATOR $ hash_field22 as hash_field22 tag  hash_field1 as hash_field11 vector hnsw 14 TYPE  FLOAT32 DIM 3  DISTANCE_METRIC IP M 2 EF_CONSTRUCTION 5  INITIAL_CAP 15000 EF_RUNTIME 25 "),
    C("happy_path_flat_and_numeric", ok = true,
      " idx1 on HASH PREFIx 3 abc def ghi LANGUAGe ENGLISh SCORE 1.0 SChema hash_field1 as hash_field11 vector flat 10 TYPE  FLOAT32 DIM 3  DISTANCE_METRIC IP   INITIAL_CAP 15000 BLOCK_SIZE 25 hash_field10 as hash_field10 numeric "),
    C("happy_path_flat_and_tag_1", ok = true,
      " idx1 on HASH PREFIx 3 abc def ghi LANGUAGe ENGLISh SCORE 1.0 SChema hash_field1 as hash_field11 vector flat 10 TYPE  FLOAT32 DIM 3  DISTANCE_METRIC IP   INITIAL_CAP 15000 BLOCK_SIZE 25 hash_field10 as hash_field10 tag SEPARATOR \"@\""),
    C("happy_path_hnsw_3_attributes", ok = true,
      "idx1 on HASH SChema hash_field1 as hash_field11 vector hnsw 12 TYPE  FLOAT32 DIM 3  DISTANCE_METRIC IP EF_CONSTRUCTION 5  INITIAL_CAP 15000  EF_RUNTIME 25 hash_field3 vecTor hnsw 6 DISTANCE_METRIC COSINE TYPE FLOAT32 DIM 5 hash_field4 Vector Hnsw 8 DISTANCE_METRIc cOSINE tYPE FLOAt32 dIM 15 m 12 "),
    C("happy_path_hnsw_default_on_hash", ok = true,
      " idx1 SChema hash_field1 as hash_field11 vector hnsw 6 TYPE  FLOAT32 DIM 3 DISTANCE_METRIC IP "),
    C("happy_path_numeric_index_on_hash", ok = true,
      "idx1 on HASH SChema hash_field1 as hash_field11 numeric "),
    C("happy_path_tag_index_on_hash", ok = true,
      "idx1 on HASH SCHEMA hash_field1 as hash_field11 tag "),
    C("happy_path_skip_initial_scan", ok = true,
      "idx1 on HASH SKIPINITIALSCAN SCHEMA hash_field1 as hash_field11 tag "),
    C("score_field_supported", ok = true,
      " idx1 SCORE_FIELD my_score SCHEMA hash_field1 vector hnsw 6 TYPE FLOAT32 DIM 5 DISTANCE_METRIC IP "),
    C("score_preserved_with_skipinitialscan", ok = true,
      " idx1 SCORE 0.5 SKIPINITIALSCAN SCHEMA hash_field1 vector hnsw 6 TYPE FLOAT32 DIM 5 DISTANCE_METRIC IP "),
    C("invalid_separator", ok = false,
      " idx1 on HASH PREFIx 3 abc def ghi LANGUAGe ENGLISh SCORE 1.0 SChema hash_field10 as hash_field10 tag SEPARATOR @@ CASESENSITIVE hash_field1 as hash_field11 vector hnsw 14 TYPE  FLOAT32 DIM 3  DISTANCE_METRIC IP M 2 EF_CONSTRUCTION 5  INITIAL_CAP 15000 EF_RUNTIME 25 ",
      "Invalid field type for field `hash_field10`: The separator must be a single character, but got `@@`"),
    C("duplicate_identifier", ok = false,
      "idx1 on HASH SChema hash_field1 vector hnsw 6 TYPE FLOAT32 DIM 3  DISTANCE_METRIC Ip hash_field1 vector hnsw 6 TYPE FLOAT32 DIM 3 DISTANCE_METRIC Ip",
      "Duplicate field in schema - hash_field1"),
    C("trailing_invalid_token_at_the_end", ok = false,
      " idx1 on HASH PREFIx 3 abc def ghi LANGUAGe ENGLISh SCORE 1.0 SChema hash_field1 as hash_field11 vector hnsw 14 TYPE  FLOAT32 DIM 3  DISTANCE_METRIC IP M 2 EF_CONSTRUCTION 5  INITIAL_CAP 15000 EF_RUNTIME 25 random_token_at_the_end",
      "Invalid field type for field `random_token_at_the_end`: Missing argument"),
    C("invalid_ef_runtime_negative", ok = false,
      "idx1 SChema hash_field1 as hash_field11 vector hnsw 8 TYPE  FLOAT32 DIM 3 DISTANCE_METRIC IP EF_RUNTIME -100",
      "Invalid field type for field `hash_field1`: Error parsing value for the parameter `EF_RUNTIME` - `-100` is outside acceptable bounds"),
    C("invalid_ef_runtime_zero", ok = false,
      "idx1 SChema hash_field1 as hash_field11 vector hnsw 8 TYPE  FLOAT32 DIM 3 DISTANCE_METRIC IP EF_RUNTIME 0",
      "Invalid field type for field `hash_field1`: Invalid range: Value below minimum; EF_RUNTIME must be a positive integer greater than 0 and cannot exceed 1000000."),
    C("invalid_m_negative", ok = false,
      "idx1 SChema hash_field1 as hash_field11 vector hnsw 8 TYPE  FLOAT32 DIM 3 DISTANCE_METRIC IP M -10",
      "Invalid field type for field `hash_field1`: Invalid range: Value below minimum; M must be a positive integer greater than 2 and cannot exceed 2000000."),
    C("invalid_m_too_big", ok = false,
      "idx1 SChema hash_field1 as hash_field11 vector hnsw 8 TYPE  FLOAT32 DIM 3 DISTANCE_METRIC IP M 3000000",
      "Invalid field type for field `hash_field1`: Invalid range: Value above maximum; M must be a positive integer greater than 2 and cannot exceed 2000000."),
    C("invalid_m_too_small", ok = false,
      "idx1 SChema hash_field1 as hash_field11 vector hnsw 8 TYPE  FLOAT32 DIM 3 DISTANCE_METRIC IP M 1",
      "Invalid field type for field `hash_field1`: Invalid range: Value below minimum; M must be a positive integer greater than 2 and cannot exceed 2000000."),
    C("invalid_ef_construction_zero", ok = false,
      "idx1 SChema hash_field1 as hash_field11 vector hnsw 8 TYPE  FLOAT32 DIM 3 DISTANCE_METRIC IP EF_CONSTRUCTIOn 0",
      "Invalid field type for field `hash_field1`: Invalid range: Value below minimum; EF_CONSTRUCTION must be a positive integer greater than 0 and cannot exceed 1000000."),
    C("invalid_ef_construction_negative", ok = false,
      "idx1 SChema hash_field1 as hash_field11 vector hnsw 8 TYPE  FLOAT32 DIM 3 DISTANCE_METRIC IP EF_CONSTRUCTIOn -100",
      "Invalid field type for field `hash_field1`: Invalid range: Value below minimum; EF_CONSTRUCTION must be a positive integer greater than 0 and cannot exceed 1000000."),
    C("invalid_block_size_zero", ok = false,
      "idx1 SChema hash_field1 as hash_field11 vector flat 10 TYPE  FLOAT32 DIM 3 DISTANCE_METRIC IP INITIAL_CAP 15000 BLOCK_SIZE 0",
      "Invalid field type for field `hash_field1`: Invalid range: Value below minimum; BLOCK_SIZE must be a positive integer greater than 0 and cannot exceed 10000000."),
    C("invalid_block_size_too_big", ok = false,
      "idx1 SChema hash_field1 as hash_field11 vector flat 8 TYPE  FLOAT32 DIM 3 DISTANCE_METRIC IP BLOCK_SIZE 20000000",
      "Invalid field type for field `hash_field1`: Invalid range: Value above maximum; BLOCK_SIZE must be a positive integer greater than 0 and cannot exceed 10000000."),
    C("invalid_initial_cap_too_big", ok = false,
      "idx1 SChema hash_field1 as hash_field11 vector hnsw 8 TYPE  FLOAT32 DIM 3 DISTANCE_METRIC IP INITIAL_CAP 2147483647",
      "Invalid field type for field `hash_field1`: Invalid range: Value above maximum; INITIAL_CAP must be a positive integer greater than 0 and cannot exceed 10000000."),
    C("invalid_as", ok = false,
      "idx1 SChema hash_field1 asa hash_field11 vector hnsw 6 TYPE  FLOAT32 DIM 3 DISTANCE_METRIC IP ",
      "Invalid field type for field `hash_field1`: Unknown argument `asa`"),
    C("invalid_alias_with_closing_bracket", ok = false,
      "idx1 on HASH SChema hash_field1 as hash_field]1 numeric",
      "Invalid field type for field `hash_field1`: Attribute alias `hash_field]1` contains invalid character `]`"),
    C("invalid_alias_with_closing_brace", ok = false,
      "idx1 on HASH SChema hash_field1 as hash_field}1 numeric",
      "Invalid field type for field `hash_field1`: Attribute alias `hash_field}1` contains invalid character `}`"),
    C("invalid_alias_with_opening_brace", ok = false,
      "idx1 on HASH SChema hash_field1 as hash_field{1 numeric",
      "Invalid field type for field `hash_field1`: Attribute alias `hash_field{1` contains invalid character `{`"),
    C("invalid_alias_with_opening_bracket", ok = false,
      "idx1 on HASH SChema hash_field1 as hash_field[1 numeric",
      "Invalid field type for field `hash_field1`: Attribute alias `hash_field[1` contains invalid character `[`"),
    C("invalid_alias_with_colon", ok = false,
      "idx1 on HASH SChema hash_field1 as hash_field:1 numeric",
      "Invalid field type for field `hash_field1`: Attribute alias `hash_field:1` contains invalid character `:`"),
    C("invalid_alias_with_semicolon", ok = false,
      "idx1 on HASH SChema hash_field1 as hash_field;1 numeric",
      "Invalid field type for field `hash_field1`: Attribute alias `hash_field;1` contains invalid character `;`"),
    C("invalid_alias_with_dollar_sign", ok = false,
      "idx1 on HASH SChema hash_field1 as hash_field$1 numeric",
      "Invalid field type for field `hash_field1`: Attribute alias `hash_field$1` contains invalid character `$`"),
    C("invalid_alias_with_comma", ok = false,
      "idx1 on HASH SChema hash_field1 as hash_field,1 numeric",
      "Invalid field type for field `hash_field1`: Attribute alias `hash_field,1` contains invalid character `,`"),
    C("invalid_alias_with_exclamation_mark", ok = false,
      "idx1 on HASH SChema hash_field1 as hash_field!1 numeric",
      "Invalid field type for field `hash_field1`: Attribute alias `hash_field!1` contains invalid character `!`"),
    C("invalid_alias_with_dash", ok = false,
      "idx1 on HASH SChema hash_field1 as hash-field1 numeric",
      "Invalid field type for field `hash_field1`: Attribute alias `hash-field1` contains invalid character `-`"),
    C("invalid_negative_prefix_cnt", ok = false,
      "idx1 prefix -2 SChema hash_field1 vector1 hnsw 6 TYPE FLOAT32 DIM 3 DISTANCE_METRIC IP ",
      "Bad arguments for PREFIX: `-2` is outside acceptable bounds"),
    C("invalid_too_bit_prefix_cnt", ok = false,
      "idx1 prefix 20 SChema hash_field1vector1 hnsw 6 TYPE FLOAT32 DIM 3 DISTANCE_METRIC IP ",
      "Bad arguments for PREFIX: `20` is outside acceptable bounds"),
    C("invalid_vector", ok = false,
      "idx1 SChema hash_field1 vector1 hnsw 6 TYPE FLOAT32 DIM 3 DISTANCE_METRIC IP ",
      "Invalid field type for field `hash_field1`: Unknown argument `vector1`"),
    C("invalid_hnsw", ok = false,
      "idx1 SChema hash_field1 vector hnsw1 6 TYPE FLOAT32 DIM 3 DISTANCE_METRIC IP ",
      "Invalid field type for field `hash_field1`: Unknown argument `hnsw1`"),
    C("invalid_param_num_1", ok = false,
      "idx1 SChema hash_field1 vector hnsw 8 TYPE FLOAT32 DIM 3 DISTANCE_METRIC IP ",
      "Invalid field type for field `hash_field1`: Expected 8 parameters for HNSW but got 6 parameters."),
    C("invalid_param_num_2", ok = false,
      " idx1 SChema hash_field1 vector hnsw 5 TYPE FLOAT32 DIM 3 DISTANCE_METRIC IP ",
      "Invalid field type for field `hash_field1`: Error parsing value for the parameter `DISTANCE_METRIC` - Missing argument"),
    C("invalid_param_num_3", ok = false,
      "idx1 SChema hash_field1 vector hnsw -6 TYPE FLOAT32 DIM 3 DISTANCE_METRIC IP ",
      "Invalid field type for field `hash_field1`: `-6` is outside acceptable bounds"),
    C("invalid_flat_param_num_1", ok = false,
      "idx1 SChema hash_field1 vector flat 8 TYPE FLOAT32 DIM 3 DISTANCE_METRIC IP ",
      "Invalid field type for field `hash_field1`: Expected 8 parameters for FLAT but got 6 parameters."),
    C("invalid_flat_param_num_2", ok = false,
      " idx1 SChema hash_field1 vector FLAT 5 TYPE FLOAT32 DIM 3 DISTANCE_METRIC IP ",
      "Invalid field type for field `hash_field1`: Error parsing value for the parameter `DISTANCE_METRIC` - Missing argument"),
    C("invalid_flat_param_num_3", ok = false,
      "idx1 SChema hash_field1 vector flat -6 TYPE FLOAT32 DIM 3 DISTANCE_METRIC IP ",
      "Invalid field type for field `hash_field1`: `-6` is outside acceptable bounds"),
    C("invalid_type_1", ok = false,
      " idx1 SChema hash_field1 vector hnsw 6 TYPE1 FLOAT32 DIM 3 DISTANCE_METRIC IP ",
      "Invalid field type for field `hash_field1`: Unexpected argument `TYPE1`"),
    C("invalid_type_2", ok = false,
      " idx1 SChema hash_field1 vector hnsw 6 TYPE FLOAT321 DIM 3 DISTANCE_METRIC IP ",
      "Invalid field type for field `hash_field1`: Error parsing value for the parameter `TYPE` - Unknown argument `FLOAT321`"),
    C("invalid_dim_1", ok = false,
      " idx1 SChema hash_field1 vector hnsw 6 TYPE1 FLOAT32 DIM1 3 DISTANCE_METRIC IP ",
      "Invalid field type for field `hash_field1`: Unexpected argument `TYPE1`"),
    C("invalid_dim_2", ok = false,
      " idx1 SChema hash_field1 vector hnsw 6 TYPE FLOAT321 DIM a DISTANCE_METRIC IP ",
      "Invalid field type for field `hash_field1`: Error parsing value for the parameter `TYPE` - Unknown argument `FLOAT321`"),
    C("invalid_dim_3", ok = false,
      " idx1 SChema hash_field1 vector hnsw 6 TYPE FLOAT321 DIM -5 DISTANCE_METRIC IP ",
      "Invalid field type for field `hash_field1`: Error parsing value for the parameter `TYPE` - Unknown argument `FLOAT321`"),
    C("invalid_distance_1", ok = false,
      " idx1 SChema hash_field1 vector hnsw 6 TYPE1 FLOAT32 DIM 3 DISTANCE_METRIC1 IP ",
      "Invalid field type for field `hash_field1`: Unexpected argument `TYPE1`"),
    C("invalid_distance_2", ok = false,
      " idx1 SChema hash_field1 vector hnsw 6 TYPE FLOAT321 DIM 3 DISTANCE_METRIC IP1 ",
      "Invalid field type for field `hash_field1`: Error parsing value for the parameter `TYPE` - Unknown argument `FLOAT321`"),
    C("unexpected_filter", ok = false,
      " idx1 filter aa SChema hash_field1 vector hnsw 6 TYPE FLOAT321 DIM 5 DISTANCE_METRIC IP ",
      "The parameter `FILTER` is not supported"),
    C("invalid_language_parameter_value", ok = false,
      " idx1 LANGUAGE hebrew SChema hash_field1 vector hnsw 6 TYPE FLOAT321 DIM 5 DISTANCE_METRIC IP ",
      "Bad arguments for LANGUAGE: Unknown argument `hebrew`"),
    C("unexpected_language_field", ok = false,
      " idx1 LANGUAGE_FIELD aa SChema hash_field1 vector hnsw 6 TYPE FLOAT321 DIM 5 DISTANCE_METRIC IP ",
      "The parameter `LANGUAGE_FIELD` is not supported"),
    C("invalid_score_parameter_value", ok = false,
      " idx1 SCORE 2 SChema hash_field1 vector hnsw 6 TYPE FLOAT321 DIM 5 DISTANCE_METRIC IP ",
      "`SCORE` parameter with a value `2` is not supported. The value must be between 0.0 and 1.0"),
    C("invalid_negative_score_parameter_value", ok = false,
      " idx1 SCORE -0.5 SChema hash_field1 vector hnsw 6 TYPE FLOAT32 DIM 5 DISTANCE_METRIC IP ",
      "`SCORE` parameter with a value `-0.5` is not supported. The value must be between 0.0 and 1.0"),
    C("invalid_parameter_before_schema", ok = false,
      " idx1 SCOREa 2 SChema hash_field1 vector hnsw 6 TYPE FLOAT321 DIM 5 DISTANCE_METRIC IP ",
      "Unexpected parameter `SCOREa`, expecting `SCHEMA`"),
    C("missing_schema", ok = false, "idx prefix 1 x", "Missing argument"),
    C("missing_schema_2", ok = false, "idx", "Missing argument"),
    C("missing_prefix_for_hash_tagged_index", ok = false, "idx{a}",
      "PREFIX parameter is required for hash-tagged indexes"),
    C("invalid_index_prefix", ok = false, "idx on hash prefix 1 a{b}",
      "PREFIX argument(s) must not contain a hash tag"),
    C("inconsistent_index_prefix_1", ok = false,
      "idx on hash prefix 1 a{b} prefix 1 b",
      "PREFIX argument(s) must not contain a hash tag"),
    C("inconsistent_index_prefix_2", ok = false,
      "idx on hash prefix 1 a{b} prefix 1 b{c}",
      "PREFIX argument(s) must not contain a hash tag"),
    C("inconsistent_index_prefix_3", ok = false,
      "idx on hash prefix 1 a{b} prefix 2 b{c} c",
      "PREFIX argument(s) must not contain a hash tag"),
    C("inconsistent_index_prefix_4", ok = false,
      "idx on hash prefix 1 a{b} prefix 2 b{c} c{d}",
      "PREFIX argument(s) must not contain a hash tag"),
    C("happy_path_text_basic", ok = true,
      "idx1 on HASH SCHEMA text_field TEXT"),
    C("happy_path_text_with_field_parameters", ok = true,
      "idx1 on HASH SCHEMA text_field TEXT WITHSUFFIXTRIE"),
    C("happy_path_text_with_per_index_parameters", ok = true,
      "idx1 on HASH PUNCTUATION \",.;\" WITHOFFSETS NOSTEM STOPWORDS 3 the and or SCHEMA text_field TEXT"),
    C("happy_path_text_per_index_nostopwords", ok = true,
      "idx1 on HASH NOSTOPWORDS SCHEMA text_field TEXT"),
    C("happy_path_text_per_index_stopwords_zero", ok = true,
      "idx1 on HASH STOPWORDS 0 SCHEMA text_field TEXT"),
    C("happy_path_text_with_vector", ok = true,
      "idx1 on HASH SCHEMA text_field TEXT vector_field VECTOR HNSW 6 TYPE FLOAT32 DIM 3 DISTANCE_METRIC IP"),
    C("text_field_nostopwords_invalid", ok = false,
      "idx1 on HASH SCHEMA text_field TEXT NOSTOPWORDS",
      "Invalid field type for field `NOSTOPWORDS`: Missing argument"),
    C("invalid_text_empty_punctuation_per_index", ok = false,
      "idx1 on HASH PUNCTUATION \"\" SCHEMA text_field TEXT",
      "PUNCTUATION string cannot be empty"),
    C("invalid_text_negative_minstemsize", ok = false,
      "idx1 on HASH MINSTEMSIZE -1 SCHEMA text_field TEXT",
      "Error parsing value for the parameter `MINSTEMSIZE` - MINSTEMSIZE must be positive"),
    C("invalid_text_zero_minstemsize", ok = false,
      "idx1 on HASH MINSTEMSIZE 0 SCHEMA text_field TEXT",
      "Error parsing value for the parameter `MINSTEMSIZE` - MINSTEMSIZE must be positive"),
    C("invalid_text_per_field_minstemsize", ok = false,
      "idx1 on HASH SCHEMA text_field TEXT MINSTEMSIZE 2",
      "Invalid field type for field `MINSTEMSIZE`: Unknown argument `2`"),
    C("invalid_per_index_stopwords_before_schema", ok = false,
      "idx1 on HASH STOPWORDS -1 SCHEMA text_field TEXT",
      "Error parsing value for the parameter `STOPWORDS` - `-1` is outside acceptable bounds"),
    C("invalid_per_index_stopwords_missing_words", ok = false,
      "idx1 on HASH STOPWORDS 3 the and SCHEMA text_field TEXT",
      "Unexpected parameter `text_field`, expecting `SCHEMA`"),
    C("text_field_punctuation_single_quote_invalid", ok = false,
      "idx1 on HASH SCHEMA text_field TEXT PUNCTUATION '.,;'",
      "Invalid field type for field `PUNCTUATION`: Unknown argument `.,;`"),
    C("text_field_punctuation_unquoted_invalid", ok = false,
      "idx1 on HASH SCHEMA text_field TEXT PUNCTUATION .,;",
      "Invalid field type for field `PUNCTUATION`: Unknown argument `.,;`"),
    C("text_nooffsets_flag", ok = true,
      "idx1 on HASH NOOFFSETS SCHEMA text_field TEXT"),
    C("text_withsuffixtrie_flag", ok = true,
      "idx1 on HASH SCHEMA text_field TEXT WITHSUFFIXTRIE"),
    C("text_nosuffixtrie_flag", ok = true,
      "idx1 on HASH SCHEMA text_field TEXT NOSUFFIXTRIE"),
    C("text_combined_per_index_and_field_flags", ok = true,
      "idx1 on HASH NOOFFSETS NOSTEM LANGUAGE ENGLISH MINSTEMSIZE 2 SCHEMA text_field TEXT WITHSUFFIXTRIE"),
    C("text_large_stopwords_list_field", ok = false,
      "idx1 on HASH SCHEMA text_field TEXT STOPWORDS 10 a an and are as at be but by for",
      "Invalid field type for field `STOPWORDS`: Unknown argument `10`"),
    C("text_large_stopwords_list_per_index", ok = true,
      "idx1 on HASH STOPWORDS 10 a an and are as at be but by for SCHEMA text_field TEXT"),
    C("text_max_minstemsize", ok = true,
      "idx1 on HASH MINSTEMSIZE 100 SCHEMA text_field TEXT"),
    C("text_field_special_characters_punctuation_invalid", ok = false,
      "idx1 on HASH SCHEMA text_field TEXT PUNCTUATION \"!@#$%^&*()_+-=[]{}|;':,.<>?\"",
      "Invalid field type for field `PUNCTUATION`: Unknown argument `!@#$%^&*()_+-=[]{}|;':,.<>?`"),
    C("text_special_characters_punctuation_per_index", ok = true,
      "idx1 on HASH PUNCTUATION \"!@#$%^&*()_+-=[]{}|;':,.<>?\" SCHEMA text_field TEXT"),
    C("text_multiple_fields_different_configs", ok = true,
      "idx1 on HASH NOSTOPWORDS PUNCTUATION '.,;' MINSTEMSIZE 2 SCHEMA text1 TEXT text2 TEXT NOSTEM"),
    C("invalid_text_single_quote_empty_per_index", ok = false,
      "idx1 on HASH PUNCTUATION '' SCHEMA text_field TEXT",
      "PUNCTUATION string cannot be empty"),
    C("invalid_text_stopwords_negative_count_per_index", ok = false,
      "idx1 on HASH STOPWORDS -1 SCHEMA text_field TEXT",
      "Error parsing value for the parameter `STOPWORDS` - `-1` is outside acceptable bounds"),
    C("invalid_text_stopwords_missing_words_field", ok = false,
      "idx1 on HASH SCHEMA text_field TEXT STOPWORDS 3 the and",
      "Invalid field type for field `STOPWORDS`: Unknown argument `3`"),
    C("invalid_text_stopwords_missing_words_per_index", ok = false,
      "idx1 on HASH STOPWORDS 3 the and SCHEMA text_field TEXT",
      "Unexpected parameter `text_field`, expecting `SCHEMA`"),
    C("invalid_text_field_parameters_per_index", ok = false,
      "idx1 on HASH WITHSUFFIXTRIE MINSTEMSIZE 2 SCHEMA text_field TEXT",
      "Unexpected parameter `WITHSUFFIXTRIE`, expecting `SCHEMA`"),
    C("valid_text_minstemsize_too_large", ok = true,
      "idx1 on HASH MINSTEMSIZE 999999 SCHEMA text_field TEXT"),
    C("invalid_text_unknown_parameter", ok = false,
      "idx1 on HASH SCHEMA text_field TEXT UNKNOWN_PARAM value",
      "Invalid field type for field `UNKNOWN_PARAM`: Unknown argument `value`"),
    C("text_case_insensitive_parameters", ok = true,
      "idx1 on HASH punctuation '.,;' withoffsets nostem SCHEMA text_field text"),
    C("text_case_happy_path_weight", ok = true,
      "idx1 on HASH SCHEMA text_field text weight 1.0"),
    C("invalid_text_weight", ok = false,
      "idx1 on HASH SCHEMA text_field TEXT weight 1.01",
      "Invalid field type for field `text_field`: The `WEIGHT` clause with a value other than `1.0` is not supported."),
    C("text_per_index_and_field_parameters_mixed", ok = true,
      "idx1 on HASH LANGUAGE english PUNCTUATION '.,;' SCHEMA text_field TEXT WITHSUFFIXTRIE"))

  for (c <- cases)
    test(s"ft_create_parser/${c.name}") {
      val r = run(c.name, c.cmd)
      assert(r.isRight == c.ok, s"${c.name}: expected ok=${c.ok}, got $r")
      if (!c.ok && c.err.nonEmpty) {
        val msg = r.swap.toOption.get.getMessage
        assert(msg.contains(c.err), s"${c.name}: message `$msg`")
      }
      // happy paths register and surface via FT._LIST / FT.INFO
      r.foreach { cmds =>
        assert(cmds.execute(Seq("FT._LIST")).asInstanceOf[Seq[String]].nonEmpty)
      }
    }

  test("ft_create_parser/invalid_too_many_attributes (generated)") {
    val fields = (1 to 1001).map(i => s"f$i NUMERIC").mkString(" ")
    val r = run("too_many", s"idx1 SCHEMA $fields")
    assert(r.isLeft && r.swap.toOption.get.getMessage.contains(
      "Invalid range: Value above maximum; The maximum number of attributes cannot exceed 1000."))
  }

  test("ft_create_parser/invalid_text_fields_above_64 (generated)") {
    val fields = (1 to 65).map(i => s"t$i TEXT").mkString(" ")
    val r = run("too_many_text", s"idx1 SCHEMA $fields")
    assert(r.isLeft && r.swap.toOption.get.getMessage.contains(
      "Invalid range: Value above maximum; The maximum number of text fields cannot exceed 64."))
  }

  test("registry checks: already-exists and max-indexes (ft_create_test.cc:218-255)") {
    val engine = new SearchEngine
    val cmds = new Commands(engine, _ => (emptyDocs(true), col("pk")))
    cmds.execute(Seq("FT.CREATE", "dup_reg", "SCHEMA", "hash_field10", "NUMERIC"))
    val e1 = intercept[Exception](
      cmds.execute(Seq("FT.CREATE", "dup_reg", "SCHEMA", "hash_field10", "NUMERIC")))
    assert(e1.getMessage == "Index dup_reg in database 0 already exists.")

    engine.maxIndexes = 2
    cmds.execute(Seq("FT.CREATE", "reg2", "SCHEMA", "hash_field10", "NUMERIC"))
    val e2 = intercept[Exception](
      cmds.execute(Seq("FT.CREATE", "reg3", "SCHEMA", "hash_field10", "NUMERIC")))
    assert(e2.getMessage ==
      "Invalid range: Value above maximum; Maximum number of indexes " +
        "reached (2). Cannot create additional indexes.")
    // dropping frees a slot
    cmds.execute(Seq("FT.DROPINDEX", "reg2"))
    cmds.execute(Seq("FT.CREATE", "reg3", "SCHEMA", "hash_field10", "NUMERIC"))
    assert(engine.listIndexes.toSet == Set("dup_reg", "reg3"))
  }

  test("alias/type effects visible through FT.INFO on the happy paths") {
    val r = run("happy_path_hnsw_and_tag_1",
      " idx1 on HASH PREFIx 3 abc def ghi SChema hash_field10 as a10 tag SEPARATOR '|' CASESENSITIVE hash_field1 as hf11 vector hnsw 6 TYPE FLOAT32 DIM 3 DISTANCE_METRIC IP ")
    val info = r.toOption.get.execute(Seq("FT.INFO", "idx1"))
      .asInstanceOf[DataFrame].collect()
    assert(info.map(_.getAs[String]("field")).toSet == Set("a10", "hf11"))
    assert(info.find(_.getAs[String]("field") == "a10")
      .get.getAs[String]("identifier") == "hash_field10")
  }
}
