package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{SearchEngine, SearchOptions}
import graft.model._
import graft.sources.Documents

/**
 * Replays the reference's numeric-index data-validity semantics
 * (testing/numeric_index_test.cc:87-109 DetectsInvalidData; the
 * whole-key drop of index_schema.cc SyncProcessMutation →
 * RemoveKeyFromAllIndexes, active since 1.3.0 and pinned by the
 * compatibility corpus 'bad numbers' goldens): a value that does not
 * parse as a number — text, "nan", empty — is INVALID DATA, and a key
 * carrying any invalid indexed attribute is removed from the index AS
 * A WHOLE. No range matches it, and neither does a negated range (the
 * key is not in the index at all — stronger than missing-field
 * semantics, which only apply to ABSENT attributes).
 *
 * Engine mapping: enrichment casts the raw column to double (invalid →
 * NULL) and marks the document invalid; createIndex filters marked
 * docs out of the serving relation while FT.INFO still counts them as
 * hash_indexing_failures from the unfiltered view.
 */
class NumericIndexParitySpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark

  private lazy val engine: SearchEngine = {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      ("key1", "not_a_number"),
      ("key2", "nan"),
      ("key3", ""),
      ("key4", "42"),
      ("key5", "7.5"))
      .toDF("__key", "num")
    val schema = IndexSchema("numpar", Seq(FieldDef("num", NumericField)))
    new SearchEngine().createIndex(schema, Documents.enrich(docs, schema))
  }

  private def keys(q: String): Set[String] =
    engine.search("numpar", q, SearchOptions(limit = (0, 10), noContent = true))
      .collect().map(_.getString(0)).toSet

  test("invalid data (text / nan / empty) is not matched by any range") {
    assert(keys("@num:[-inf +inf]") == Set("key4", "key5"))
    assert(keys("@num:[0 100]") == Set("key4", "key5"))
  }

  test("a negated range does NOT match invalid-data keys (whole-key drop)") {
    // pre-1.3.0 legacy would return the invalid keys here (field
    // treated as missing); the corpus-pinned behavior removes them
    assert(keys("-@num:[0 100]") == Set.empty)
    assert(keys("-@num:[-inf +inf]") == Set.empty)
  }

  test("FT.INFO counts invalid data as hash_indexing_failures " +
      "(index_schema.cc reply fields)") {
    val row = engine.info("numpar").collect().head
    // num_docs counts the INDEX population — the three invalid keys
    // were removed whole, but their failures still count
    assert(row.getAs[Long]("num_docs") == 2)
    assert(row.getAs[Long]("num_records") == 2)
    assert(row.getAs[Long]("hash_indexing_failures") == 3)
  }

  test("a native DOUBLE source treats NaN as a VALUE: served, never a failure — " +
      "serving and FT.INFO agree on the conversion boundary") {
    // The invalid-data concept exists exactly where a CONVERSION can
    // fail (string/JSON sources — the reference's only source shapes).
    // A native typed double column has no reference analogue; NaN is a
    // representable value of the type. The engine neither drops such
    // rows nor counts them as hash_indexing_failures (r14 ADVICE found
    // the two sides disagreeing — FT.INFO counted what serving kept;
    // resolved on the NATIVE side of the boundary so the serving scan
    // stays prunable to RETURN ∪ filter identifiers, the reference's
    // own fetch model pinned by ResponseGeneratorParitySpec).
    val sp = spark; import sp.implicits._
    val docs = Seq(
      ("d1", 1.5), ("d2", Double.NaN), ("d3", 42.0))
      .toDF("__key", "num") // num is already DoubleType, alias == identifier
    val schema = IndexSchema("numnative", Seq(FieldDef("num", NumericField)))
    val e = new SearchEngine().createIndex(schema, Documents.enrich(docs, schema))
    def k(q: String): Set[String] =
      e.search("numnative", q, SearchOptions(limit = (0, 10), noContent = true))
        .collect().map(_.getString(0)).toSet
    // Spark NaN ordering: NaN is larger than any double, equal to itself
    assert(k("@num:[-inf +inf]") == Set("d1", "d2", "d3"))
    assert(k("@num:[0 100]") == Set("d1", "d3"))
    assert(k("-@num:[-inf +inf]") == Set.empty)
    val row = e.info("numnative").collect().head
    assert(row.getAs[Long]("num_docs") == 3) // nothing dropped
    assert(row.getAs[Long]("hash_indexing_failures") == 0) // nothing failed
  }

  test("inclusive/exclusive bounds replay (RangeSearchInclusiveExclusive)") {
    assert(keys("@num:[7.5 42]") == Set("key4", "key5"))
    assert(keys("@num:[(7.5 42]") == Set("key4"))
    assert(keys("@num:[7.5 (42]") == Set("key5"))
    assert(keys("@num:[(7.5 (42]") == Set.empty)
    assert(keys("@num:[42 42]") == Set("key4"))
  }
}
