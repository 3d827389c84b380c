package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{SearchEngine, SearchOptions}
import graft.model._
import graft.sources.Documents

/**
 * Replays the reference's numeric-index data-validity semantics
 * (testing/numeric_index_test.cc:87-109 DetectsInvalidData and the
 * inclusive/exclusive range tables): a value that does not parse as a
 * number — text, "nan", empty — is NOT indexed, so the field behaves
 * as missing: no range matches it, and a negated range DOES (the
 * missing-field NOT semantics of search-query.md:203-207).
 *
 * Engine mapping: enrichment casts the raw column to double; a
 * non-numeric string becomes NULL. "nan" casts to NaN, which Spark
 * orders above every value — pinned here to behave exactly like
 * missing for both the range and its negation.
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

  test("a negated range matches the invalid-data keys (missing-field NOT)") {
    assert(keys("-@num:[0 100]") == Set("key1", "key2", "key3"))
    assert(keys("-@num:[-inf +inf]") == Set("key1", "key2", "key3"))
  }

  test("FT.INFO counts invalid data as hash_indexing_failures " +
      "(index_schema.cc reply fields)") {
    val row = engine.info("numpar").collect().head
    assert(row.getAs[Long]("num_docs") == 5)
    // key4/key5 indexed → 2 records; key1/key2/key3 present-but-invalid
    assert(row.getAs[Long]("num_records") == 2)
    assert(row.getAs[Long]("hash_indexing_failures") == 3)
  }

  test("inclusive/exclusive bounds replay (RangeSearchInclusiveExclusive)") {
    assert(keys("@num:[7.5 42]") == Set("key4", "key5"))
    assert(keys("@num:[(7.5 42]") == Set("key4"))
    assert(keys("@num:[7.5 (42]") == Set("key5"))
    assert(keys("@num:[(7.5 (42]") == Set.empty)
    assert(keys("@num:[42 42]") == Set("key4"))
  }
}
