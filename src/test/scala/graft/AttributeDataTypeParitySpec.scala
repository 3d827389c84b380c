package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.model._
import graft.sources.Documents

/**
 * Replays the record-extraction semantics of the reference's
 * attribute-data-type layer (testing/attribute_data_type_test.cc over
 * src/attribute_data_type.cc — the S3 HASH / S4 JSON readers):
 *
 *  - HASH HasRecord truth table (exists_key × exists_identifier):
 *    a record exists only when BOTH the key and the field do
 *    (attribute_data_type_test.cc:89-111); in the batch model a
 *    missing field is a NULL attribute (untracked), a missing key is
 *    an absent row.
 *  - HASH FetchAllRecords identifier projection
 *    (attribute_data_type_test.cc:254-284): empty identifier set →
 *    every field; named subsets → exactly those fields. The batch
 *    analogue is column selection over the enriched relation.
 *  - JSON GetRecord value normalization (NormalizeValue,
 *    attribute_data_type_test.cc:385-393): the module's JSON.GET
 *    replies `["res0"]` and the reference strips ONE bracket layer
 *    then ONE quote layer; Spark's get_json_object lands directly on
 *    the same scalar — pinned here against a NormalizeValue model
 *    applied to the reference's reply form.
 *  - JSON missing path → NotFound ≡ NULL/untracked; the `"false"`
 *    identifier of the single_identifier case resolves to nothing and
 *    is simply absent (attribute_data_type_test.cc:536-541).
 */
class AttributeDataTypeParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("attribute-data-type-parity")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = ()

  /** The reference's NormalizeValue: consume one "[...]" layer, then
    * one quote layer (attribute_data_type_test.cc:385-393). */
  private def normalizeValue(record: String): String = {
    var r = record
    if (r.startsWith("[")) {
      r = r.stripPrefix("[")
      if (r.endsWith("]")) r = r.stripSuffix("]")
    }
    if (r.startsWith("\"")) {
      r = r.stripPrefix("\"")
      if (r.endsWith("\"")) r = r.stripSuffix("\"")
    }
    r
  }

  test("HASH HasRecord truth table: record iff key AND identifier exist") {
    val sp = spark; import sp.implicits._
    // exists_key has one field set and one absent; not_exists_key is
    // absent from the relation entirely (an open-failure in the
    // reference). A HASH field is row-level data, so "identifier not
    // set on this key" is a NULL cell, not a missing column.
    val raw = Seq(("exists_key", "present", null.asInstanceOf[String]))
      .toDF("k", "f_exists", "not_exists_identifier")
    val schema = IndexSchema("hash_t", Seq(
      FieldDef("f_exists", TagField()),
      FieldDef("not_exists_identifier", "missing_f", TagField())))
    val docs = Documents.enrich(raw, schema, keyExpr = Some(col("k")))
    val rows = docs.collect()
    assert(rows.length == 1)
    val r = rows.head
    // (exists_key, exists_identifier) → record
    assert(r.getAs[String]("f_exists") == "present")
    // (exists_key, missing identifier) → no record: NULL ≡ untracked
    assert(r.isNullAt(r.fieldIndex("missing_f")))
    // (missing key, ±identifier) → no row at all
    assert(docs.filter(col("__key") === "not_exists_key").count() == 0)
  }

  test("HASH FetchAllRecords projection: empty = all fields, subsets exact") {
    val sp = spark; import sp.implicits._
    val raw = Seq(("k1", "value1", "value2")).toDF("k", "field1", "field2")
    val schema = IndexSchema("fetch_t", Seq(
      FieldDef("field1", TagField()), FieldDef("field2", TagField())))
    val docs = Documents.enrich(raw, schema, keyExpr = Some(col("k")))
    // empty identifier set: every declared field present on the record
    val all = docs.select("field1", "field2").collect().head
    assert(all.getString(0) == "value1" && all.getString(1) == "value2")
    // named subsets project exactly (attribute_data_type_test.cc cases
    // full/field1/field2_identifier) — column pruning, same values
    assert(docs.select("field2").collect().head.getString(0) == "value2")
    assert(docs.select("field1").collect().head.getString(0) == "value1")
  }

  test("JSON GetRecord: get_json_object equals NormalizeValue of the module reply") {
    val sp = spark; import sp.implicits._
    val doc = """{"a":"res1","arr":[1,2],"num":3.5,"nested":{"b":"x"}}"""
    val df = Seq(("key", doc)).toDF("k", "doc")
    // (path, the module's JSON.GET reply form for that path)
    val cases = Seq(
      ("$.a", "[\"res1\"]"),
      ("$.arr", "[[1,2]]"),
      ("$.num", "[3.5]"),
      ("$.nested", "[{\"b\":\"x\"}]"))
    cases.foreach { case (path, moduleReply) =>
      val got = df.select(
        Documents.sourceColumn(s"doc:$path").as("v")).collect().head
      assert(!got.isNullAt(0), s"path $path resolved to null")
      assert(got.getString(0) == normalizeValue(moduleReply),
        s"path $path: got ${got.getString(0)}, " +
          s"want ${normalizeValue(moduleReply)}")
    }
    // missing path → NotFound ≡ NULL (the "false" identifier of the
    // reference's single_identifier case resolves to nothing)
    val missing = df.select(
      Documents.sourceColumn("doc:$.zzz").as("v")).collect().head
    assert(missing.isNullAt(0))
  }

  test("JSON root query: empty identifier set reads the whole document at $") {
    val sp = spark; import sp.implicits._
    // the reference's kJsonRootElementQuery: FetchAllRecords with no
    // identifiers queries `$` (attribute_data_type_test.cc:506-508);
    // the reply ["res0"] normalizes to the root scalar
    val df = Seq(("key", "\"res0\"")).toDF("k", "doc")
    val got = df.select(Documents.sourceColumn("doc:$").as("v"))
      .collect().head
    assert(got.getString(0) == normalizeValue("[\"res0\"]"))
  }
}
