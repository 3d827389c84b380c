package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.engine.{Metrics, SearchEngine, SearchOptions}
import graft.model._
import graft.sources.Documents
import graft.text.PostingIndex

/**
 * Replays the reference's reply-generation semantics
 * (testing/query/response_generator_test.cc over
 * src/query/response_generator.cc):
 *
 *  - per-record content limits (ProcessNeighborsForReplyContentLimits):
 *    a record whose fetched content exceeds the size or field-count
 *    limit is erased from the reply and counted in
 *    query_result_record_dropped_cnt;
 *  - post-retrieval filter verification (VerifyFilter,
 *    response_generator.cc:156-185): neighbors fetched from a STALE
 *    index are re-evaluated against live content — a doc that no
 *    longer matches, or no longer exists, drops out of the reply;
 *  - fetched-identifier minimality (the test table's
 *    expected_fetched_identifiers): content fetch reads only the
 *    RETURN attributes plus the filter identifiers — here that is
 *    Catalyst column pruning reaching the parquet scan.
 *
 * HASH/JSON-specific plumbing in the reference table (sortby-identifier
 * aliasing on the `$`-root JSON fetch, slot-ownership skips) has no
 * analytics content and is not replayed.
 */
class ResponseGeneratorParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("response-generator-parity")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = ()

  test("content limits: oversized and many-field records drop from the page, not the total") {
    val sp = spark; import sp.implicits._
    val e = new SearchEngine
    // the reference test pins limit=100 bytes / 2 fields
    // (response_generator_test.cc:168-178)
    e.maxSearchResultRecordSize = 100
    e.maxSearchResultFieldsCount = 2
    val schema = IndexSchema("resp_t", Seq(
      FieldDef("content", TagField()),
      FieldDef("field1", TagField()),
      FieldDef("field2", TagField())))
    val docs = Seq(
      ("small_content_id", "small", "value1", null.asInstanceOf[String]),
      ("large_content_id", "x" * 110, null.asInstanceOf[String], null.asInstanceOf[String]),
      ("many_fields_id", "data", "value1", "value2"))
      .toDF("__key", "content", "field1", "field2")
    e.createIndex(schema, Documents.enrich(docs, schema))

    val before = Metrics.queryResultRecordDropped.get()
    val reply = e.searchReply("resp_t", "*", SearchOptions(
      returnFields = Seq(("content", Some("content_alias")),
        ("field1", Some("field1_alias")), ("field2", Some("field2_alias")))))

    // only the small record survives (reference: neighbors.size()==1)
    assert(reply.rows.length == 1, s"rows: ${reply.rows.mkString(",")}")
    val row = reply.rows(0)
    assert(row.getAs[String]("__key") == "small_content_id")
    assert(row.getAs[String]("content_alias") == "small")
    assert(row.getAs[String]("field1_alias") == "value1")
    // dropped twice: once for size, once for field count
    assert(Metrics.queryResultRecordDropped.get() == before + 2)
    // the drop is a PAGE erase — the match total still counts all three
    assert(reply.total == 3)
  }

  test("content limits: NULL attributes are absent from content — they count neither fields nor bytes") {
    val sp = spark; import sp.implicits._
    val e = new SearchEngine
    e.maxSearchResultFieldsCount = 1
    val schema = IndexSchema("resp_null_t", Seq(
      FieldDef("a", TagField()), FieldDef("b", TagField())))
    val docs = Seq(("k1", "present", null.asInstanceOf[String]))
      .toDF("__key", "a", "b")
    e.createIndex(schema, Documents.enrich(docs, schema))
    // b is NULL → content has ONE entry → within the 1-field limit
    // (the reference's RecordsMap simply lacks absent attributes)
    val reply = e.searchReply("resp_null_t", "*", SearchOptions(
      returnFields = Seq(("a", None), ("b", None))))
    assert(reply.rows.length == 1)

    // NOCONTENT fetches nothing — limits can never drop
    e.maxSearchResultFieldsCount = 0
    val nc = e.searchReply("resp_null_t", "*", SearchOptions(noContent = true))
    assert(nc.rows.length == 1)
  }

  test("content limits: binary values count their raw blob width") {
    val sp = spark; import sp.implicits._
    val e = new SearchEngine
    e.maxSearchResultRecordSize = 100
    val schema = IndexSchema("resp_bin_t", Seq(FieldDef("tagf", TagField())))
    // a 200-byte payload rides along as a non-indexed returned column
    val docs = Seq(
      ("big", "x", Array.fill[Byte](200)(1)),
      ("small", "y", Array.fill[Byte](10)(1)))
      .toDF("__key", "tagf", "payload")
    e.createIndex(schema, Documents.enrich(docs, schema))
    val reply = e.searchReply("resp_bin_t", "*", SearchOptions(
      returnFields = Seq(("payload", None))))
    // 200-byte blob + name exceeds 100; the 10-byte one survives —
    // a "[B@hashcode" string form would have passed both
    assert(reply.rows.map(_.getAs[String]("__key")).toSeq == Seq("small"))
  }

  test("stale index: fetched keys re-verify against live content (VerifyFilter)") {
    val sp = spark; import sp.implicits._
    val e = new SearchEngine
    e.postingRouteMaxSelectivity = 1.0
    val schema = IndexSchema("stale_t", Seq(FieldDef("body", TextField())))
    // v1 was indexed: docA and docB matched "merge" then
    val v1 = Seq(
      ("docA", "alpha merge beta"),
      ("docB", "merge gamma"),
      ("docC", "merge delta"),
      ("docD", "epsilon zeta"))
      .toDF("__key", "body")
    // live state: docA edited to not match, docB deleted, docC intact
    val v2 = Seq(
      ("docA", "alpha beta"),
      ("docC", "merge delta"),
      ("docD", "epsilon zeta"))
      .toDF("__key", "body")
    e.createIndex(schema, Documents.enrich(v2, schema))
    // the posting is STALE — built from v1 (the reference analogue:
    // index sequence number behind the db sequence number)
    e.registerPosting("stale_t", "body",
      PostingIndex.build(Documents.enrich(v1, schema), schema, "body"))
    e.registerPostingStats("stale_t", "body", Map("merg" -> 3L))

    val rows = e.search("stale_t", "@body:merge").collect()
    // the posting fetched {docA, docB, docC}; verification against the
    // live docs kept only docC: docA fails the re-evaluated predicate
    // (reference filter_evaluate_not_match), docB's key is gone
    // (reference missing_keys → NotFoundError → neighbor erased)
    assert(rows.map(_.getAs[String]("__key")).toSeq == Seq("docC"))
    // and the posting route was actually taken (not a silent scan)
    assert(e.lastRouteEstimates.nonEmpty,
      "posting route was not engaged; the verify path was not exercised")
  }

  test("fetched identifiers: the scan reads RETURN attributes + filter identifiers only") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-resp-prune").toString
    (1 to 50).map(i => (s"k$i", i.toDouble, (i * 2).toDouble, (i * 3).toDouble, (i * 4).toDouble))
      .toDF("__key", "f1", "f2", "f3", "f4")
      .write.mode("overwrite").parquet(dir)
    val schema = IndexSchema("prune_t", Seq(
      FieldDef("f1", NumericField), FieldDef("f2", NumericField),
      FieldDef("f3", NumericField), FieldDef("f4", NumericField)))
    val e = new SearchEngine
    e.createIndex(schema, Documents.enrich(spark.read.parquet(dir), schema))

    val df = e.search("prune_t", "@f2:[10 20]",
      SearchOptions(returnFields = Seq(("f1", None))))
    val plan = df.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // the reference's expected_fetched_identifiers: RETURN ∪ filter
    // identifiers — here the parquet ReadSchema must carry exactly
    // those columns (plus the key), with f3/f4 pruned away
    assert(readSchema.contains("f1") && readSchema.contains("f2"),
      s"needed columns missing from scan: $readSchema")
    assert(!readSchema.contains("f3") && !readSchema.contains("f4"),
      s"unreferenced columns not pruned: $readSchema")
    assert(df.collect().length == 6) // f2 = 2i ∈ [10,20] ⇒ i ∈ 5..10
  }
}
