package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Commands, SearchEngine}

/**
 * Replays the reference's FT.SEARCH reply-shaping test table
 * (testing/ft_search_test.cc:202-458 SendReplyTests, :709-745 command
 * forms, :790-871 MaxLimit) through `searchReply`: pre-LIMIT total,
 * offset/number paging against the k-NN result, NOCONTENT, RETURN
 * attribute resolution (duplicates, the score alias, unknown
 * attributes), and the KNN k/EF_RUNTIME caps at the command level.
 *
 * Representational note: the RESP reply simply OMITS a requested
 * attribute a document does not carry (return_3's attribute_alias_10);
 * a DataFrame reply is rectangular, so the same case surfaces as a
 * NULL-valued column — asserted as such.
 */
class FtSearchReplyParitySpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark

  // Three docs at increasing distance from the origin query vector, so
  // the neighbor order is abc < def < ghi like the table's distances.
  private lazy val cmds: Commands = {
    val sp = spark; import sp.implicits._
    val docs: DataFrame = Seq(
      ("abc", "abc_hash_value", Array(0.1f, 0.0f, 0.0f)),
      ("def", "def_hash_value", Array(0.2f, 0.0f, 0.0f)),
      ("ghi", "ghi_hash_value", Array(0.3f, 0.0f, 0.0f)))
      .toDF("pk", "attribute_alias_1", "vec_col")
    val c = new Commands(new SearchEngine, _ => (docs, col("pk")))
    // no PREFIX clause: the reference table injects external ids
    // directly (ft_search_test.cc:227), so prefix matching is not in
    // play — and since the r11 engine-side subscription filter, a
    // non-covering prefix would (correctly) empty the index
    assert(c.execute(Seq("FT.CREATE", "my_index", "ON", "HASH",
      "SCHEMA", "attribute_alias_1", "TEXT",
      "vec_col", "AS", "vector", "VECTOR", "FLAT", "6",
      "TYPE", "FLOAT32", "DIM", "3", "DISTANCE_METRIC", "L2")) == "OK")
    c
  }

  private def blob: String = {
    val bb = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(0.0f, 0.0f, 0.0f).foreach(bb.putFloat)
    new String(bb.array(), java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def search(extra: String*): SearchEngine.SearchReply =
    cmds.execute(Seq("FT.SEARCH", "my_index",
      "*=>[KNN 20 @vector $query_vector AS score_as_1]",
      "PARAMS", "2", "query_vector", blob) ++ extra)
      .asInstanceOf[SearchEngine.SearchReply]

  private def keys(r: SearchEngine.SearchReply): Seq[String] =
    r.rows.map(_.getAs[String]("__key")).toSeq

  test("basic: total + all neighbors in distance order, score column named by AS") {
    val r = search("LIMIT", "0", "10")
    assert(r.total == 3)
    assert(keys(r) == Seq("abc", "def", "ghi"))
    assert(r.rows.head.schema.fieldNames.contains("score_as_1"))
    val scores = r.rows.map(_.getAs[Double]("score_as_1")).toSeq
    assert(scores == scores.sorted)
    // NOCONTENT keeps count and ids only
    val nc = search("LIMIT", "0", "10", "NOCONTENT")
    assert(nc.total == 3 && keys(nc) == Seq("abc", "def", "ghi"))
    assert(nc.rows.head.schema.fieldNames.toSeq == Seq("__key"))
  }

  test("limit_out_of_range: offset beyond results returns the count alone") {
    val r = search("LIMIT", "100", "105")
    assert(r.total == 3 && r.rows.isEmpty)
  }

  test("just_result_count: LIMIT 0 0 returns the count alone") {
    val r = search("LIMIT", "0", "0")
    assert(r.total == 3 && r.rows.isEmpty)
  }

  test("only_first / only_second: single-row pages walk the neighbor order") {
    assert(keys(search("LIMIT", "0", "1")) == Seq("abc"))
    assert(keys(search("LIMIT", "1", "1")) == Seq("def"))
  }

  test("pagination_offset_exceeds_remaining: page clips to what is left") {
    val r = search("LIMIT", "1", "5")
    assert(r.total == 3 && keys(r) == Seq("def", "ghi"))
  }

  test("return_1/2: RETURN aliases resolve; the same attribute can appear " +
      "under two aliases") {
    val r1 = search("LIMIT", "0", "10",
      "RETURN", "3", "attribute_alias_1", "AS", "attribute_alias_11")
    assert(r1.rows.head.schema.fieldNames.toSet == Set("__key", "attribute_alias_11"))
    assert(r1.rows.head.getAs[String]("attribute_alias_11") == "abc_hash_value")
    val r2 = search("LIMIT", "0", "10",
      "RETURN", "4", "attribute_alias_1", "AS", "attribute_alias_11",
      "attribute_alias_1")
    assert(r2.rows.head.schema.fieldNames.toSet ==
      Set("__key", "attribute_alias_11", "attribute_alias_1"))
    assert(r2.rows.head.getAs[String]("attribute_alias_1") == "abc_hash_value")
  }

  test("return_3: an attribute the documents do not carry yields NULL " +
      "(the RESP reply omits it per-doc)") {
    val r = search("LIMIT", "0", "10",
      "RETURN", "5", "attribute_alias_1", "AS", "attribute_alias_11",
      "attribute_alias_10", "attribute_alias_1")
    assert(r.rows.head.schema.fieldNames.toSet ==
      Set("__key", "attribute_alias_11", "attribute_alias_10", "attribute_alias_1"))
    assert(r.rows.forall(row => row.isNullAt(row.fieldIndex("attribute_alias_10"))))
  }

  test("return_4: the score alias is RETURNable like an attribute") {
    val r = search("LIMIT", "0", "10",
      "RETURN", "6", "attribute_alias_1", "AS", "attribute_alias_11",
      "attribute_alias_10", "attribute_alias_1", "score_as_1")
    val cols = r.rows.head.schema.fieldNames.toSet
    assert(cols.contains("score_as_1"))
    val scores = r.rows.map(_.getAs[Double]("score_as_1")).toSeq
    assert(scores == scores.sorted && scores.head < scores.last)
  }

  test("sortby overrides the score order on the page (ft_search sortby_test)") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      ("a", 3.0, Array(0.1f, 0.0f)), ("b", 1.0, Array(0.2f, 0.0f)),
      ("c", 2.0, Array(0.3f, 0.0f)))
      .toDF("pk", "rank", "vec_col")
    val c = new Commands(new SearchEngine, _ => (docs, col("pk")))
    c.execute(Seq("FT.CREATE", "sort_idx", "SCHEMA", "rank", "NUMERIC",
      "vec_col", "AS", "vector", "VECTOR", "FLAT", "6",
      "TYPE", "FLOAT32", "DIM", "2", "DISTANCE_METRIC", "L2"))
    val bb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putFloat(0f); bb.putFloat(0f)
    val b2 = new String(bb.array(), java.nio.charset.StandardCharsets.ISO_8859_1)
    val r = c.execute(Seq("FT.SEARCH", "sort_idx",
      "*=>[KNN 5 @vector $embedding AS score]",
      "PARAMS", "2", "embedding", b2,
      "SORTBY", "rank", "DESC", "DIALECT", "2"))
      .asInstanceOf[SearchEngine.SearchReply]
    assert(r.rows.map(_.getAs[String]("__key")).toSeq == Seq("a", "c", "b"))
  }

  test("KNN k and EF_RUNTIME caps reject at the command level (MaxLimitTests)") {
    def bad(filter: String, msg: String): Unit = {
      val e = intercept[Exception] {
        cmds.execute(Seq("FT.SEARCH", "my_index", filter,
          "PARAMS", "2", "query_vector", blob, "DIALECT", "2"))
      }
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    bad("*=>[KNN 10001 @vector $query_vector AS score]",
      "KNN parameter must be a positive integer greater than 0 and cannot exceed 10000.")
    bad("*=>[KNN 3 @vector $query_vector EF_RUNTIME 1000001 AS score]",
      "`EF_RUNTIME` must be a positive integer greater than 0 and cannot exceed 1000000.")
  }
}
