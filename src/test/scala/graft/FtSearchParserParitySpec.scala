package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.engine.{Commands, SearchEngine}

/**
 * Replays the reference's FT.SEARCH command-parser test table
 * (testing/ft_search_parser_test.cc:666-1044) through the public
 * command surface, including its combinatorial DIALECT × LIMIT ×
 * trailing-garbage × NOCONTENT × TIMEOUT sweep
 * (ft_search_parser_test.cc:41-56, 352-380).
 *
 * The reference asserts parsed-struct fields; the Spark engine executes
 * the command, so success cases assert the observable equivalents:
 * row counts vs k, the score pseudo-column name (AS / default
 * `__<alias>_score`, attribute.h:48-50), RETURN projection columns, and
 * NOCONTENT's key-only reply. Failure cases assert rejection — the same
 * accept/reject matrix the reference pins.
 */
class FtSearchParserParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var cmds: Commands = _

  private val nDocs = 6

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("ft-search-parser-parity")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark; import sp.implicits._
    val docs: DataFrame = (1 to nDocs).map { i =>
      (s"doc$i", i * 100.0, if (i % 2 == 0) "electronics" else "books",
       Array(i * 0.1f, i * 0.2f, i * 0.3f), s"r1v$i", s"r2v$i", s"f1v$i", s"f2v$i")
    }.toDF("pk", "attribute_identifier_1", "attribute_identifier_2",
           "vec_col", "r1", "r2", "field1", "field2")
    val engine = new SearchEngine
    cmds = new Commands(engine, _ => (docs, col("pk")))
    // one index per vector alias the table references (the reference
    // registers the index under test_case.attribute_alias per case)
    for ((idx, alias) <- Seq("my_schema_name" -> "vec", "schema_vec1" -> "vec1")) {
      assert(cmds.execute(Seq("FT.CREATE", idx, "ON", "HASH", "PREFIX", "1", "doc",
        "SCHEMA",
        "attribute_identifier_1", "NUMERIC",
        "attribute_identifier_2", "TAG",
        "vec_col", "AS", alias, "VECTOR", "FLAT", "6",
        "DIM", "3", "TYPE", "FLOAT32", "DISTANCE_METRIC", "L2")) == "OK")
    }
  }
  override def afterAll(): Unit = ()

  /** Little-endian FLOAT32 wire blob as an argv token (COMMANDS.md:205). */
  private def blobOf(fs: Array[Float]): String = {
    val bb = java.nio.ByteBuffer.allocate(fs.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fs.foreach(bb.putFloat)
    new String(bb.array(), java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Mirror of FTSearchParserTestCase (ft_search_parser_test.cc:57-81). */
  private case class C(
      name: String,
      success: Boolean,
      paramsStr: String = "",
      filterStr: String = "",
      attributeAlias: String = "vec",
      k: Int = -1,
      scoreAs: String = "",
      returnStr: String = "",
      returnAttrs: Map[String, String] = Map.empty,
      noContent: Boolean = false,
      searchParamsStr: String = "",
      blobNumFloats: Option[Int] = None,
      vectorQuery: Boolean = true,
      sortbyStr: String = "",
      withSortKeys: Boolean = false)

  // The reference's option sweeps (ft_search_parser_test.cc:41-56)
  private val dialectOptions = Seq(
    (true, ""), (true, "DIALECt 2"), (true, "DIALECt 3"), (true, "DIALECt 4"),
    (true, "DIALECT 2"), (false, "DIALECT 1"), (false, "DIALECT -2"),
    (false, "DIALECT 5"))
  private val limitOptions = Seq(
    (true, ""), (true, "LIMiT 0 0"), (true, "LIMIT 0 6"), (true, "LIMIT 1 5"),
    (false, "LIMIT -10 5"), (false, "LIMIT 10 -5"))

  private def tok(s: String): Seq[String] =
    s.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  /** Argv assembly ≡ DoVectorSearchParserTest (ft_search_parser_test.cc:
    * 100-246): index, filter, NOCONTENT?, RETURN…, TIMEOUT?, LIMIT…,
    * PARAMS…+blob kv, search params, DIALECT (vector only), SORTBY…,
    * trailing garbage?. */
  private def buildArgs(c: C, index: String, dialect: String, limit: String,
                        endParam: Boolean, noContent: Boolean,
                        timeout: Option[Long]): Seq[String] = {
    val floats = c.blobNumFloats.map(n => Array.fill(n)(0.1f))
      .getOrElse(Array(0.1f, 0.2f, 0.3f))
    val b = Seq.newBuilder[String]
    b += "FT.SEARCH"; b += index; b += c.filterStr
    if (noContent) b += "NoContent"
    b ++= tok(c.returnStr)
    timeout.foreach { t => b += "Timeout"; b += t.toString }
    b ++= tok(limit)
    b ++= tok(c.paramsStr)
    if (c.vectorQuery) { b += "BLOB"; b += blobOf(floats) }
    b ++= tok(c.searchParamsStr)
    if (c.vectorQuery) b ++= tok(dialect)
    b ++= tok(c.sortbyStr)
    if (endParam) b += "END_UNEXPECTED_PARAM"
    b.result()
  }

  private def run(args: Seq[String]): Either[Throwable, SearchEngine.SearchReply] =
    try Right(cmds.execute(args).asInstanceOf[SearchEngine.SearchReply])
    catch { case e: Throwable => Left(e) }

  private def indexFor(c: C): String =
    if (c.vectorQuery && c.attributeAlias == "vec1" && c.success) "schema_vec1"
    else "my_schema_name"

  /** Success-side field assertions (the parsed-struct checks of
    * ft_search_parser_test.cc:256-310, observed through the reply). */
  private def assertReply(c: C, r: SearchEngine.SearchReply,
                          noContentFlag: Boolean): Unit = {
    val cols = if (r.rows.nonEmpty) r.rows.head.schema.fieldNames.toSet else Set.empty[String]
    if (c.vectorQuery && c.k > 0) {
      assert(r.rows.length <= c.k, s"${c.name}: rows>k")
      val wantScore =
        if (c.scoreAs.nonEmpty) c.scoreAs else s"__${c.attributeAlias}_score"
      if (r.rows.nonEmpty && !(noContentFlag || c.noContent) && c.returnAttrs.isEmpty)
        assert(cols.contains(wantScore), s"${c.name}: score col $wantScore missing in $cols")
    }
    if (noContentFlag || c.noContent) {
      // NOCONTENT keeps the sort key when WITHSORTKEYS asked for it
      val want = Set("__key") ++ (if (c.withSortKeys) Set("__sortkey") else Set.empty)
      if (r.rows.nonEmpty)
        assert(cols == want, s"${c.name}: NOCONTENT reply not key-only: $cols")
    } else if (c.returnAttrs.nonEmpty) {
      val want = c.returnAttrs.values.toSet + "__key"
      if (r.rows.nonEmpty)
        assert(cols == want, s"${c.name}: RETURN cols $cols != $want")
    }
    if (c.withSortKeys && r.rows.nonEmpty) {
      assert(cols.contains("__sortkey"), s"${c.name}: WITHSORTKEYS missing __sortkey")
      assert(r.rows.forall(_.getAs[String]("__sortkey").startsWith("#")))
    }
  }

  /** The reference's per-case runner: failures and parameterized cases
    * once; plain successes swept over the option grids. Accept-side
    * sweep executions run for the designated case only (every reject
    * combo is validated for all — rejects never reach Spark). */
  private def exercise(c: C, sweepAccepts: Boolean): Unit = {
    val idx = indexFor(c)
    if (!c.success || c.searchParamsStr.nonEmpty) {
      val res = run(buildArgs(c, idx, "", "", endParam = false,
        noContent = false, timeout = None))
      assert(res.isRight == c.success,
        s"${c.name}: expected success=${c.success}, got $res")
      res.foreach(assertReply(c, _, noContentFlag = false))
      // non-vector successes skip the dialect grid like the reference
      // (dialect is only appended for vector queries) but still honor
      // the bad-limit and trailing-garbage rejects
      if (c.success) {
        assert(run(buildArgs(c, idx, "", "LIMIT -10 5", endParam = false,
          noContent = false, timeout = None)).isLeft, s"${c.name}: LIMIT -10 accepted")
        assert(run(buildArgs(c, idx, "", "", endParam = true,
          noContent = false, timeout = None)).isLeft, s"${c.name}: trailing garbage accepted")
        assert(run(buildArgs(c, idx, "", "", endParam = false,
          noContent = false, timeout = Some(60001L))).isLeft, s"${c.name}: TIMEOUT 60001 accepted")
      }
      return
    }
    // dialect is only appended for vector queries (the reference's
    // FloatToValkeyStringVector/dialect block is vector-gated), so the
    // dialect grid collapses to its first entry for non-vector cases
    val dialects = if (c.vectorQuery) dialectOptions else dialectOptions.take(1)
    for ((dialectOk, dialect) <- dialects; (limitOk, limit) <- limitOptions) {
      val expected = dialectOk && limitOk
      val base = dialect.isEmpty && limit.isEmpty
      if (!expected || base || sweepAccepts) {
        val res = run(buildArgs(c, idx, dialect, limit, endParam = false,
          noContent = false, timeout = None))
        assert(res.isRight == expected,
          s"${c.name} [$dialect|$limit]: expected $expected, got $res")
        res.foreach(assertReply(c, _, noContentFlag = false))
      }
      if (base) {
        // trailing garbage always rejects (add_end_unexpected_param)
        assert(run(buildArgs(c, idx, dialect, limit, endParam = true,
          noContent = false, timeout = None)).isLeft, s"${c.name}: trailing garbage accepted")
        // TIMEOUT beyond kMaxTimeoutMs rejects; a legal one is accepted
        assert(run(buildArgs(c, idx, dialect, limit, endParam = false,
          noContent = false, timeout = Some(60001L))).isLeft, s"${c.name}: TIMEOUT 60001 accepted")
        // argv NOCONTENT composes with the case (no_content || flag)
        val nc = run(buildArgs(c, idx, dialect, limit, endParam = false,
          noContent = true, timeout = None))
        assert(nc.isRight, s"${c.name}: NOCONTENT variant rejected: $nc")
        nc.foreach(assertReply(c, _, noContentFlag = true))
      }
    }
    if (sweepAccepts) {
      val t = run(buildArgs(c, idx, "", "", endParam = false,
        noContent = false, timeout = Some(100L)))
      assert(t.isRight, s"${c.name}: TIMEOUT 100 rejected")
    }
  }

  // The test table, field-for-field from ft_search_parser_test.cc:666-1044.
  private val cases = Seq(
    C("happy_path", success = true, paramsStr = "PARAMS 4 EF 150",
      filterStr = "*=>[KNN 10 @vec $BLOB EF_RUNTIME $EF]", k = 10),
    C("happy_path_k_as_param", success = true, paramsStr = "PARAMS 6 EF 150 K 10",
      filterStr = "*=>[KNN $K @vec $BLOB EF_RUNTIME $EF]", k = 10),
    C("happy_path_include_search_params_1", success = true,
      paramsStr = "PARAMS 6 EF 150 K 10",
      filterStr = "*=>[KNN $K @vec $BLOB EF_RUNTIME $EF]", k = 10,
      returnAttrs = Map("r1" -> "r1", "r2" -> "r2"), noContent = true,
      searchParamsStr = "NoContent RETURN 2 r1 r2 TIMEOUT 100"),
    C("happy_path_include_search_params_2", success = true,
      paramsStr = "PARAMS 6 EF 150 K 10",
      filterStr = "*=>[KNN $K @vec $BLOB EF_RUNTIME $EF]", k = 10,
      returnAttrs = Map("r1" -> "r1", "r2" -> "r2"), noContent = true,
      searchParamsStr = "TIMEOUT 200 RETURN 2 r1 r2 NOCONTENT"),
    C("happy_path_braces_prefilter", success = true, paramsStr = "PARAMS 4 EF 190",
      filterStr = "(*)=>[KNN 10 @vec $BLOB EF_RUNTIMe $EF]", k = 10),
    C("happy_path_braces_prefilter_with_score_as", success = true,
      paramsStr = "PARAMS 4 EF 190",
      filterStr = "(*)=>[KNN 10 @vec $BLOB EF_RUNTIMe $EF As as_test]",
      k = 10, scoreAs = "as_test"),
    C("happy_path_numeric", success = true,
      filterStr = "@attribute_identifier_1:[300 1000]", attributeAlias = "",
      k = 0, vectorQuery = false),
    C("happy_path_numeric_scientific_notation", success = true,
      filterStr = "@attribute_identifier_1:[-1e-2 1e+3]", attributeAlias = "",
      k = 0, vectorQuery = false),
    C("happy_path_tag", success = true,
      filterStr = "@attribute_identifier_2:{electronics}", attributeAlias = "",
      k = 0, vectorQuery = false),
    C("happy_path_numeric_and_tag", success = true,
      filterStr = "@attribute_identifier_2:{electronics} @attribute_identifier_1:[300 1000]",
      attributeAlias = "", k = 0, vectorQuery = false),
    C("unexpected_prefilter_param", success = false, paramsStr = "PARAMS 4 EF 190",
      filterStr = "(*)=>[KNN 10 @vec $BLOB EF_RUNTIMe $EF bubu 3 As as_test]"),
    C("missing_ef_runtime_value", success = false, paramsStr = "PARAMS 4 EF 190",
      filterStr = "(*)=>[KNN 10 @vec $BLOB EF_RUNTIMe]"),
    C("missing_as_score_value", success = false, paramsStr = "PARAMS 4 EF 190",
      filterStr = "(*)=>[KNN 10 @vec $BLOB EF_RUNTIMe 10 AS]"),
    C("happy_path_as_before_ef_runtime", success = true, paramsStr = "PARAMS 4 EF 190",
      filterStr = "(*)=>[KNN 10 @vec $BLOB As as_test EF_RUNTIMe $EF]",
      k = 10, scoreAs = "as_test"),
    C("empty_hash_field", success = false, paramsStr = "PARAMS 4 EF 190",
      filterStr = "(*)=>[KNN 10 @ $BLOB As as_test EF_RUNTIMe $EF]"),
    C("happy_path_1", success = true, paramsStr = "PARAMS 2",
      filterStr = " * => [KNN 10 @vec $BLOB]", k = 10),
    C("vector_blob_size_too_small", success = false, paramsStr = "PARAMS 2",
      filterStr = " * => [KNN 10 @vec $BLOB]", blobNumFloats = Some(2)),
    C("vector_blob_size_too_large", success = false, paramsStr = "PARAMS 2",
      filterStr = " * => [KNN 10 @vec $BLOB]", blobNumFloats = Some(4)),
    C("happy_path_1_with_score_as", success = true, paramsStr = "PARAMS 2",
      filterStr = " * => [KNN 10 @vec $BLOB as as_test_1]", k = 10,
      scoreAs = "as_test_1"),
    C("happy_path_2", success = true, paramsStr = "PARAMS 2",
      filterStr = "* =>[KNN 5 @vec1 $BLOB]", attributeAlias = "vec1", k = 5),
    C("happy_path_with_return_1", success = true, paramsStr = "PARAMS 2",
      filterStr = "* =>[KNN 5 @vec1 $BLOB]", attributeAlias = "vec1", k = 5,
      returnStr = "return 2 r1 r2", returnAttrs = Map("r1" -> "r1", "r2" -> "r2")),
    C("happy_path_with_return_2", success = true, paramsStr = "PARAMS 2",
      filterStr = "* =>[KNN 5 @vec1 $BLOB]", attributeAlias = "vec1", k = 5,
      returnStr = "return 4 r1 as r11 r2", returnAttrs = Map("r1" -> "r11", "r2" -> "r2")),
    C("happy_path_with_return_3", success = true, paramsStr = "PARAMS 2",
      filterStr = "* =>[KNN 5 @vec1 $BLOB]", attributeAlias = "vec1", k = 5,
      returnStr = "return 0", noContent = true),
    C("missing_index_field", success = false, paramsStr = "PARAMS 2",
      filterStr = "* =>[KNN 5 @vec1 $BLOB]", k = 5),
    C("missing_index_field_w_score_as", success = false, paramsStr = "PARAMS 2",
      filterStr = "* =>[KNN 5 @vec1 $BLOB]", k = 5, scoreAs = "as_test_1"),
    C("missing_return_1", success = false, paramsStr = "PARAMS 2",
      filterStr = "* =>[KNN 5 @vec1 $BLOB]", attributeAlias = "vec1", k = 5,
      returnStr = "return 3 r1 as r11 r2"),
    C("missing_params", success = false, paramsStr = "PARAMS 4",
      filterStr = "* =>[KNn 10 @vec $BLOB]"),
    C("bad_blob_name", success = false, paramsStr = "PARAMS 4 EF 150",
      filterStr = "(*)=>[KNN 10 @vec $BLOB1 EF_RUNTIME $EF]"),
    C("missing_blob", success = false, paramsStr = "PARAMS 2",
      filterStr = "(*)=>[KNN 10 @vec ]"),
    C("extra_blob", success = false, paramsStr = "PARAMS 4 EXTRABLOB 123",
      filterStr = " * => [KNN 10 @vec $BLOB]"),
    C("duplicate_blob", success = false, paramsStr = "PARAMS 6 EXTRABLOB 123 EXTRABLOB 123",
      filterStr = " * => [KNN 10 @vec $BLOB]"),
    C("odd_param_count", success = false, paramsStr = "PARAMS 1",
      filterStr = " * => [KNN 10 @vec $BLOB]"),
    C("missing_hash_field", success = false, paramsStr = "PARAMS 2",
      filterStr = "(*)=>[KNN 10 $BLOB1 EF_RUNTIME $EF ]"),
    C("invalid_prefilter_1", success = false, paramsStr = "PARAMS 2",
      filterStr = "*)=>[KNN 10 @vec $BLOB]"),
    C("invalid_prefilter_2", success = false, paramsStr = "PARAMS 2",
      filterStr = "(*=>[KNN 10 @vec $BLOB]"),
    C("invalid_prefilter_3", success = false, paramsStr = "PARAMS 2",
      filterStr = "(*)=[KNN 10 @vec $BLOB]"),
    C("invalid_vector_parameters_1", success = false, paramsStr = "PARAMS 2",
      filterStr = "(*)=>ss[KNN 10 @vec $BLOB]"),
    C("invalid_vector_parameters_2", success = false, paramsStr = "PARAMS 2",
      filterStr = "(*)=>[KNN 10 @vec $BLOB] aa"),
    C("invalid_vector_parameters_3", success = false, paramsStr = "PARAMS 2",
      filterStr = "(*)=>[]"),
    C("happy_path_3", success = true, paramsStr = "PARAMS 2",
      filterStr = "* =>  [KNN 5 @vec1 $BLOB]", attributeAlias = "vec1", k = 5),
    C("missing_knn_param", success = false, paramsStr = "PARAMS 2",
      filterStr = "* =>  [@vec1 $BLOB]", attributeAlias = "vec1"),
    C("missing_knn_argument", success = false, paramsStr = "PARAMS 2",
      filterStr = "* =>  [KNN aa @vec1 $BLOB]", attributeAlias = "vec1"),
    C("single_params", success = false, paramsStr = "PARAMS 2",
      filterStr = "* =>  [KNN]"),
    C("two_params", success = false, paramsStr = "PARAMS 2",
      filterStr = "* =>  [KNN 10]"),
    C("three_params", success = false, paramsStr = "PARAMS 2",
      filterStr = "* =>  [KNN 10 @vec1 ]", attributeAlias = "vec1"),
    C("verbatim_vector_query", success = true, paramsStr = "PARAMS 2",
      filterStr = "* =>[KNN 5 @vec $BLOB]", k = 5, searchParamsStr = "VERBATIM"),
    C("verbatim_non_vector_query", success = true,
      filterStr = "@attribute_identifier_1:[300 1000]", attributeAlias = "",
      k = 0, searchParamsStr = "VERBATIM", vectorQuery = false),
    C("inorder_vector_query", success = true, paramsStr = "PARAMS 2",
      filterStr = "* =>[KNN 5 @vec $BLOB]", k = 5, searchParamsStr = "INORDER"),
    C("inorder_non_vector_query", success = true,
      filterStr = "@attribute_identifier_1:[300 1000]", attributeAlias = "",
      k = 0, searchParamsStr = "INORDER", vectorQuery = false),
    C("slop_vector_query", success = true, paramsStr = "PARAMS 2",
      filterStr = "* =>[KNN 5 @vec $BLOB]", k = 5, searchParamsStr = "SLOP 3"),
    C("slop_non_vector_query", success = true,
      filterStr = "@attribute_identifier_1:[300 1000]", attributeAlias = "",
      k = 0, searchParamsStr = "SLOP 5", vectorQuery = false),
    C("slop_zero_value", success = true, paramsStr = "PARAMS 2",
      filterStr = "* =>[KNN 5 @vec $BLOB]", k = 5, searchParamsStr = "SLOP 0"),
    C("multiple_parameters_vector_query", success = true, paramsStr = "PARAMS 4 EF 150",
      filterStr = "* =>[KNN 10 @vec $BLOB EF_RUNTIME $EF]", k = 10,
      searchParamsStr = "VERBATIM INORDER SLOP 2"),
    C("multiple_parameters_non_vector_query", success = true,
      filterStr = "@attribute_identifier_1:[300 1000]", attributeAlias = "",
      k = 0, searchParamsStr = "VERBATIM SLOP 1", vectorQuery = false),
    C("all_parameters_combined", success = true, paramsStr = "PARAMS 2",
      filterStr = "* =>[KNN 8 @vec $BLOB]", k = 8,
      searchParamsStr = "VERBATIM INORDER SLOP 4 TIMEOUT 300"),
    C("search_params_with_return_and_timeout", success = true, paramsStr = "PARAMS 2",
      filterStr = "* =>[KNN 7 @vec $BLOB]", k = 7,
      returnAttrs = Map("field1" -> "field1", "field2" -> "field2"),
      searchParamsStr = "RETURN 2 field1 field2 TIMEOUT 400"),
    C("negative_slop_vector_query", success = false, paramsStr = "PARAMS 2",
      filterStr = "* =>[KNN 5 @vec $BLOB]", k = 5, searchParamsStr = "SLOP -1"),
    C("negative_slop_non_vector_query", success = false,
      filterStr = "@attribute_identifier_1:[300 1000]", attributeAlias = "",
      k = 0, searchParamsStr = "SLOP -5", vectorQuery = false),
    C("negative_slop_large_negative_value", success = false, paramsStr = "PARAMS 2",
      filterStr = "* =>[KNN 3 @vec $BLOB]", k = 3, searchParamsStr = "SLOP -100"),
    C("sortby_numeric_asc", success = true,
      filterStr = "@attribute_identifier_1:[300 1000]", attributeAlias = "",
      k = 0, vectorQuery = false,
      sortbyStr = "SORTBY attribute_identifier_1 ASC"),
    C("sortby_numeric_desc", success = true,
      filterStr = "@attribute_identifier_1:[300 1000]", attributeAlias = "",
      k = 0, vectorQuery = false,
      sortbyStr = "SoRTbY attribute_identifier_1 DeSC"),
    C("sortby_tag_default", success = true,
      filterStr = "@attribute_identifier_2:{electronics}", attributeAlias = "",
      k = 0, vectorQuery = false,
      sortbyStr = "SORTBY attribute_identifier_2"),
    C("sortby_field_not_present", success = false,
      filterStr = "@attribute_identifier_2:{electronics}", attributeAlias = "",
      k = 0, vectorQuery = false,
      sortbyStr = "sORTBy nonexistent_field ASc"),
    C("with_sort_keys", success = true,
      filterStr = "@attribute_identifier_2:{electronics}", attributeAlias = "",
      k = 0, vectorQuery = false,
      sortbyStr = "SORtBY attribute_identifier_2 WITHSORTKEYS",
      withSortKeys = true))

  for (c <- cases)
    test(s"ft_search_parser/${c.name}") {
      exercise(c, sweepAccepts = c.name == "happy_path")
    }

  test("sortby order is actually applied (asc vs desc)") {
    val asc = run(Seq("FT.SEARCH", "my_schema_name", "*",
      "SORTBY", "attribute_identifier_1", "ASC")).toOption.get
    val desc = run(Seq("FT.SEARCH", "my_schema_name", "*",
      "SORTBY", "attribute_identifier_1", "DESC")).toOption.get
    val ascVals = asc.rows.map(_.getAs[Double]("attribute_identifier_1")).toSeq
    assert(ascVals == ascVals.sorted)
    assert(desc.rows.map(_.getAs[Double]("attribute_identifier_1")).toSeq ==
      ascVals.sorted.reverse)
  }

  test("error messages carry the reference's phrasing for the pinned cases") {
    def msg(args: Seq[String]): String = run(args).swap.toOption.get.getMessage
    assert(msg(Seq("FT.SEARCH", "my_schema_name", " * => [KNN 10 @vec $BLOB]",
      "PARAMS", "4", "EXTRABLOB", "123", "BLOB", blobOf(Array(0.1f, 0.2f, 0.3f))))
      .contains("Parameter `EXTRABLOB` not used."))
    assert(msg(Seq("FT.SEARCH", "my_schema_name", " * => [KNN 10 @vec $BLOB]",
      "PARAMS", "6", "X", "1", "X", "1", "BLOB", blobOf(Array(0.1f, 0.2f, 0.3f))))
      .contains("Parameter X is already defined."))
    assert(msg(Seq("FT.SEARCH", "my_schema_name", " * => [KNN 10 @vec $BLOB]",
      "PARAMS", "1", "BLOB", blobOf(Array(0.1f, 0.2f, 0.3f))))
      .contains("Parameter count must be an even number."))
    assert(msg(Seq("FT.SEARCH", "my_schema_name", " * => [KNN 10 @vec $BLOB]",
      "LIMIT", "-10", "5",
      "PARAMS", "2", "BLOB", blobOf(Array(0.1f, 0.2f, 0.3f))))
      .contains("outside acceptable bounds"))
    assert(msg(Seq("FT.SEARCH", "my_schema_name", "* =>[KNN 5 @nope $BLOB]",
      "PARAMS", "2", "BLOB", blobOf(Array(0.1f, 0.2f, 0.3f))))
      .contains("Index field `nope` does not exist"))
    assert(msg(Seq("FT.SEARCH", "my_schema_name", " * => [KNN 10 @vec $BLOB]",
      "PARAMS", "2", "BLOB", blobOf(Array(0.1f, 0.2f))))
      .contains("query vector blob size (8) does not match index's expected size (12)."))
  }
}
