package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.engine.{SearchEngine, SearchOptions}
import graft.model._
import graft.sources.Documents

/**
 * Replays the reference's string-vector ingestion table
 * (vector_test.cc:293-349 NormalizeStringRecordTests over
 * VectorBase::NormalizeStringRecord, vector_base.cc:532-551): a
 * `[0.1, 0.2]`-style string — the form a JSONPath vector attribute
 * arrives in — parses to a float vector, skipping empty elements; one
 * unparsable element fails the whole record (≡ indexing failure),
 * never a partial vector.
 */
class VectorNormalizeParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("vector-normalize-parity")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = ()

  // the reference case table, verbatim
  private val cases = Seq(
    ("cardinality_1", "[ 0.1]", Some(Seq(0.1f))),
    ("cardinality_1_1", "[,0.1]", Some(Seq(0.1f))),
    ("cardinality_3_1", "[ 0.1, ,0.2,0.3,]", Some(Seq(0.1f, 0.2f, 0.3f))),
    ("cardinality_3_fail", "[ 0.1, ,0.2,a,]", None),
    // absl::SkipWhitespace skips elements that are entirely ANY
    // whitespace, not only 0x20 — a tab/newline-only element is skipped
    // like an empty one, never a failed parse
    ("ws_tab_element", "[0.1,\t,0.2]", Some(Seq(0.1f, 0.2f))),
    ("ws_newline_element", "[0.1,\n ,0.2]", Some(Seq(0.1f, 0.2f))),
    ("ws_padded_value", "[\t0.1 ,\n0.2]", Some(Seq(0.1f, 0.2f))))

  test("NormalizeStringRecord table: element skipping and whole-record failure") {
    val sp = spark; import sp.implicits._
    val df = cases.map { case (name, rec, _) => (name, rec) }.toDF("k", "v")
      .withColumn("parsed", Documents.parseVectorString(col("v")))
    val got = df.collect().map(r =>
      r.getAs[String]("k") -> Option(r.getAs[scala.collection.Seq[Float]]("parsed"))).toMap
    cases.foreach { case (name, _, want) =>
      assert(got(name).map(_.toSeq) == want, s"case $name")
    }
    // no brackets: plain CSV parses too (ConsumePrefix is conditional)
    val plain = Seq(("p", "0.5,0.25")).toDF("k", "v")
      .withColumn("parsed", Documents.parseVectorString(col("v"))).collect()
    assert(plain(0).getAs[scala.collection.Seq[Float]]("parsed").toSeq == Seq(0.5f, 0.25f))
    // an unmatched trailing "]" without "[" stays in the element → fail
    // (the reference consumes "]" only after consuming "[")
    val dangling = Seq(("d", "0.5,0.25]")).toDF("k", "v")
      .withColumn("parsed", Documents.parseVectorString(col("v"))).collect()
    assert(dangling(0).isNullAt(dangling(0).fieldIndex("parsed")))
  }

  // Round-12/13 regression pin: the element grammar is
  // absl::SimpleAtof (the reference's parser), NOT Spark try_cast and
  // NOT Java Float.parseFloat — see Documents.parseFloatElement.
  private val literalCases = Seq(
    // special literals: case-insensitive, optional sign (strtod grammar)
    ("spec_inf_mixed", "inf, -INF, nan",
      Some(Seq(Float.PositiveInfinity, Float.NegativeInfinity, Float.NaN))),
    ("spec_infinity", "[Infinity,+InFiNiTy,-infinity]",
      Some(Seq(Float.PositiveInfinity, Float.PositiveInfinity, Float.NegativeInfinity))),
    ("spec_signed_nan", "+nan, -nan", Some(Seq(Float.NaN, Float.NaN))),
    // scientific + leading-dot spellings are in the decimal grammar
    ("dec_sci", "[3.0e1, .5, 2., +1e-2]", Some(Seq(30f, 0.5f, 2f, 0.01f))),
    // Java-only spellings FAIL the record (SimpleAtof rejects them):
    // type suffixes and hex floats
    ("java_suffix_f", "[1.5f, 2.0]", None),
    ("java_suffix_d", "[1.5d]", None),
    ("java_suffix_D", "[2.0D, 1]", None),
    ("java_hex", "[0x1.8p1]", None),
    ("java_hex_int", "[0x10]", None))

  test("SimpleAtof literal table: inf/nan accepted, Java suffix/hex spellings rejected") {
    val sp = spark; import sp.implicits._
    val df = literalCases.map { case (name, rec, _) => (name, rec) }.toDF("k", "v")
      .withColumn("parsed", Documents.parseVectorString(col("v")))
    val got = df.collect().map(r =>
      r.getAs[String]("k") -> Option(r.getAs[scala.collection.Seq[Float]]("parsed"))).toMap
    literalCases.foreach { case (name, _, want) =>
      (got(name), want) match {
        case (None, None) => ()
        case (Some(g), Some(w)) =>
          assert(g.length == w.length, s"case $name length")
          g.zip(w).zipWithIndex.foreach { case ((gv, wv), i) =>
            if (wv.isNaN) assert(gv.isNaN, s"case $name [$i] NaN")
            else assert(gv == wv, s"case $name [$i]")
          }
        case (g, w) => fail(s"case $name: got $g want $w")
      }
    }
  }

  test("JSON-path string vectors index and KNN-search end-to-end") {
    val sp = spark; import sp.implicits._
    val e = new SearchEngine
    val schema = IndexSchema("jsonvec_t", Seq(
      FieldDef("doc:$.emb", "emb", VectorField(dim = 2, metric = DistanceMetric.L2))))
    val docs = Seq(
      ("k1", """{"emb":"[0.0, 0.0]"}"""),
      ("k2", """{"emb":"[1.0, 0.0]"}"""),
      ("k3", """{"emb":"[5.0, 5.0]"}"""),
      ("k_bad", """{"emb":"[1.0, oops]"}"""), // parse failure → untracked
      ("k_dim", """{"emb":"[1.0, 2.0, 3.0]"}""")) // wrong dim → untracked
      .toDF("__key", "doc")
    e.createIndex(schema, Documents.enrich(docs, schema))

    val rows = e.search("jsonvec_t", "*=>[KNN 2 @emb $q]",
      SearchOptions(params = Map("q" -> graft.query.VectorParam(Array(0.1f, 0.0f)))))
      .collect()
    assert(rows.map(_.getAs[String]("__key")).toSeq == Seq("k1", "k2"))

    // the failures surface in FT.INFO's hash_indexing_failures
    val info = e.info("jsonvec_t").collect()
    assert(info.head.getAs[Long]("hash_indexing_failures") == 2L)
    assert(info.head.getAs[Long]("num_records") == 3L)
  }
}
