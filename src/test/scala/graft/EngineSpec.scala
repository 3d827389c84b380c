package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{SearchEngine, SearchOptions}
import graft.model._
import graft.query.VectorParam
import graft.sources.Documents

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
}

class EngineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val engine = Fixtures.engine(spark, sf)

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("NOT includes docs missing the field (search-query.md:203-207)") {
    val docs = Seq(
      ("k1", Some("comedy"), Some(2018.0)),
      ("k2", Some("horror"), Some(2016.0)),
      ("k3", None: Option[String], Some(2020.0)),
      ("k4", Some("comedy"), None: Option[Double])
    ).toDF("__key", "genre", "year")
    val schema = IndexSchema("books", Seq(
      FieldDef("genre", TagField()), FieldDef("year", NumericField)))
    val e = new SearchEngine().createIndex(schema, Documents.enrich(docs, schema))
    val keys = e.search("books", "-@genre:{comedy}", SearchOptions(limit = (0, 10)))
      .select("__key").as[String].collect().toSet
    assert(keys == Set("k2", "k3")) // k3 has no genre → matches the negation
    val withYear = e.search("books", "-@genre:{comedy} @year:[2015 2024]",
      SearchOptions(limit = (0, 10))).select("__key").as[String].collect().toSet
    assert(withYear == Set("k2", "k3"))
  }

  test("suffix search requires WITHSUFFIXTRIE (filter_parser.cc:782-815)") {
    val docs = Seq(
      ("k1", "window pane", "meadow view"),
      ("k2", "harbor light", "shadow play")
    ).toDF("__key", "plain", "trie")
    val schema = IndexSchema("sfxrules", Seq(
      FieldDef("plain", TextField()), // withSuffixTrie = false (reference default)
      FieldDef("trie", TextField(withSuffixTrie = true))))
    val e = new SearchEngine().createIndex(schema, Documents.enrich(docs, schema))
    def run(q: String): Set[String] =
      e.search("sfxrules", q, SearchOptions(limit = (0, 10), noContent = true))
        .collect().map(_.getString(0)).toSet

    // fielded suffix/infix on a NOSUFFIXTRIE field → the reference error
    for (q <- Seq("@plain:*dow", "@plain:*arbo*")) {
      val err = intercept[Exception](run(q))
      assert(err.getMessage.contains("Field does not support suffix search"), q)
    }
    // fielded on the trie field works
    assert(run("@trie:*dow") == Set("k1", "k2")) // meadow, shadow
    // unfielded suffix searches ONLY trie-backed fields: 'window'
    // (plain field, k1) must not match, meadow/shadow do
    assert(run("*dow") == Set("k1", "k2"))
    assert(run("*pane") == Set.empty) // only in the plain field → invisible
    // prefix needs no trie (with_suffix=false in the reference parser)
    assert(run("@plain:win*") == Set("k1"))
    assert(run("win*") == Set("k1"))
    // an index with NO trie fields rejects unfielded suffix outright
    val schema2 = IndexSchema("notrie", Seq(FieldDef("plain", TextField())))
    val e2 = new SearchEngine().createIndex(schema2,
      Documents.enrich(docs.select("__key", "plain"), schema2))
    val err2 = intercept[Exception](
      e2.search("notrie", "*dow", SearchOptions(noContent = true)).collect())
    assert(err2.getMessage.contains("No fields support suffix search"))
  }

  test("stop-word term is dropped from the query") {
    val hits = engine.search("documents", "@text:the @lang:{en}",
      SearchOptions(limit = (0, 1000), noContent = true)).count()
    val all = engine.search("documents", "@lang:{en}",
      SearchOptions(limit = (0, 1000), noContent = true)).count()
    assert(hits == all) // 'the' is a stop word → predicate vanishes
  }

  test("cosine: ingest-normalized IP distance == raw full-cosine distance") {
    val raw = engine.search("embeddings_cos", "*=>[KNN 10 @vec $q]",
      SearchOptions(params = Map("q" -> VectorParam(Queries.queryVec))))
      .select($"__key", $"__vec_score").collect()
    // normalized variant of the same data
    val normSchema = IndexSchema("embcos2", Seq(
      FieldDef("embedding", "vec", VectorField(64, DistanceMetric.Cosine))))
    val e2 = new SearchEngine().createIndex(normSchema,
      Documents.enrich(Fixtures.table(spark, sf, "embeddings"), normSchema,
        keyExpr = Some(col("vec_id"))))
    val norm = e2.search("embcos2", "*=>[KNN 10 @vec $q]",
      SearchOptions(params = Map("q" -> VectorParam(Queries.queryVec))))
      .select($"__key", $"__vec_score").collect()
    assert(raw.map(_.getString(0)).sameElements(norm.map(_.getString(0))))
    raw.zip(norm).foreach { case (a, b) =>
      assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-4)
    }
  }

  test("searchCount reports pre-LIMIT total (R6)") {
    val total = engine.searchCount("part", "@p_size:[10 20]")
    val page = engine.search("part", "@p_size:[10 20]",
      SearchOptions(limit = (0, 5))).count()
    assert(page == math.min(5L, total) && total > 5)
  }

  test("searchReply: one-pass total+page equals search()+searchCount()") {
    val q = "@p_size:[10 20]"
    val opts = SearchOptions(limit = (2, 5), sortBy = Some(("p_retailprice", false)),
      returnFields = Seq(("p_size", None), ("p_retailprice", None)))
    val reply = engine.searchReply("part", q, opts)
    assert(reply.total == engine.searchCount("part", q))
    val expect = engine.search("part", q, opts).collect()
    assert(reply.rows.map(_.toString).toSeq == expect.map(_.toString).toSeq)
    // KNN reply: total is capped at k
    val kq = "*=>[KNN 7 @vec $q]"
    val kopts = SearchOptions(limit = (0, 7),
      params = Map("q" -> VectorParam(Queries.queryVec)))
    val kreply = engine.searchReply("embeddings_l2", kq, kopts)
    assert(kreply.total == 7)
    assert(kreply.rows.map(_.toString).toSeq ==
      engine.search("embeddings_l2", kq, kopts).collect().map(_.toString).toSeq)
  }

  test("wrong-dimension vectors are dropped (index_base.h:43-47)") {
    val docs = Seq(
      ("a", Array(1.0f, 0.0f)),
      ("b", Array(0.0f, 1.0f, 9.9f)) // wrong dim → dropped
    ).toDF("__key", "v")
    val schema = IndexSchema("vs", Seq(FieldDef("v", VectorField(2, DistanceMetric.L2))))
    val e = new SearchEngine().createIndex(schema, Documents.enrich(docs, schema))
    val res = e.search("vs", "*=>[KNN 5 @v $q]",
      SearchOptions(params = Map("q" -> VectorParam(Array(1.0f, 0.0f)))))
    assert(res.select("__key").as[String].collect().toSeq == Seq("a"))
  }
}
