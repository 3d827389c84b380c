package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.engine.{Commands, SearchEngine, SearchOptions}
import graft.sources.Documents

/**
 * Replays the reference's subscribed-key-prefix semantics
 * (index_schema.cc:321-334; tests index_schema_test.cc:684-733):
 * empty list ≡ subscribe-all, duplicates drop, and a prefix covered by
 * an ALREADY-KEPT entry drops — a one-pass declared-order rule, so the
 * reverse order keeps both.
 */
class KeyPrefixParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("key-prefix-parity")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = ()

  test("normalization table: empty, duplicate, covered, reverse-order") {
    // EmptyKeyPrefixesTest: {} → {""}
    assert(Documents.normalizePrefixes(Nil) == Seq(""))
    // DuplicateKeyPrefixesTest: {"pre","pre"} → {"pre"}
    assert(Documents.normalizePrefixes(Seq("pre", "pre")) == Seq("pre"))
    // PrefixIsPrefixedByAnotherTest: {"pre","prefix"} → {"pre"}
    assert(Documents.normalizePrefixes(Seq("pre", "prefix")) == Seq("pre"))
    // the reference's rule is one declared-order pass — the reverse
    // order keeps both (starts_with checks only already-kept entries)
    assert(Documents.normalizePrefixes(Seq("prefix", "pre")) ==
      Seq("prefix", "pre"))
  }

  test("FT.CREATE PREFIX binds only matching keys; no PREFIX binds all") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      ("user:1", 10.0), ("user:2", 20.0),
      ("item:1", 30.0), ("other", 40.0)).toDF("pk", "price")
    val engine = new SearchEngine
    val cmds = new Commands(engine, prefixes =>
      (docs.filter(Documents.keyPrefixPredicate(col("pk"), prefixes)), col("pk")))

    cmds.execute(Seq("FT.CREATE", "pfx_t", "PREFIX", "2", "user:", "user:",
      "SCHEMA", "price", "NUMERIC"))
    val keys = engine.search("pfx_t", "*").collect()
      .map(_.getAs[String]("__key")).toSet
    assert(keys == Set("user:1", "user:2"))

    cmds.execute(Seq("FT.CREATE", "all_t", "SCHEMA", "price", "NUMERIC"))
    assert(engine.search("all_t", "*").collect().length == 4)

    // a key matching two overlapping prefixes is indexed once
    cmds.execute(Seq("FT.CREATE", "overlap_t", "PREFIX", "2", "user:", "user",
      "SCHEMA", "price", "NUMERIC"))
    val rows = engine.search("overlap_t", "*").collect()
    assert(rows.length == 2)
  }

  test("PREFIX subscription is engine-side: an unfiltered source still restricts") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      ("user:1", 10.0), ("user:2", 20.0),
      ("item:1", 30.0), ("other", 40.0)).toDF("pk", "price")
    val engine = new SearchEngine
    // the source IGNORES the prefixes it is handed — the reference's
    // prefix matching lives in the index (index_schema.cc), not in its
    // clients, so the engine must restrict regardless
    val cmds = new Commands(engine, _ => (docs, col("pk")))
    cmds.execute(Seq("FT.CREATE", "pfx_eng", "PREFIX", "1", "user:",
      "SCHEMA", "price", "NUMERIC"))
    val keys = engine.search("pfx_eng", "*").collect()
      .map(_.getAs[String]("__key")).toSet
    assert(keys == Set("user:1", "user:2"))
  }
}
