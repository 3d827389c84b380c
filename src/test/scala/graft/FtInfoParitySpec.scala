package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.engine.{Commands, SearchEngine}
import graft.query.ExprParseException
import graft.sources.Documents

/**
 * Replays the FT.INFO reply-field expectations from the reference's
 * command table (testing/ft_info_test.cc happy_path_* and error rows,
 * over src/commands/ft_info.cc + index_schema.cc:1203-1263): the
 * index_definition block (prefixes, default score, score_field,
 * language), the text counters (num_terms, total_term_occurrences),
 * state/backfill fields, and the error message shapes. RESP framing is
 * not replayed (DataFrame reply by design).
 */
class FtInfoParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("ft-info-parity")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = ()

  test("happy path: index_definition block fields (prefixes, score, language)") {
    val sp = spark; import sp.implicits._
    val docs = Seq(("prefix_1a", 1.0, "merge fast"), ("other", 2.0, "merge slow"))
      .toDF("pk", "price", "body")
    val engine = new SearchEngine
    val cmds = new Commands(engine, prefixes =>
      (docs.filter(Documents.keyPrefixPredicate(col("pk"), prefixes)), col("pk")))
    cmds.execute(Seq("FT.CREATE", "info_t", "PREFIX", "1", "prefix_",
      "SCHEMA", "price", "NUMERIC", "body", "TEXT"))

    val info = engine.info("info_t").collect()
    val r = info.head
    // array reply (index_schema.cc:1206-1210), not a joined string: a
    // prefix containing the separator stays unambiguous and the
    // subscribe-all sentinel "" stays visible
    assert(r.getAs[scala.collection.Seq[String]]("prefixes").toSeq == Seq("prefix_"))
    assert(r.getAs[Double]("score") == 1.0)
    assert(r.getAs[String]("score_field") == null)
    assert(r.getAs[String]("language") == "english")
    assert(r.getAs[String]("state") == "ready")
    assert(!r.getAs[Boolean]("backfill_in_progress"))
    assert(r.getAs[Double]("backfill_complete_percent") == 100.0)
    assert(r.getAs[Long]("mutation_queue_size") == 0L)
    assert(r.getAs[Long]("num_docs") == 1L) // only the prefix_ match
  }

  test("text counters: exact num_terms and total_term_occurrences") {
    val sp = spark; import sp.implicits._
    val docs = Seq(("k1", "merge fast"), ("k2", "merge slow"), ("k3", ""))
      .toDF("pk", "body")
    val engine = new SearchEngine
    val cmds = new Commands(engine, _ => (docs, col("pk")))
    cmds.execute(Seq("FT.CREATE", "terms_t", "SCHEMA", "body", "TEXT"))
    val r = engine.info("terms_t").collect().head
    // distinct stems: merg, fast, slow
    assert(r.getAs[Long]("num_terms") == 3L)
    // token instances: 2 + 2 + 0
    assert(r.getAs[Long]("total_term_occurrences") == 4L)
  }

  test("num_terms served from registered posting stats equals the exact distinct") {
    val sp = spark; import sp.implicits._
    val docs = Seq(("k1", "merge fast"), ("k2", "merge slow"), ("k3", "fast fast"))
      .toDF("pk", "body")
    val engine = new SearchEngine
    val cmds = new Commands(engine, _ => (docs, col("pk")))
    cmds.execute(Seq("FT.CREATE", "terms_pi", "SCHEMA", "body", "TEXT"))
    val exact = engine.info("terms_pi").collect().head.getAs[Long]("num_terms")
    val dir = java.nio.file.Files.createTempDirectory("graft-info-spec").toString
    engine.buildPostings("terms_pi", dir)
    // stats route (O(vocabulary), no corpus job) must agree exactly
    val viaStats = engine.info("terms_pi").collect().head.getAs[Long]("num_terms")
    assert(viaStats == exact)
    assert(viaStats == 3L) // merg, fast, slow
  }

  test("no TEXT fields: counters are zero without extra jobs") {
    val sp = spark; import sp.implicits._
    val docs = Seq(("k1", 1.0)).toDF("pk", "price")
    val engine = new SearchEngine
    val cmds = new Commands(engine, _ => (docs, col("pk")))
    cmds.execute(Seq("FT.CREATE", "nums_t", "SCHEMA", "price", "NUMERIC"))
    val r = engine.info("nums_t").collect().head
    assert(r.getAs[Long]("num_terms") == 0L)
    assert(r.getAs[Long]("total_term_occurrences") == 0L)
  }

  test("memoized counters invalidate on re-registration (no stale FT.INFO)") {
    val sp = spark; import sp.implicits._
    val engine = new SearchEngine
    val docs1 = Seq(("k1", "merge fast")).toDF("pk", "body")
    val cmds = new Commands(engine, _ => (docs1, col("pk")))
    cmds.execute(Seq("FT.CREATE", "inv_t", "SCHEMA", "body", "TEXT"))
    val r1 = engine.info("inv_t").collect().head
    assert(r1.getAs[Long]("num_docs") == 1L)
    assert(r1.getAs[Long]("num_terms") == 2L) // merg, fast
    // maintainer-style refresh: re-register the SAME index name with a
    // grown relation — the memoized counter row must not survive
    val docs2 = Seq(("k1", "merge fast"), ("k2", "slow query plan"))
      .toDF("pk", "body")
    val (schema, _) = engine.index("inv_t")
    engine.createIndex(schema,
      graft.sources.Documents.enrich(docs2, schema, keyExpr = Some(col("pk"))))
    val r2 = engine.info("inv_t").collect().head
    assert(r2.getAs[Long]("num_docs") == 2L)
    assert(r2.getAs[Long]("num_terms") == 5L) // merg fast slow queri plan
  }

  test("docs refresh drops registered posting stats: num_terms never serves the old vocabulary") {
    val sp = spark; import sp.implicits._
    // r9 ADVICE: createIndex cleared infoStatsCache but left
    // postingStats, so a maintainer-style docs refresh could serve the
    // OLD corpus's num_terms from surviving stats until postings were
    // re-registered. createIndex now drops ALL derived state.
    val engine = new SearchEngine
    val docs1 = Seq(("k1", "merge fast")).toDF("pk", "body")
    val cmds = new Commands(engine, _ => (docs1, col("pk")))
    cmds.execute(Seq("FT.CREATE", "stale_t", "SCHEMA", "body", "TEXT"))
    val dir = java.nio.file.Files.createTempDirectory("graft-stale-spec").toString
    engine.buildPostings("stale_t", dir) // registers postings + stats
    assert(engine.info("stale_t").collect().head.getAs[Long]("num_terms") == 2L)
    // refresh the SAME index name with a different corpus, WITHOUT
    // re-registering postings or stats
    val docs2 = Seq(("k1", "merge fast"), ("k2", "slow query plan"))
      .toDF("pk", "body")
    val (schema, _) = engine.index("stale_t")
    engine.createIndex(schema,
      graft.sources.Documents.enrich(docs2, schema, keyExpr = Some(col("pk"))))
    // must be the NEW vocabulary via the exact path, not 2 from stats
    assert(engine.info("stale_t").collect().head.getAs[Long]("num_terms") == 5L)
  }

  test("FT.INFO after a maintainer batch equals a fresh recompute (no stale counters)") {
    val sp = spark; import sp.implicits._
    // verdict r9 #6: a maintained index (docs changed, postings/stats
    // re-registered by IndexMaintainer.onBatch) must serve
    // num_docs/num_terms/total_term_occurrences identical to an engine
    // built fresh over the final corpus — whatever mix of memoized
    // rows, registered stats, and exact jobs each side uses.
    var currentDocs = Seq(("k1", "merge fast"), ("k2", "merge slow"))
      .toDF("pk", "body")
    val engine = new SearchEngine
    val cmds = new Commands(engine, _ => (currentDocs, col("pk")))
    cmds.execute(Seq("FT.CREATE", "maint_info_t", "SCHEMA", "body", "TEXT"))
    val dir = java.nio.file.Files.createTempDirectory("graft-maint-info").toString
    val m = graft.streaming.IndexMaintainer.forIndex(engine, "maint_info_t",
      dir, docsSource = Some(() => currentDocs)).register()
    // warm the memoized counters on the original corpus
    assert(engine.info("maint_info_t").collect().head.getAs[Long]("num_docs") == 2L)
    // batch: one upsert of a new doc, one delete of an existing key
    currentDocs = Seq(("k1", "merge fast"), ("k3", "slow query plan"))
      .toDF("pk", "body")
    val batch = Seq(("upsert", "k3", "slow query plan"),
      ("delete", "k2", null.asInstanceOf[String]))
      .toDF("op", "__key", "body")
    m.onBatch(batch)
    val got = engine.info("maint_info_t").collect().head
    val fresh = new SearchEngine
    val freshCmds = new Commands(fresh, _ => (currentDocs, col("pk")))
    freshCmds.execute(Seq("FT.CREATE", "maint_info_t", "SCHEMA", "body", "TEXT"))
    val want = fresh.info("maint_info_t").collect().head
    for (f <- Seq("num_docs", "num_terms", "total_term_occurrences"))
      assert(got.getAs[Long](f) == want.getAs[Long](f),
        s"$f: got ${got.getAs[Long](f)}, fresh recompute ${want.getAs[Long](f)}")
    assert(got.getAs[Long]("num_docs") == 2L)
  }

  test("error shapes: wrong arity and not-found, reference messages") {
    val sp = spark; import sp.implicits._
    val docs = Seq(("k1", 1.0)).toDF("pk", "price")
    val cmds = new Commands(new SearchEngine, _ => (docs, col("pk")))
    val e1 = intercept[ExprParseException](cmds.execute(Seq("FT.INFO")))
    assert(e1.getMessage == "wrong number of arguments for 'FT.INFO' command")
    val e2 = intercept[ExprParseException](
      cmds.execute(Seq("FT.INFO", "non_exist_test_name")))
    assert(e2.getMessage ==
      "Index with name 'non_exist_test_name' not found in database 0")
    val e3 = intercept[ExprParseException](
      cmds.execute(Seq("FT.DROPINDEX", "nope")))
    assert(e3.getMessage == "Index with name 'nope' not found in database 0")
  }
}
