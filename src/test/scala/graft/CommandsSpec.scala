package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.engine.{Commands, SearchEngine}

/** The command-string API surface (COMMANDS.md) end to end. */
class CommandsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var cmds: Commands = _
  private var engine: SearchEngine = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("commands-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark; import sp.implicits._
    val products: DataFrame = Seq(
      ("p1", 9.99, "red,blue", "fast gpu compute node", Array(1.0f, 0.0f)),
      ("p2", 24.50, "green", "slow cpu fallback path", Array(0.0f, 1.0f)),
      ("p3", 15.00, "Blue", "gpu training cluster", Array(0.7f, 0.7f)),
      ("p4", 99.0, "black", "storage archive box", Array(-1.0f, 0.0f)))
      .toDF("pk", "price", "colors", "descr", "emb")
    engine = new SearchEngine
    cmds = new Commands(engine, _ => (products, col("pk")))
  }
  // NOTE: never stop() here - getOrCreate shares ONE SparkContext
  // across all suites in the JVM; stopping it kills whichever suite
  // runs next (the forked test JVM cleans up on exit).
  override def afterAll(): Unit = ()

  // FT.CREATE of a live index is rejected like the reference
  // (schema_manager.cc:148) — tests re-creating "products" drop first
  private def recreate(): Unit = {
    if (engine.listIndexes.contains("products"))
      cmds.execute(Seq("FT.DROPINDEX", "products"))
    cmds.execute(create)
    ()
  }

  private val create = Seq("FT.CREATE", "products", "ON", "HASH",
    // subscription must COVER the doc keys (p1..p4): since the r11
    // engine-side PREFIX filter, a non-matching prefix correctly
    // yields an empty index (reference index_schema.cc prefix match)
    "PREFIX", "1", "p", "SCHEMA",
    "price", "NUMERIC",
    "colors", "AS", "color", "TAG", "SEPARATOR", ",",
    "descr", "TEXT", "SORTABLE",
    "emb", "AS", "v", "VECTOR", "FLAT", "6",
    "DIM", "2", "TYPE", "FLOAT32", "DISTANCE_METRIC", "L2")

  test("FT.CREATE parses the full schema grammar and registers the index") {
    if (engine.listIndexes.contains("products"))
      cmds.execute(Seq("FT.DROPINDEX", "products"))
    assert(cmds.execute(create) == "OK")
    assert(cmds.execute(Seq("FT._LIST")) == Seq("products"))
    val info = cmds.execute(Seq("FT.INFO", "products"))
      .asInstanceOf[DataFrame].collect()
    assert(info.length == 4)
    assert(info.exists(r => r.getAs[String]("field") == "color" &&
      r.getAs[String]("identifier") == "colors"))
  }

  test("SCORE/SCORE_FIELD stored + surfaced; unsupported params rejected like the reference") {
    // parsed, validated, surfaced by FT.INFO (ft_create_parser.cc
    // ParseScore; index_schema.cc:1214-1216) — no scorer consumes them
    assert(cmds.execute(Seq("FT.CREATE", "scored", "SCORE", "0.5",
      "SCORE_FIELD", "price", "SCHEMA", "price", "NUMERIC")) == "OK")
    val info = cmds.execute(Seq("FT.INFO", "scored"))
      .asInstanceOf[DataFrame].collect()
    assert(info.head.getAs[Double]("score") == 0.5)
    assert(info.head.getAs[String]("score_field") == "price")
    engine.dropIndex("scored")
    // SCORE outside [0,1] → the reference's error shape
    val bad = intercept[Exception] {
      cmds.execute(Seq("FT.CREATE", "s2", "SCORE", "1.5",
        "SCHEMA", "price", "NUMERIC"))
    }
    assert(bad.getMessage.contains("must be between 0.0 and 1.0"))
    // FILTER / LANGUAGE_FIELD / PAYLOAD_FIELD → explicit not-supported
    // (ft_create_parser.cc NotSupportedParamErrorMsg)
    for (p <- Seq("FILTER", "LANGUAGE_FIELD", "PAYLOAD_FIELD")) {
      val e = intercept[Exception] {
        cmds.execute(Seq("FT.CREATE", "s3", p, "x", "SCHEMA", "price", "NUMERIC"))
      }
      assert(e.getMessage.contains(s"The parameter `$p` is not supported"))
    }
  }

  test("FT.SEARCH with options: filter, sort, paging, RETURN AS, total count") {
    recreate()
    val reply = cmds.execute(Seq("FT.SEARCH", "products",
      "@color:{blue} @price:[5 20]",
      "SORTBY", "price", "ASC", "LIMIT", "0", "1",
      "RETURN", "3", "price", "AS", "p",
      "DIALECT", "2")).asInstanceOf[SearchEngine.SearchReply]
    assert(reply.total == 2) // p1 and p3 match; LIMIT only pages rows
    assert(reply.rows.length == 1)
    assert(reply.rows.head.getAs[String]("__key") == "p1")
    assert(reply.rows.head.getAs[Double]("p") == 9.99)
  }

  test("FT.SEARCH KNN via PARAMS with little-endian FLOAT32 bytes") {
    recreate()
    val buf = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putFloat(1.0f); buf.putFloat(0.1f)
    val blob = new String(buf.array(), java.nio.charset.StandardCharsets.ISO_8859_1)
    val reply = cmds.execute(Seq("FT.SEARCH", "products",
      "*=>[KNN 2 @v $vec]", "PARAMS", "2", "vec", blob,
      "NOCONTENT")).asInstanceOf[SearchEngine.SearchReply]
    assert(reply.rows.map(_.getString(0)).toSeq == Seq("p1", "p3"))
  }

  test("FT.AGGREGATE command tokens route through the stage pipeline") {
    recreate()
    val df = cmds.execute(Seq("FT.AGGREGATE", "products", "*",
      "APPLY", "@price * 2", "AS", "p2x",
      "FILTER", "@p2x < 60",
      "GROUPBY", "0", "REDUCE", "COUNT", "0", "AS", "n",
      "REDUCE", "AVG", "1", "@p2x", "AS", "avg2x")).asInstanceOf[DataFrame]
    val r = df.collect().head
    assert(r.getAs[Double]("n") == 3.0)
    assert(math.abs(r.getAs[Double]("avg2x") - (19.98 + 49.0 + 30.0) / 3) < 1e-9)
  }

  test("FT.AGGREGATE non-stage options among stages: SLOP/INORDER/VERBATIM/ADDSCORES") {
    recreate()
    // ADDSCORES parses as a flag with no effect (the reference parses
    // addscores_ and its exec never reads it); VERBATIM flows into the
    // query's text parsing (search.cc:1040-1042) — 'training' must NOT
    // stem-match 'train' under it
    val verbatim = cmds.execute(Seq("FT.AGGREGATE", "products", "@descr:train",
      "ADDSCORES",
      "GROUPBY", "0", "REDUCE", "COUNT", "0", "AS", "n",
      "VERBATIM")).asInstanceOf[DataFrame]
    assert(verbatim.collect().head.getAs[Double]("n") == 0.0)
    val stemmed = cmds.execute(Seq("FT.AGGREGATE", "products", "@descr:train",
      "GROUPBY", "0", "REDUCE", "COUNT", "0", "AS", "n")).asInstanceOf[DataFrame]
    assert(stemmed.collect().head.getAs[Double]("n") == 1.0) // gpu training cluster
    // SLOP/INORDER apply the proximity constraint before stage 0
    val near = cmds.execute(Seq("FT.AGGREGATE", "products", "@descr:gpu @descr:cluster",
      "SLOP", "1", "INORDER",
      "GROUPBY", "0", "REDUCE", "COUNT", "0", "AS", "n")).asInstanceOf[DataFrame]
    assert(near.collect().head.getAs[Double]("n") == 1.0) // one word apart in p3
    val far = cmds.execute(Seq("FT.AGGREGATE", "products", "@descr:fast @descr:node",
      "SLOP", "0", "INORDER",
      "GROUPBY", "0", "REDUCE", "COUNT", "0", "AS", "n")).asInstanceOf[DataFrame]
    assert(far.collect().head.getAs[Double]("n") == 0.0) // two words apart in p1
  }

  test("RETURN 0 behaves as NOCONTENT; SKIPINITIALSCAN registers empty") {
    recreate()
    val reply = cmds.execute(Seq("FT.SEARCH", "products", "@price:[0 100]",
      "RETURN", "0")).asInstanceOf[SearchEngine.SearchReply]
    assert(reply.rows.head.schema.fieldNames.toSeq == Seq("__key"))

    cmds.execute(Seq("FT.CREATE", "empty_idx", "SKIPINITIALSCAN", "SCHEMA",
      "price", "NUMERIC"))
    val r2 = cmds.execute(Seq("FT.SEARCH", "empty_idx", "@price:[0 100]"))
      .asInstanceOf[SearchEngine.SearchReply]
    assert(r2.total == 0 && r2.rows.isEmpty)
    cmds.execute(Seq("FT.DROPINDEX", "empty_idx"))
    intercept[Exception] { cmds.execute(Seq("FT.DROPINDEX", "empty_idx")) }
  }

  test("DIALECT 2-4 accepted, others rejected; TIMEOUT capped (Verify parity)") {
    recreate()
    // reference Verify: dialect ∈ [2,4] (ft_search_parser.cc:85-88)
    for (d <- Seq("2", "3", "4"))
      cmds.execute(Seq("FT.SEARCH", "products", "*", "DIALECT", d))
    for (d <- Seq("1", "5")) {
      val e = intercept[Exception] {
        cmds.execute(Seq("FT.SEARCH", "products", "*", "DIALECT", d))
      }
      assert(e.getMessage.contains("DIALECT requires"))
    }
    // TIMEOUT cap (search.h:50 kMaxTimeoutMs = 60000)
    cmds.execute(Seq("FT.SEARCH", "products", "*", "TIMEOUT", "60000"))
    val t = intercept[Exception] {
      cmds.execute(Seq("FT.SEARCH", "products", "*", "TIMEOUT", "60001"))
    }
    assert(t.getMessage.contains("cannot exceed 60000"))
    // cluster scope/consistency flags accepted as no-ops (single-engine
    // ≡ LOCALONLY+CONSISTENT); unknown options still reject
    cmds.execute(Seq("FT.SEARCH", "products", "*",
      "LOCALONLY", "SOMESHARDS", "CONSISTENT"))
    intercept[Exception] {
      cmds.execute(Seq("FT.SEARCH", "products", "*", "NOSUCHOPT"))
    }
  }

  test("index-level STOPWORDS: declared words drop from index and query") {
    // "gpu" becomes a stop word: term queries on it match nothing and
    // the default stop word "the" is a searchable term again
    cmds.execute(Seq("FT.CREATE", "sw_idx", "STOPWORDS", "1", "gpu",
      "SCHEMA", "descr", "TEXT"))
    val hit = cmds.execute(Seq("FT.SEARCH", "sw_idx", "@descr:training"))
      .asInstanceOf[SearchEngine.SearchReply]
    assert(hit.total == 1)
    // stop-word query term is dropped → conjunct vanishes → all docs
    val dropped = cmds.execute(Seq("FT.SEARCH", "sw_idx", "@descr:gpu"))
      .asInstanceOf[SearchEngine.SearchReply]
    assert(dropped.total == 4)
  }

  test("NOSTOPWORDS: default stop words become searchable terms") {
    val sp = spark; import sp.implicits._
    val docs = Seq(("d1", "the fast path"), ("d2", "slow route"))
      .toDF("pk", "txt")
    val c2 = new Commands(engine, _ => (docs, col("pk")))
    c2.execute(Seq("FT.CREATE", "nsw_idx", "NOSTOPWORDS", "SCHEMA", "txt", "TEXT"))
    val r = c2.execute(Seq("FT.SEARCH", "nsw_idx", "@txt:the"))
      .asInstanceOf[SearchEngine.SearchReply]
    assert(r.total == 1 && r.rows.head.getString(0) == "d1")
  }

  test("index-level PUNCTUATION: custom split set replaces the default") {
    val sp = spark; import sp.implicits._
    val docs = Seq(("d1", "alpha_beta-gamma"), ("d2", "delta_epsilon"))
      .toDF("pk", "txt")
    val c2 = new Commands(engine, _ => (docs, col("pk")))
    // '_' splits, '-' no longer does → "beta-gamma" is ONE token
    c2.execute(Seq("FT.CREATE", "punct_idx", "PUNCTUATION", "_",
      "SCHEMA", "txt", "TEXT"))
    val r1 = c2.execute(Seq("FT.SEARCH", "punct_idx", "@txt:alpha"))
      .asInstanceOf[SearchEngine.SearchReply]
    assert(r1.total == 1)
    val r2 = c2.execute(Seq("FT.SEARCH", "punct_idx", "@txt:gamma"))
      .asInstanceOf[SearchEngine.SearchReply]
    assert(r2.total == 0) // not a standalone token under custom punctuation
  }

  test("index-level MINSTEMSIZE and NOSTEM") {
    val sp = spark; import sp.implicits._
    val docs = Seq(("d1", "running cats")).toDF("pk", "txt")
    val c2 = new Commands(engine, _ => (docs, col("pk")))
    // MINSTEMSIZE 10: "running" (7 chars) is NOT stemmed at index or
    // query time → searching "runs" misses, exact "running" hits
    c2.execute(Seq("FT.CREATE", "mss_idx", "MINSTEMSIZE", "10",
      "SCHEMA", "txt", "TEXT"))
    assert(c2.execute(Seq("FT.SEARCH", "mss_idx", "@txt:runs"))
      .asInstanceOf[SearchEngine.SearchReply].total == 0)
    assert(c2.execute(Seq("FT.SEARCH", "mss_idx", "@txt:running"))
      .asInstanceOf[SearchEngine.SearchReply].total == 1)
    // NOSTEM at index level disables stemming for every text field
    c2.execute(Seq("FT.CREATE", "nostem_idx", "NOSTEM",
      "SCHEMA", "txt", "TEXT"))
    assert(c2.execute(Seq("FT.SEARCH", "nostem_idx", "@txt:runs"))
      .asInstanceOf[SearchEngine.SearchReply].total == 0)
    assert(c2.execute(Seq("FT.SEARCH", "nostem_idx", "@txt:running"))
      .asInstanceOf[SearchEngine.SearchReply].total == 1)
  }

  test("FT.SEARCH SLOP/INORDER argv equals the programmatic path") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      ("d1", "hash join plan cost"), // hash..join adjacent, in order
      ("d2", "join with hash later maybe"), // join before hash, 1 apart
      ("d3", "hash cost model row group join")) // 4 words apart
      .toDF("pk", "txt")
    val c2 = new Commands(engine, _ => (docs, col("pk")))
    c2.execute(Seq("FT.CREATE", "prox_idx", "SCHEMA", "txt", "TEXT"))
    def keys(r: Any): Seq[String] =
      r.asInstanceOf[SearchEngine.SearchReply].rows.map(_.getString(0)).toSeq
    // SLOP 1 unordered: d1 (0 between) and d2 (1 between), not d3
    val viaArgv = keys(c2.execute(Seq("FT.SEARCH", "prox_idx",
      "@txt:hash @txt:join", "SLOP", "1", "NOCONTENT")))
    val viaApi = engine.searchReply("prox_idx", "@txt:hash @txt:join",
      graft.engine.SearchOptions(noContent = true, slop = Some(1)))
      .rows.map(_.getString(0)).toSeq
    assert(viaArgv == Seq("d1", "d2") && viaApi == viaArgv)
    // SLOP 1 INORDER: only d1 (d2 has them reversed)
    val inorder = keys(c2.execute(Seq("FT.SEARCH", "prox_idx",
      "@txt:hash @txt:join", "SLOP", "1", "INORDER", "NOCONTENT")))
    assert(inorder == Seq("d1"))
    intercept[Exception] {
      c2.execute(Seq("FT.SEARCH", "prox_idx", "@txt:hash", "SLOP", "-1"))
    }
  }

  test("WITHSORTKEYS adds the #-prefixed sort key per result (search.h:71)") {
    recreate()
    val reply = cmds.execute(Seq("FT.SEARCH", "products", "@price:[5 30]",
      "SORTBY", "price", "DESC", "WITHSORTKEYS", "NOCONTENT"))
      .asInstanceOf[SearchEngine.SearchReply]
    assert(reply.rows.head.schema.fieldNames.toSeq == Seq("__key", "__sortkey"))
    assert(reply.rows.map(_.getString(0)).toSeq == Seq("p2", "p3", "p1"))
    // numeric sort keys render like the hash stores them: integral
    // values carry no ".0" (GetSortKeyValue returns the raw string)
    assert(reply.rows.map(_.getString(1)).toSeq == Seq("#24.5", "#15", "#9.99"))
    // no SORTBY → empty sort key, still present (GetSortKeyValue "" path)
    val noSort = cmds.execute(Seq("FT.SEARCH", "products", "@price:[5 30]",
      "WITHSORTKEYS", "NOCONTENT")).asInstanceOf[SearchEngine.SearchReply]
    assert(noSort.rows.forall(_.getString(1) == "#"))
  }

  test("FT.CREATE MAINTAIN registers an IndexMaintainer; batches reflect without re-create") {
    val sp = spark; import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cmd-maintain").toString
    // the intended deployment: the index binds to an Ingest-maintained
    // state dir, MAINTAIN keeps the derived indexes fresh per batch
    val statePath = s"$tmp/state"
    graft.streaming.Ingest.backfill(
      Seq(("d1", "hash join plan"), ("d2", "sort merge join"))
        .toDF("__key", "txt"), statePath, nBuckets = 4)
    val c2 = new Commands(engine,
      _ => (graft.streaming.Ingest.readState(spark, statePath), col("__key")))
    c2.execute(Seq("FT.CREATE", "maint_idx", "MAINTAIN", s"$tmp/derived",
      "SCHEMA", "txt", "TEXT"))
    assert(c2.maintainer("maint_idx").isDefined)
    assert(c2.maintainer("no_such_idx").isEmpty)
    // term queries route through the registered maintained posting view
    assert(c2.execute(Seq("FT.SEARCH", "maint_idx", "@txt:hash"))
      .asInstanceOf[SearchEngine.SearchReply].total == 1)
    // one change batch (Ingest contract: state commits first, then
    // onBatch): d3 adds, d1 dies — visible through FT.SEARCH with no
    // FT.CREATE / rebuild in between
    val batch = Seq(
      ("upsert", "d3", "hash aggregate path", 1L),
      ("delete", "d1", null.asInstanceOf[String], 2L))
      .toDF("op", "__key", "txt", "__seq")
    graft.streaming.Ingest.backfill(
      Seq(("d2", "sort merge join"), ("d3", "hash aggregate path"))
        .toDF("__key", "txt"), statePath, nBuckets = 4)
    c2.maintainer("maint_idx").get.onBatch(batch)
    val after = c2.execute(Seq("FT.SEARCH", "maint_idx", "@txt:hash", "NOCONTENT"))
      .asInstanceOf[SearchEngine.SearchReply]
    assert(after.rows.map(_.getString(0)).toSet == Set("d3"))
  }

  test("FT.CREATE MAINTAIN_OPEN reopens the maintained set after a restart") {
    val sp = spark; import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cmd-maintain-open").toString
    val statePath = s"$tmp/state"
    graft.streaming.Ingest.backfill(
      Seq(("d1", "hash join plan"), ("d2", "sort merge join"))
        .toDF("__key", "txt"), statePath, nBuckets = 4)
    def cmdsFor(): Commands = new Commands(engine,
      _ => (graft.streaming.Ingest.readState(spark, statePath), col("__key")))
    val c1 = cmdsFor()
    c1.execute(Seq("FT.CREATE", "mo_idx", "MAINTAIN", s"$tmp/derived",
      "SCHEMA", "txt", "TEXT"))
    // advance state + apply one batch, then "restart"
    graft.streaming.Ingest.backfill(
      Seq(("d2", "sort merge join"), ("d3", "hash aggregate path"))
        .toDF("__key", "txt"), statePath, nBuckets = 4)
    c1.maintainer("mo_idx").get.onBatch(Seq(
      ("upsert", "d3", "hash aggregate path", 1L),
      ("delete", "d1", null.asInstanceOf[String], 2L))
      .toDF("op", "__key", "txt", "__seq"))
    engine.dropIndex("mo_idx")
    val c2 = cmdsFor()
    c2.execute(Seq("FT.CREATE", "mo_idx", "MAINTAIN_OPEN", s"$tmp/derived",
      "SCHEMA", "txt", "TEXT"))
    assert(c2.maintainer("mo_idx").isDefined)
    // the reopened stores carry the pre-restart batch: d1 gone, d3 live
    val r = c2.execute(Seq("FT.SEARCH", "mo_idx", "@txt:hash", "NOCONTENT"))
      .asInstanceOf[SearchEngine.SearchReply]
    assert(r.rows.map(_.getString(0)).toSeq == Seq("d3"))
  }

  test("FT.CREATE POSTINGS_LOAD re-attaches saved postings (restart path)") {
    val sp = spark; import sp.implicits._
    val docs = Seq(("d1", "hash join plan"), ("d2", "sort merge join"))
      .toDF("pk", "txt")
    val dir = java.nio.file.Files.createTempDirectory("cmd-postings").toString
    val c1 = new Commands(engine, _ => (docs, col("pk")))
    c1.execute(Seq("FT.CREATE", "pl_idx", "POSTINGS", dir,
      "SCHEMA", "txt", "TEXT"))
    engine.dropIndex("pl_idx") // the restart: registrations are gone
    val c2 = new Commands(engine, _ => (docs, col("pk")))
    c2.execute(Seq("FT.CREATE", "pl_idx", "POSTINGS_LOAD", dir,
      "SCHEMA", "txt", "TEXT"))
    val info = c2.execute(Seq("FT.INFO", "pl_idx"))
      .asInstanceOf[org.apache.spark.sql.DataFrame].collect()
    assert(info.head.getAs[String]("attached_indexes")
      == "posting,positional_posting")
    val r = c2.execute(Seq("FT.SEARCH", "pl_idx", "@txt:\"hash join\"", "NOCONTENT"))
      .asInstanceOf[SearchEngine.SearchReply]
    assert(r.rows.map(_.getString(0)).toSeq == Seq("d1"))
  }

  test("FT.CREATE validation parity: vector params, duplicate fields, prefix cap") {
    def bad(tokens: Seq[String], msg: String): Unit = {
      val e = intercept[Exception] { cmds.execute(tokens) }
      assert(e.getMessage.contains(msg), s"expected `$msg` got `${e.getMessage}`")
    }
    def vec(attrs: String*): Seq[String] =
      Seq("FT.CREATE", "vv", "SCHEMA", "emb", "VECTOR", "HNSW",
        attrs.length.toString) ++ attrs
    // required params (FTCreateVectorParameters::Verify)
    bad(vec("TYPE", "FLOAT32", "DISTANCE_METRIC", "L2"), "Missing dimensions")
    bad(vec("DIM", "4", "DISTANCE_METRIC", "L2"), "Missing vector TYPE")
    bad(vec("DIM", "4", "TYPE", "FLOAT32"), "Missing DISTANCE_METRIC")
    // ranges (HNSWParameters::Verify; max-vector-dimensions default)
    bad(vec("DIM", "32769", "TYPE", "FLOAT32", "DISTANCE_METRIC", "L2"),
      "less than or equal to 32768")
    bad(vec("DIM", "4", "TYPE", "FLOAT32", "DISTANCE_METRIC", "L2", "M", "1"),
      "greater than 2")
    bad(vec("DIM", "4", "TYPE", "FLOAT32", "DISTANCE_METRIC", "L2",
      "EF_CONSTRUCTION", "1000001"), "EF_CONSTRUCTION")
    // duplicate identifier (ft_create_parser.cc:748-751)
    bad(Seq("FT.CREATE", "dup_idx", "SCHEMA",
      "price", "NUMERIC", "price", "TAG"), "Duplicate field in schema - price")
    // prefix count is bounds-checked at parse (max-prefixes default 16)
    bad(Seq("FT.CREATE", "pfx_idx", "PREFIX", "17") ++
      (1 to 17).map(i => s"p$i:") ++ Seq("SCHEMA", "price", "NUMERIC"),
      "Bad arguments for PREFIX: `17` is outside acceptable bounds")
    // aliasing the same identifier twice is still a duplicate; two
    // different identifiers sharing nothing are fine
    assert(cmds.execute(Seq("FT.CREATE", "ok_idx", "SCHEMA",
      "price", "NUMERIC", "colors", "TAG")) == "OK")
    engine.dropIndex("ok_idx")
  }

  test("NOOFFSETS: phrase queries are rejected, terms still work") {
    val sp = spark; import sp.implicits._
    val docs = Seq(("d1", "hash join plan")).toDF("pk", "txt")
    val c2 = new Commands(engine, _ => (docs, col("pk")))
    c2.execute(Seq("FT.CREATE", "nooff_idx", "NOOFFSETS", "SCHEMA", "txt", "TEXT"))
    assert(c2.execute(Seq("FT.SEARCH", "nooff_idx", "@txt:join"))
      .asInstanceOf[SearchEngine.SearchReply].total == 1)
    intercept[Exception] {
      c2.execute(Seq("FT.SEARCH", "nooff_idx", "@txt:\"hash join\""))
    }
  }
}
