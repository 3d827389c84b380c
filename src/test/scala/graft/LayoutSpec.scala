package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{NumericBucketLayout, SearchEngine, SearchOptions}
import graft.model._
import graft.sources.{Documents, Layout}

/**
 * Physical document-table layouts for 100-TB corpora (round-9 verdict
 * #5): key-prefix / tag partitioning and numeric bucketing must (a)
 * leave every query result IDENTICAL to the unpartitioned relation,
 * and (b) demonstrably prune files — checked by counting the distinct
 * `input_file_name()`s a pruned scan touches against the total file
 * population, and by the PartitionFilters line of the engine plan.
 */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var docs: DataFrame = _
  private var tmp: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("layout-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
  }
  override def afterAll(): Unit = ()

  private def parquetFiles(path: String): Long = {
    val base = java.nio.file.Paths.get(path)
    val it = java.nio.file.Files.walk(base)
    try it.filter(p => p.toString.endsWith(".parquet")).count()
    finally it.close()
  }

  private def filesRead(df: DataFrame): Long =
    df.select(input_file_name()).distinct().count()

  test("tag partitioning: pruned file set, identical rows") {
    val part = Layout.saveTagPartitioned(docs, "lang", s"$tmp/bylang")
    val total = parquetFiles(s"$tmp/bylang")
    val langs = docs.select("lang").distinct().count()
    assert(total >= langs) // at least one file per partition value
    val pruned = part.filter(col("lang") === "en")
    assert(filesRead(pruned) < total)
    assert(filesRead(pruned) == parquetFiles(s"$tmp/bylang/lang=en"))
    // results identical to the unpartitioned relation
    val want = docs.filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val got = pruned.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
  }

  test("tag partitioning prunes through the ENGINE's compiled TAG predicate") {
    val part = spark.read.parquet(s"$tmp/bylang")
    val schema = IndexSchema("docs_lp", Seq(
      FieldDef("lang", TagField()), FieldDef("text", TextField())))
    val engine = new SearchEngine().createIndex(schema,
      Documents.enrich(part, schema, keyExpr = Some(col("doc_id"))))
    val out = engine.search("docs_lp", "@lang:{de}",
      SearchOptions(limit = (0, 10000), noContent = true))
    // the compiled predicate references ONLY the partition column, so
    // Catalyst turns it into a PartitionFilter with no engine help
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("lang"), s"no partition filter on lang:\n$pf")
    // and the result equals the unpartitioned engine's
    val flat = new SearchEngine().createIndex(schema.copy(name = "docs_l0"),
      Documents.enrich(docs, schema.copy(name = "docs_l0"),
        keyExpr = Some(col("doc_id"))))
    val want = flat.search("docs_l0", "@lang:{de}",
        SearchOptions(limit = (0, 10000), noContent = true))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(out.collect().map(_.getString(0)).sorted.toSeq == want)
    assert(want.nonEmpty)
  }

  test("numeric bucketing: registered layout hint prunes bucket partitions") {
    Layout.saveNumericBucketed(docs, "n_chars", step = 100.0, s"$tmp/bylen")
    val part = spark.read.parquet(s"$tmp/bylen")
    assert(Layout.describe(spark, s"$tmp/bylen").exists(_.kind == "numericBucket"))
    val schema = IndexSchema("docs_nb", Seq(
      FieldDef("n_chars", NumericField), FieldDef("text", TextField())))
    val engine = new SearchEngine().createIndex(schema,
      Documents.enrich(part, schema, keyExpr = Some(col("doc_id"))))
    Layout.registerHints(engine, "docs_nb", spark, s"$tmp/bylen", "n_chars")
    val out = engine.search("docs_nb", "@n_chars:[250 449]",
      SearchOptions(limit = (0, 10000), noContent = true))
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("__nb"), s"no partition filter on __nb:\n$pf")
    // identical result to an engine with NO layout (and no hint)
    val flat = new SearchEngine().createIndex(schema.copy(name = "docs_n0"),
      Documents.enrich(docs, schema.copy(name = "docs_n0"),
        keyExpr = Some(col("doc_id"))))
    val want = flat.search("docs_n0", "@n_chars:[250 449]",
        SearchOptions(limit = (0, 10000), noContent = true))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(out.collect().map(_.getString(0)).sorted.toSeq == want)
    assert(want.nonEmpty)
    // library-level file accounting: buckets 2,3,4 of 0..max survive
    val prunedFiles = filesRead(part.filter(
      col("__nb") >= 2L && col("__nb") <= 4L))
    assert(prunedFiles < parquetFiles(s"$tmp/bylen"))
  }

  test("numeric bucket hint: open bounds, exclusive bounds, OR trees") {
    val part = spark.read.parquet(s"$tmp/bylen")
    val schema = IndexSchema("docs_nb2", Seq(
      FieldDef("n_chars", NumericField), FieldDef("text", TextField())))
    val engine = new SearchEngine().createIndex(schema,
      Documents.enrich(part, schema, keyExpr = Some(col("doc_id"))))
    engine.registerLayout("docs_nb2", "n_chars", NumericBucketLayout("__nb", 100.0))
    val flat = new SearchEngine().createIndex(schema.copy(name = "docs_n02"),
      Documents.enrich(docs, schema.copy(name = "docs_n02"),
        keyExpr = Some(col("doc_id"))))
    for (q <- Seq("@n_chars:[-inf 150]", "@n_chars:[(250 +inf]",
        "@n_chars:[(100 (300]",
        "(@n_chars:[0 99] | @n_chars:[400 499])")) {
      val got = engine.search("docs_nb2", q,
          SearchOptions(limit = (0, 10000), noContent = true))
        .collect().map(_.getString(0)).sorted.toSeq
      val want = flat.search("docs_n02", q,
          SearchOptions(limit = (0, 10000), noContent = true))
        .collect().map(_.getString(0)).sorted.toSeq
      assert(got == want, s"query $q diverged under the bucket layout")
      assert(want.nonEmpty, s"vacuous layout query: $q")
    }
  }

  test("key-prefix partitioning: prefix predicate reads only its directories") {
    val keyed = docs.select(concat(lit("doc"), col("doc_id")).as("k"), col("text"))
    Layout.saveKeyPrefixPartitioned(keyed, "k", s"$tmp/bykey", prefixLen = 4)
    val part = spark.read.parquet(s"$tmp/bykey")
    val total = parquetFiles(s"$tmp/bykey")
    // query prefix LONGER than the layout prefix: one partition
    val p1 = part.filter(Layout.keyPrefixPredicate(col("k"), "doc12", 4))
    assert(filesRead(p1) == parquetFiles(s"$tmp/bykey/__kp=doc1"))
    assert(filesRead(p1) < total)
    val want1 = keyed.filter(col("k").startsWith("doc12"))
      .select("k").collect().map(_.getString(0)).sorted.toSeq
    assert(p1.select("k").collect().map(_.getString(0)).sorted.toSeq == want1)
    assert(want1.nonEmpty)
    // query prefix SHORTER than the layout prefix: startsWith prune
    val p2 = part.filter(Layout.keyPrefixPredicate(col("k"), "doc5", 4))
    val kpDirs = java.nio.file.Files.list(java.nio.file.Paths.get(s"$tmp/bykey"))
    val matching = try {
      import scala.jdk.CollectionConverters._
      kpDirs.iterator().asScala.count(_.getFileName.toString.startsWith("__kp=doc5"))
    } finally kpDirs.close()
    assert(matching > 0)
    val want2 = keyed.filter(col("k").startsWith("doc5"))
      .select("k").collect().map(_.getString(0)).sorted.toSeq
    assert(p2.select("k").collect().map(_.getString(0)).sorted.toSeq == want2)
    assert(filesRead(p2) < total)
  }

  test("key-prefix layout prunes through the ENGINE query path for a PREFIX-subscribed index") {
    // NUMERIC schema: non-resident, so the prune is visible on the
    // parquet scan (TEXT indexes persist; cached plans have no
    // PartitionFilters line — the on-disk layout story is the
    // non-resident one)
    val keyed = docs.select(concat(lit("doc"), col("doc_id")).as("k"),
      col("n_chars"), col("text"))
    Layout.saveKeyPrefixPartitioned(keyed, "k", s"$tmp/bykeyEng", prefixLen = 4)
    val part = spark.read.parquet(s"$tmp/bykeyEng")
    assert(Layout.describe(spark, s"$tmp/bykeyEng").exists(_.kind == "keyPrefix"))
    def mkEngine(src: DataFrame, idx: String): SearchEngine = {
      val e = new SearchEngine()
      val cmds = new graft.engine.Commands(e, _ => (src, col("k")))
      cmds.execute(Seq("FT.CREATE", idx, "PREFIX", "1", "doc1",
        "SCHEMA", "n_chars", "NUMERIC"))
      e
    }
    val engine = mkEngine(part, "docs_kp")
    Layout.registerHints(engine, "docs_kp", spark, s"$tmp/bykeyEng", "k")
    val out = engine.search("docs_kp", "*",
      SearchOptions(limit = (0, 10000), noContent = true))
    // the hint turns the subscription into a PartitionFilter on __kp
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("__kp"), s"no partition filter on __kp:\n$plan")
    // identical result to an engine over the UNPARTITIONED relation
    // with the same subscription and no hint
    val flat = mkEngine(keyed, "docs_kp0")
    val want = flat.search("docs_kp0", "*",
        SearchOptions(limit = (0, 10000), noContent = true))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(out.collect().map(_.getString(0)).sorted.toSeq == want)
    assert(want.nonEmpty)
    // and a filtered query through the same engine also prunes + agrees
    val q = engine.search("docs_kp", "@n_chars:[100 400]",
      SearchOptions(limit = (0, 10000), noContent = true))
    val pfq = q.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      .linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pfq.contains("__kp"), s"no partition filter on __kp:\n$pfq")
    val wantQ = flat.search("docs_kp0", "@n_chars:[100 400]",
        SearchOptions(limit = (0, 10000), noContent = true))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(q.collect().map(_.getString(0)).sorted.toSeq == wantQ)
  }

  test("an EMPTY prefix among the subscriptions disables the prune (matches every key)") {
    // PREFIX 2 'doc1' '' subscribes ALL keys; pruning to the non-empty
    // prefixes would silently exclude everything outside doc1*
    val keyed = docs.select(concat(lit("doc"), col("doc_id")).as("k"),
      col("n_chars"), col("text"))
    Layout.saveKeyPrefixPartitioned(keyed, "k", s"$tmp/bykeyAll", prefixLen = 4)
    val part = spark.read.parquet(s"$tmp/bykeyAll")
    val e = new SearchEngine()
    val cmds = new graft.engine.Commands(e, _ => (part, col("k")))
    cmds.execute(Seq("FT.CREATE", "docs_kpa", "PREFIX", "2", "doc1", "",
      "SCHEMA", "n_chars", "NUMERIC"))
    Layout.registerHints(e, "docs_kpa", spark, s"$tmp/bykeyAll", "k")
    val got = e.search("docs_kpa", "*",
        SearchOptions(limit = (0, 100000), noContent = true))
      .collect().map(_.getString(0)).toSet
    val all = keyed.select("k").collect().map(_.getString(0)).toSet
    assert(got == all,
      s"empty-prefix subscription pruned away ${(all -- got).size} keys")
  }
}
