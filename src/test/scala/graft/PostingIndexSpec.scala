package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{SearchEngine, SearchOptions}
import graft.text.PostingIndex

/**
 * Inverted posting path: build/save/load layout, storage-level term
 * pruning (PushedFilters on the sorted posting), and result parity
 * with the columnar scan through the engine.
 */
class PostingIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("posting lookup keys == columnar term-scan keys; saved layout prunes") {
    val engine = Fixtures.engine(spark, sf)
    val (schema, docs) = engine.index("documents")
    val posting = PostingIndex.build(docs, schema, "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-posting").toString
    PostingIndex.save(posting, tmp, numPartitions = 4)
    val loaded = PostingIndex.load(spark, tmp)

    val viaPosting = PostingIndex.lookup(loaded, "merg") // stem of merge
      .collect().map(_.getString(0)).toSet
    val viaScan = docs.filter(array_contains(col("__text__terms"), "merg"))
      .select("__key").collect().map(_.getString(0)).toSet
    assert(viaPosting == viaScan && viaPosting.nonEmpty)

    // the term lookup reaches the parquet scan as a pushed filter, so
    // the term-sorted row groups prune at storage level
    val plan = PostingIndex.lookup(loaded, "merg")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(term,merg)"),
      s"term equality not pushed:\n$plan")
  }

  test("tag posting: exact + prefix parity with tag-array scan; both push") {
    val engine = Fixtures.engine(spark, sf)
    val (schema, docs) = engine.index("documents")
    val posting = PostingIndex.buildTags(docs, schema, "source")
    val tmp = java.nio.file.Files.createTempDirectory("graft-tag-posting").toString
    PostingIndex.save(posting, tmp, numPartitions = 4)
    val loaded = PostingIndex.load(spark, tmp)

    // exact tag: posting keys == tag-array scan keys
    val viaPosting = loaded.filter(col("term") === "src3")
      .select("__key").collect().map(_.getString(0)).toSet
    val viaScan = docs.filter(array_contains(col("__source__tags"), "src3"))
      .select("__key").collect().map(_.getString(0)).toSet
    assert(viaPosting == viaScan && viaPosting.nonEmpty)

    // prefix tag: startsWith over the sorted posting, same keys
    val pPosting = loaded.filter(col("term").startsWith("src1"))
      .select("__key").collect().map(_.getString(0)).toSet
    val pScan = docs.filter(exists(col("__source__tags"), _.startsWith("src1")))
      .select("__key").collect().map(_.getString(0)).toSet
    assert(pPosting == pScan && pPosting.nonEmpty)

    // both predicate shapes reach the parquet scan as pushed filters
    val eqPlan = loaded.filter(col("term") === "src3")
      .queryExecution.executedPlan.toString
    assert(eqPlan.contains("EqualTo(term,src3)"), s"equality not pushed:\n$eqPlan")
    val swPlan = loaded.filter(col("term").startsWith("src1"))
      .queryExecution.executedPlan.toString
    assert(swPlan.contains("StringStartsWith(term,src1)"),
      s"prefix not pushed:\n$swPlan")
  }

  test("engine routes tag conjuncts through a registered tag posting") {
    val withPosting = Fixtures.engine(spark, sf)
    val (schema, docs) = withPosting.index("documents")
    val tagPosting = PostingIndex.buildTags(docs, schema, "source")
    withPosting.registerPosting("documents", "source", tagPosting)
    // stats are required to route (a statless posting stays on the
    // scan path by design — the guard never counts a slice)
    withPosting.registerPostingStats("documents", "source",
      tagPosting.groupBy("term").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    val plain = Fixtures.engine(spark, sf)

    val q = "@source:{src0 | src2*} @n_chars:[100 +inf]"
    val opts = SearchOptions(limit = (0, 500), noContent = true)
    val routed = withPosting.search("documents", q, opts)
    val scanned = plain.search("documents", q, opts)
    assert(routed.collect().map(_.getString(0)).toSeq ==
      scanned.collect().map(_.getString(0)).toSeq)
    assert(routed.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    // under OR/NOT the tag stays columnar (complement needs the scan)
    val orQ = withPosting.search("documents",
      "(@source:{src0} | @n_chars:[100 200])", opts)
    assert(!orQ.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
  }

  test("engine routes OR trees of routable leaves through a posting union (X3)") {
    val withPosting = Fixtures.engine(spark, sf)
    withPosting.buildPostings("documents",
      java.nio.file.Files.createTempDirectory("graft-pi-or").toString)
    // this test pins the routing MECHANICS; the corpus terms are
    // unselective by construction, so lift the cardinality guard here
    // (guard behavior has its own test below)
    withPosting.postingRouteMaxSelectivity = 1.0
    val plain = Fixtures.engine(spark, sf)

    val q = "(@source:{src0} | @text:merging) @n_chars:[100 +inf]"
    val opts = SearchOptions(limit = (0, 500), noContent = true)
    val routed = withPosting.search("documents", q, opts)
    val scanned = plain.search("documents", q, opts)
    assert(routed.collect().map(_.getString(0)).toSeq ==
      scanned.collect().map(_.getString(0)).toSeq)
    // plan shape: fetcher union semi-joined once; the posting scans
    // carry their predicates down to the term-sorted parquet
    val opt = routed.queryExecution.optimizedPlan.toString
    assert(opt.contains("LeftSemi") && opt.contains("Union"), s"no fetcher union:\n$opt")
    val phys = routed.queryExecution.executedPlan.toString
    assert(phys.contains("EqualTo(term,src0)") && phys.contains("EqualTo(term,merg)"),
      s"posting predicates not pushed:\n$phys")
    // an OR with ANY unroutable leaf stays columnar (complement/scan)
    val mixed = withPosting.search("documents",
      "(@source:{src0} | @n_chars:[100 200])", opts)
    assert(!mixed.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    // nested OR of routable leaves routes too (selective leaves: the
    // guard's estimate SUMS branch cardinalities, reference-style)
    val nested = withPosting.search("documents",
      "((@source:{src0} | @source:{src1}) | @text:dup) @n_chars:[100 +inf]", opts)
    val nestedPlain = plain.search("documents",
      "((@source:{src0} | @source:{src1}) | @text:dup) @n_chars:[100 +inf]", opts)
    assert(nested.collect().map(_.getString(0)).toSeq ==
      nestedPlain.collect().map(_.getString(0)).toSeq)
    assert(nested.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
  }

  test("suffix posting (WITHSUFFIXTRIE): prefix/suffix/infix route with pushed filters") {
    val e = Fixtures.engine(spark, sf)
    e.buildPostings("documents",
      java.nio.file.Files.createTempDirectory("graft-pi-sfx").toString)
    e.postingRouteMaxSelectivity = 1.0 // mechanics on the tiny corpus vocab
    val plain = Fixtures.engine(spark, sf)
    val opts = SearchOptions(limit = (0, 500), noContent = true)

    // parity on all three pattern classes vs the columnar token scan
    for (q <- Seq("@text:sca* @lang:{fr}", "@text:*dow @lang:{es}",
                  "@text:*ark* @lang:{zh}")) {
      val routed = e.search("documents", q, opts)
      assert(routed.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
        s"$q did not route")
      assert(routed.collect().map(_.getString(0)).toSeq ==
        plain.search("documents", q, opts).collect().map(_.getString(0)).toSeq,
        s"$q parity broke")
    }
    // predicate shapes reach the suffix-posting parquet scan:
    // prefix/infix as StringStartsWith, suffix as EqualTo
    val pre = e.search("documents", "@text:sca* @lang:{fr}", opts)
      .queryExecution.executedPlan.toString
    assert(pre.contains("StringStartsWith(term,sca)"), s"prefix not pushed:\n$pre")
    val suf = e.search("documents", "@text:*dow @lang:{es}", opts)
      .queryExecution.executedPlan.toString
    assert(suf.contains("EqualTo(term,dow)"), s"suffix not pushed:\n$suf")
    val inf = e.search("documents", "@text:*ark* @lang:{zh}", opts)
      .queryExecution.executedPlan.toString
    assert(inf.contains("StringStartsWith(term,ark)"), s"infix not pushed:\n$inf")

    // pattern cardinality estimates come from token stats: at the
    // default threshold the broad 's*' prefix (most of the corpus)
    // falls back to the scan, no count job needed
    e.postingRouteMaxSelectivity = 0.25
    // (numeric conjunct: never routable, so LeftSemi can only come
    // from the pattern leaf under test)
    val broad = e.search("documents", "@text:s* @n_chars:[100 +inf]", opts)
    assert(!broad.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    // 'dup' is 5% of docs: du* routes even at the default threshold
    val narrow = e.search("documents", "@text:du* @n_chars:[100 +inf]", opts)
    assert(narrow.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
  }

  test("phrase routes via positional postings (adjacency posting-side)") {
    val e = Fixtures.engine(spark, sf)
    e.buildPostings("documents",
      java.nio.file.Files.createTempDirectory("graft-pi-phrase").toString)
    val plain = Fixtures.engine(spark, sf)
    val opts = SearchOptions(limit = (0, 300), noContent = true)

    // buildPostings registered a positional posting (WITHOFFSETS is the
    // index default), so the phrase fetch is the per-word slices chained
    // on (__key, pos + i) — both words' EqualTo must reach the posting
    // parquet, and "dup"'s min-occurrence estimate admits the route
    val routed = e.search("documents", "@text:\"agg dup\"", opts)
    assert(routed.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      "phrase did not route through the positional posting")
    val phys = routed.queryExecution.executedPlan.toString
    assert(phys.contains("EqualTo(term,agg)") && phys.contains("EqualTo(term,dup)"),
      s"per-word slices not pushed:\n$phys")
    val exp = plain.search("documents", "@text:\"agg dup\"", opts)
      .collect().map(_.getString(0)).toSeq
    assert(routed.collect().map(_.getString(0)).toSeq == exp && exp.nonEmpty)

    // unfielded phrase: same fetch across all text fields
    val unfielded = e.search("documents", "\"agg dup\"", opts)
    assert(unfielded.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(unfielded.collect().map(_.getString(0)).toSeq ==
      plain.search("documents", "\"agg dup\"", opts)
        .collect().map(_.getString(0)).toSeq)

    // an all-common-words phrase rejects the fetch (guard) but stays
    // correct on the scan path
    val common = e.search("documents", "@text:\"hash join\"", opts)
    assert(!common.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(common.collect().map(_.getString(0)).toSeq ==
      plain.search("documents", "@text:\"hash join\"", opts)
        .collect().map(_.getString(0)).toSeq)
  }

  test("positional adjacency is exact posting-side (order, gaps, stop words)") {
    val sp = spark; import sp.implicits._
    val schema = graft.model.IndexSchema("phr", Seq(
      graft.model.FieldDef("txt", graft.model.TextField())))
    val docs = graft.sources.Documents.enrich(Seq(
      ("d1", "alpha beta gamma"),     // phrase in order
      ("d2", "beta alpha gamma"),     // reversed — no match
      ("d3", "alpha filler beta"),    // gap — no match
      ("d4", "alpha the beta"),       // stop word removed → adjacent again
      ("d5", "gamma alpha beta"),     // phrase at the end
      ("d6", "alpha alpha beta"))     // repeated word
      .toDF("__key", "txt"), schema)
    val e = new SearchEngine
    e.createIndex(schema, docs, resident = true)
    e.buildPostings("phr",
      java.nio.file.Files.createTempDirectory("graft-pi-adj").toString)
    e.postingRouteMaxSelectivity = 1.0 // tiny corpus: mechanics, not planning
    val plain = new SearchEngine
    plain.createIndex(schema, docs, resident = true)
    val opts = SearchOptions(limit = (0, 10), noContent = true)

    def keys(eng: SearchEngine, q: String) =
      eng.search("phr", q, opts).collect().map(_.getString(0)).toSet
    // adjacency after stop-word removal: d4's "the" drops, so
    // alpha/beta sit at consecutive positions (the same stream the
    // columnar __joined verify is defined over)
    val q2 = "@txt:\"alpha beta\""
    assert(keys(e, q2) == Set("d1", "d4", "d5", "d6") && keys(e, q2) == keys(plain, q2))
    val routedPlan = e.search("phr", q2, opts).queryExecution.optimizedPlan.toString
    assert(routedPlan.contains("LeftSemi"), "tiny phrase did not route")
    // 3-word phrase: two chained position joins
    val q3 = "@txt:\"alpha beta gamma\""
    assert(keys(e, q3) == Set("d1") && keys(e, q3) == keys(plain, q3))
    // a phrase QUOTING a stop word matches nothing (the indexed stream
    // has no stop words) — the positional route is exact-empty here too
    val qs = "@txt:\"alpha the\""
    assert(keys(e, qs) == Set.empty && keys(plain, qs) == Set.empty)
    // repeated word: both occurrences must sit at consecutive positions
    // (two slices of the SAME term joined at different offsets)
    val qr = "@txt:\"alpha alpha\""
    assert(keys(e, qr) == Set("d6") && keys(e, qr) == keys(plain, qr))
    val qr3 = "@txt:\"alpha alpha beta\""
    assert(keys(e, qr3) == Set("d6") && keys(e, qr3) == keys(plain, qr3))
  }

  test("phrase falls back to the rarest stem posting without positional postings") {
    val e = Fixtures.engine(spark, sf)
    val (schema, docs) = e.index("documents")
    val p = PostingIndex.build(docs, schema, "text")
    e.registerPosting("documents", "text", p)
    e.registerPostingStats("documents", "text",
      p.groupBy("term").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    val plain = Fixtures.engine(spark, sf)
    val opts = SearchOptions(limit = (0, 300), noContent = true)

    // no positional posting registered → superset fetch on the rarest
    // word's stem slice ("dup", ~5%), columnar verify owns adjacency
    val routed = e.search("documents", "@text:\"agg dup\"", opts)
    assert(routed.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      "stem fallback did not route")
    // (the posting is registered unsaved here, so the term filter shows
    // as an in-plan Filter over the explode, not a parquet PushedFilter)
    val phys = routed.queryExecution.executedPlan.toString
    assert(phys.contains(" = dup)") && !phys.contains(" = agg)"),
      s"fetch should be the rarest word's slice only:\n$phys")
    assert(routed.collect().map(_.getString(0)).toSeq ==
      plain.search("documents", "@text:\"agg dup\"", opts)
        .collect().map(_.getString(0)).toSeq)
  }

  test("loadPostings: a restart re-attaches saved postings without rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pi-reload").toString
    val built = Fixtures.engine(spark, sf)
    built.buildPostings("documents", dir)
    val opts = SearchOptions(limit = (0, 300), noContent = true)
    val q = "@text:dup @source:{src1|src2}"
    val expect = built.search("documents", q, opts)
      .collect().map(_.getString(0)).toSeq

    // fresh engine (the restart): same index, postings re-ATTACHED from
    // the saved term-sorted dirs — no build step
    val restarted = new SearchEngine
    val (schema, docs) = built.index("documents")
    restarted.createIndex(schema, docs)
    restarted.loadPostings("documents", dir)
    val routed = restarted.search("documents", q, opts)
    assert(routed.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      "re-attached postings did not route")
    assert(routed.collect().map(_.getString(0)).toSeq == expect)
    // every posting kind re-attached (stem + suffix + positional on the
    // WITHSUFFIXTRIE text field; tag postings on the tag fields)
    val attached = restarted.info("documents").collect()
      .map(r => r.getAs[String]("field") -> r.getAs[String]("attached_indexes"))
      .toMap
    assert(attached("text") == "posting,suffix_posting,positional_posting")
    assert(attached("source") == "posting")
    // stats re-collected: the phrase route picks the rarest word again
    val phr = restarted.search("documents", "@text:\"agg dup\"", opts)
    assert(phr.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(phr.collect().map(_.getString(0)).toSeq ==
      built.search("documents", "@text:\"agg dup\"", opts)
        .collect().map(_.getString(0)).toSeq)
  }

  test("min-child ordering: routed conjuncts semi-join smallest-first") {
    val e = Fixtures.engine(spark, sf)
    e.buildPostings("documents",
      java.nio.file.Files.createTempDirectory("graft-pi-minchild").toString)
    e.postingRouteMaxSelectivity = 1.0 // both conjuncts must route
    val opts = SearchOptions(limit = (0, 500), noContent = true)

    // written WIDE-first: the lang tag (~1/5 of docs) precedes the rare
    // term (~5%); the planner must reorder so the term drives
    val routed = e.search("documents", "@lang:{en} @text:dup", opts)
    assert(e.lastRouteEstimates.length == 2, s"both should route: ${e.lastRouteEstimates}")
    assert(e.lastRouteEstimates == e.lastRouteEstimates.sorted,
      s"not min-child ordered: ${e.lastRouteEstimates}")
    // and the estimates genuinely differ, so the sort meant something
    assert(e.lastRouteEstimates.distinct.length == 2)

    // parity with the plain columnar scan
    val plain = Fixtures.engine(spark, sf)
    assert(routed.collect().map(_.getString(0)).toSeq ==
      plain.search("documents", "@lang:{en} @text:dup", opts)
        .collect().map(_.getString(0)).toSeq)
  }

  test("cardinality guard: unselective posting slices fall back to the scan") {
    // The reference planner fetches by posting only when the slice is
    // small (min-child selection); joining back half the corpus loses
    // to the scan. 'dup' hits 5% of docs -> routes; 'merging' stems to
    // a ~77% term -> the fetch is rejected and the columnar predicate
    // serves it. Results identical either way.
    val e = Fixtures.engine(spark, sf)
    e.buildPostings("documents",
      java.nio.file.Files.createTempDirectory("graft-pi-guard").toString)
    val opts = SearchOptions(limit = (0, 500), noContent = true)
    val selective = e.search("documents", "@text:dup @n_chars:[100 +inf]", opts)
    assert(selective.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    val unselective = e.search("documents", "@text:merging @n_chars:[100 +inf]", opts)
    assert(!unselective.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    val plain = Fixtures.engine(spark, sf)
    assert(unselective.collect().map(_.getString(0)).toSeq ==
      plain.search("documents", "@text:merging @n_chars:[100 +inf]", opts)
        .collect().map(_.getString(0)).toSeq)
  }

  test("differential fuzz: routed engine == columnar engine on random filter trees") {
    // The routing layer (fetchers, OR-unions, guard accept/reject,
    // min-child ordering, phrase chains, pattern classes) must NEVER
    // change results — whatever the guard decides, routed ≡ columnar.
    // Random trees over the corpus vocabulary pin the whole algebra,
    // including the guard boundaries the fixed cases straddle.
    val routedEng = Fixtures.engine(spark, sf)
    routedEng.buildPostings("documents",
      java.nio.file.Files.createTempDirectory("graft-pi-fuzz").toString)
    val plain = Fixtures.engine(spark, sf)
    val opts = SearchOptions(limit = (0, 1000), noContent = true)
    val rnd = new scala.util.Random(0xBEEF)
    val words = Vector("dup", "agg", "merge", "sort", "hash", "join",
      "scan", "vector", "stream", "window", "zzzmissing")
    val langs = Vector("en", "fr", "es", "de", "zh")
    val sources = Vector("src0", "src1", "src2", "src3", "src4")

    def leaf(): String = rnd.nextInt(9) match {
      case 0 => s"@text:${words(rnd.nextInt(words.size))}"
      case 1 => s"@lang:{${langs(rnd.nextInt(langs.size))}}"
      case 2 => s"@source:{${sources(rnd.nextInt(sources.size))}" +
        (if (rnd.nextBoolean()) s" | ${sources(rnd.nextInt(sources.size))}}" else "}")
      case 3 => s"@n_chars:[${rnd.nextInt(300)} ${300 + rnd.nextInt(5000)}]"
      case 4 => s"""@text:"${words(rnd.nextInt(5))} ${words(rnd.nextInt(5))}""""
      case 5 => s"@text:${words(rnd.nextInt(words.size)).take(2 + rnd.nextInt(2))}*"
      case 6 => s"@text:*${words(rnd.nextInt(words.size)).takeRight(2 + rnd.nextInt(2))}"
      case 7 => s"@source:{src${rnd.nextInt(3)}*}"
      case 8 => words(rnd.nextInt(words.size)) // unfielded term
    }
    def tree(depth: Int): String =
      if (depth == 0) leaf()
      else rnd.nextInt(4) match {
        case 0 => s"(${tree(depth - 1)} ${tree(depth - 1)})"       // AND
        case 1 => s"(${tree(depth - 1)} | ${tree(depth - 1)})"     // OR
        case 2 => s"(${tree(depth - 1)} -${leaf()})"               // AND NOT
        case 3 => leaf()
      }

    var checked = 0
    for (i <- 0 until 120) {
      val q = tree(1 + rnd.nextInt(2))
      val got = routedEng.search("documents", q, opts)
        .collect().map(_.getString(0)).toSeq
      val exp = plain.search("documents", q, opts)
        .collect().map(_.getString(0)).toSeq
      assert(got == exp, s"query #$i diverged: $q\nrouted=$got\ncolumnar=$exp")
      checked += 1
    }
    assert(checked == 120)
  }

  test("engine routes AND'ed fielded terms through a registered posting") {
    val withPosting = Fixtures.engine(spark, sf)
    val (schema, docs) = withPosting.index("documents")
    val termPosting = PostingIndex.build(docs, schema, "text")
    withPosting.registerPosting("documents", "text", termPosting)
    // stats are required to route (statless postings stay on the scan)
    withPosting.registerPostingStats("documents", "text",
      termPosting.groupBy("term").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    withPosting.postingRouteMaxSelectivity = 1.0 // mechanics, not planning
    val plain = Fixtures.engine(spark, sf)

    val q = "@text:merging @lang:{en} @n_chars:[100 +inf]" // stemmed term + verify filters
    val opts = SearchOptions(limit = (0, 500), noContent = true)
    val routed = withPosting.search("documents", q, opts)
    val scanned = plain.search("documents", q, opts)
    assert(routed.collect().map(_.getString(0)).toSeq ==
      scanned.collect().map(_.getString(0)).toSeq)
    // the routed plan is a semi-join against the posting relation
    assert(routed.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    // stop-word terms are NOT routed (they vanish from the query)
    val sw = withPosting.search("documents", "@text:the @lang:{en}", opts)
    assert(sw.count() == plain.search("documents", "@text:the @lang:{en}", opts).count())
  }
}
