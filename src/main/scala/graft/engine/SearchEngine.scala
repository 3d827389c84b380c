package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

import graft.model._
import graft.query._
import graft.compile.PredicateCompiler
import graft.text.Analyzer
import graft.functions.vector_distance

/**
 * Physical-layout pruning hint for a NUMERIC field whose relation was
 * written by [[graft.sources.Layout.saveNumericBucketed]]: partition
 * column `bucketCol` holds `floor(field/step)`, so a range predicate
 * `lo ≤ f ≤ hi` implies `floor(lo/step) ≤ bucketCol ≤ floor(hi/step)`
 * — a PartitionFilter that prunes directories before any scan task
 * launches. The hint only ever ADDS an implied superset conjunct; the
 * compiled range predicate keeps exact semantics.
 */
final case class NumericBucketLayout(bucketCol: String, step: Double) {
  require(step > 0, "step must be positive")
}

/**
 * Key-prefix layout hint for a registered relation written by
 * [[graft.sources.Layout.saveKeyPrefixPartitioned]]: partition column
 * `partitionCol` holds the first `prefixLen` characters of the key, so
 * a PREFIX subscription (reference index_schema.cc prefix matching,
 * COMMANDS.md:38) implies a PartitionFilter — equality when the
 * subscribed prefix is at least `prefixLen` long, startsWith otherwise.
 * A superset by construction; the exact startsWith on the key column
 * (applied at bind, [[Commands]]) keeps the semantics.
 */
final case class KeyPrefixLayout(partitionCol: String, prefixLen: Int) {
  require(prefixLen > 0, "prefixLen must be positive")
  /** The PartitionFilter one subscribed prefix implies. */
  def pruneCond(prefix: String): org.apache.spark.sql.Column =
    if (prefix.length >= prefixLen)
      org.apache.spark.sql.functions.col(partitionCol) === prefix.take(prefixLen)
    else org.apache.spark.sql.functions.col(partitionCol).startsWith(prefix)
}

/**
 * FT.SEARCH options (reference: src/query/search.h:43-111,
 * src/commands/ft_search_parser.cc:102-242).
 *
 * `limit` defaults to (0, 10) like the reference (COMMANDS.md:181) —
 * which also means the physical plan is a TakeOrderedAndProject top-k,
 * never a full global sort.
 */
final case class SearchOptions(
    limit: (Int, Int) = (0, 10),
    sortBy: Option[(String, Boolean)] = None, // (field, ascending)
    returnFields: Seq[(String, Option[String])] = Nil, // (field, AS alias)
    noContent: Boolean = false,
    params: Map[String, ParamValue] = Map.empty,
    slop: Option[Int] = None,
    inorder: Boolean = false,
    verbatim: Boolean = false,
    // WITHSORTKEYS (reference search.h:71, ft_search.cc:153-159): each
    // result carries a `__sortkey` column = "#" + the SORTBY field's
    // value ("" when missing / no SORTBY), mirroring the RESP shape.
    withSortKeys: Boolean = false)

/**
 * The engine facade: a catalog of named indexes (≈ SchemaManager,
 * reference src/schema_manager.cc) over document DataFrames, compiling
 * FT.SEARCH / FT.AGGREGATE requests to DataFrame plans.
 *
 * Distribution model: where the reference scatter-gathers over gRPC and
 * merges a k-bounded heap (SURVEY §2.8 C1/C2, src/query/fanout.cc:50-134),
 * here `filter → orderBy(score) → limit(k)` plans to a distributed
 * TakeOrderedAndProject — partition-local top-k heaps merged on the
 * driver, identical algorithm, zero custom code.
 */
object SearchEngine {
  /** Full FT.SEARCH reply: pre-LIMIT total + page (S7/R6). */
  final case class SearchReply(total: Long, rows: Array[org.apache.spark.sql.Row])

  /** Soak/probe-only forensics switch (see nonVectorReply): when on, a
    * page that collects empty while its total counted throws a
    * diagnostic instead of replying — the r13 anomaly localizer. */
  @volatile var debugEmptyPage: Boolean = false

  /** A complete cached reply plus the per-call metric effects to replay
    * on a hit, so counters stay call-accurate (truncation + record
    * drops). */
  private[engine] final case class CachedReply(indexName: String, epoch: Long,
      reply: SearchReply, limited: Boolean, dropped: Long,
      lastUsed: java.util.concurrent.atomic.AtomicLong)

  /** A materialized non-vector filter base. `local = true` entries are
    * driver-resident LocalRelations (bases within baseCacheMaxRows,
    * narrow NOCONTENT bases) with no lifecycle at all. Bigger bases are
    * CACHE-PRIVATE persisted relations (their plan carries a
    * per-request nonce — see cachePrivate — so no other request's plan
    * aliases them in Spark's CacheManager) whose unpersist is governed
    * by the reader-refcount handshake below: eviction/invalidation can
    * then never destroy a relation an in-flight reader is scanning
    * (the r13 soak's AQE empty-propagation finding). `n` is the exact
    * row count, from which every page's total and truncation flag
    * derive. */
  private[engine] final case class CachedBase(indexName: String, epoch: Long,
      df: DataFrame, n: Long,
      lastUsed: java.util.concurrent.atomic.AtomicLong,
      local: Boolean = true,
      dead: java.util.concurrent.atomic.AtomicBoolean =
        new java.util.concurrent.atomic.AtomicBoolean(false),
      readers: java.util.concurrent.atomic.AtomicInteger =
        new java.util.concurrent.atomic.AtomicInteger(0)) {
    /** Register a bracketed reader. Returns false when the entry died
      * first — the caller treats it as a miss. Handshake: increment
      * THEN check dead; [[kill]] sets dead THEN checks readers — under
      * sequentially consistent atomics one side always observes the
      * other, so unpersist can never run under an in-flight read. */
    def acquire(): Boolean = {
      readers.incrementAndGet()
      if (dead.get()) { release(); false } else true
    }
    def release(): Unit = {
      if (readers.decrementAndGet() == 0 && dead.get() && !local)
        df.unpersist(blocking = false)
      ()
    }
    /** Mark dead and unpersist once no reader holds it (the last
      * release otherwise does). Idempotent. */
    def kill(): Unit = {
      dead.set(true)
      if (readers.get() == 0 && !local) df.unpersist(blocking = false)
      ()
    }
  }

  /** Index build state (reference index_schema.h:102-109, FT.INFO
    * fields index_schema.cc:1244-1263): `state` is "ready" or
    * "backfill_in_progress"; percent counts the initial fill only —
    * steady-state mutations are not backfill (index_schema.h:557). */
  final case class BuildState(state: String,
                              backfillInProgress: Boolean,
                              backfillCompletePercent: Double,
                              mutationQueueSize: Long)
  val Ready: BuildState = BuildState("ready", false, 100.0, 0L)

  /** Restore an index saved by [[SearchEngine.saveIndex]] into
    * `engine`, re-attaching any saved derived state: postings (+stats)
    * through [[SearchEngine.loadPostings]] and NSW graphs per vector
    * field — the full restart path (reference RDB load restores its
    * indexes without rebuild, rdb_serialization.cc:324). */
  def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                engine: SearchEngine): SearchEngine = {
    val schema = graft.util.FsIO
      .readObj[IndexSchema](spark, s"$path/schema.bin")
      .getOrElse(throw new java.io.FileNotFoundException(
        s"no saved index at $path (missing schema.bin)"))
    engine.createIndex(schema, spark.read.parquet(s"$path/data"))
    if (graft.util.FsIO.isDir(spark, s"$path/postings"))
      engine.loadPostings(schema.name, s"$path/postings")
    schema.fields.foreach { fd =>
      if (graft.util.FsIO.isDir(spark, s"$path/ann/${fd.alias}"))
        engine.registerAnn(schema.name, fd.alias,
          graft.pipeline.Nsw.load(spark, s"$path/ann/${fd.alias}"))
    }
    engine
  }
}

class SearchEngine {

  // LinkedHashMap for FT._LIST insertion order; guarded by its own
  // monitor (all other engine caches are lock-free TrieMaps — queries
  // read them concurrently with maintainer-thread registration)
  private val catalog = scala.collection.mutable.LinkedHashMap.empty[String, (IndexSchema, DataFrame)]
  private val annIndexes = scala.collection.concurrent.TrieMap.empty[(String, String), graft.pipeline.Nsw.NswIndex]
  private val postings = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
  private val postingStats = scala.collection.concurrent.TrieMap.empty[(String, String), PostingStats]
  private val suffixPostings = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
  private val tokenStats = scala.collection.concurrent.TrieMap.empty[(String, String), PostingStats]
  private val posPostings = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
  private val posStats = scala.collection.concurrent.TrieMap.empty[(String, String), PostingStats]
  /** Registration epoch of each derived RELATION — (kind, index, field)
    * → [[epochOf]] at registration time; kinds: posting / suffix /
    * pos / ann. The filter and KNN stages consult a derived relation
    * only when its registration epoch equals the epoch the request
    * captured BEFORE its catalog read: a reader that snapshotted the
    * OLD docs just before a createIndex swap must not route through
    * postings the maintainer re-registered from the NEW corpus — that
    * semi-join would drop keys the old snapshot matches but the new
    * posting no longer lists (changed/deleted docs), a reply consistent
    * with NEITHER epoch. Stats registries need no epochs: a stale
    * estimate can only mis-price routing, never change semantics (the
    * compiled predicate owns them). All mismatches degrade to the
    * always-correct columnar scan / exact-KNN path. */
  private val derivedEpochs = scala.collection.concurrent.TrieMap.empty[(String, String, String), Long]
  /** Estimated cardinalities of the last query's routed conjuncts, in
    * semi-join order (ascending = min-child first). Planner telemetry
    * for specs; not part of the public surface. */
  private[graft] var lastRouteEstimates: Seq[Long] = Nil
  /** Memoized FT.INFO counters per index — the batch analogue of the
    * reference maintaining its reply counters per mutation
    * (index_schema.cc): between registrations the relation is
    * immutable, so the stats row is computed once and invalidated on
    * any index mutation (createIndex / dropIndex / registerPosting). */
  private val infoStatsCache = scala.collection.concurrent.TrieMap.empty[String, (org.apache.spark.sql.Row, Long)]
  /** Unfiltered enriched relation per index — FT.INFO's view, so
    * hash_indexing_failures still counts whole-key-dropped docs that
    * the serving relation in [[catalog]] excludes. */
  private val infoDocs = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val layouts = scala.collection.concurrent.TrieMap.empty[(String, String), NumericBucketLayout]
  private val keyLayouts = scala.collection.concurrent.TrieMap.empty[String, KeyPrefixLayout]

  // ---------------------------------------------------------------------
  // Reply cache — the serving-floor lever (ServeLatencyProbe finding):
  // a warm FT.SEARCH pays ~100 ms of per-call plan re-analysis and
  // persist bookkeeping on identical requests. The reference serves
  // repeats from its always-current in-memory index for free; the batch
  // analogue is a bounded cache of COMPLETE non-vector replies, keyed by
  // everything that can change the answer: index name + registration
  // epoch, query string, the full option set (params canonicalized), and
  // the mutable reply caps. Correctness rests on the r10 catalog
  // contract: every results-affecting mutation goes through createIndex
  // (maintainer batches, FT.CREATE over an existing name) or dropIndex —
  // both bump the epoch and clear the index's entries, so a cached reply
  // is valid for exactly one registration generation. Derived-state
  // registrations (postings/stats/layouts) are results-invariant for the
  // cached class (routing parity is fuzz-pinned); KNN replies are NOT
  // cached (they depend on ANN registration and the hybrid planner's
  // mutable threshold, and they bump planner counters per call).
  // ---------------------------------------------------------------------
  /** Serve repeated identical FT.SEARCH requests from a bounded reply
    * cache (invalidated per index on createIndex/dropIndex). */
  var replyCacheEnabled: Boolean = true
  /** LRU bound on cached replies across all indexes. */
  var replyCacheMaxEntries: Int = 256
  /** Replies with more page rows than this are never cached (memory
    * bound per entry; LIMIT-sized pages are far below it). */
  var replyCacheMaxRows: Int = 10000
  private[graft] val replyCacheHits = new java.util.concurrent.atomic.AtomicLong
  private[graft] val replyCacheMisses = new java.util.concurrent.atomic.AtomicLong
  private val epochs = scala.collection.concurrent.TrieMap.empty[String, java.util.concurrent.atomic.AtomicLong]
  // read-only: a lookup for an unknown name must NOT insert (clients
  // probing arbitrary index names over the socket would grow the map
  // without bound); absent reads as epoch 0, the pre-first-create value
  private def epochOf(name: String): Long =
    epochs.get(name).fold(0L)(_.get())
  /** Registration generation of an index — bumps on createIndex /
    * dropIndex. Any cache keyed by an index's contents must carry it
    * (the RESP adapter's aggregate-reply cache does). */
  private[graft] def registrationEpoch(name: String): Long = epochOf(name)
  // Ordering contract with the lookup path: searchReply reads the epoch
  // BEFORE the catalog, so a lookup that races a re-registration either
  // keys the new data under the old epoch (unreachable after the bump —
  // harmless) or misses; it can never key OLD data under the NEW epoch.
  // createIndex/dropIndex update the catalog first, then bump.
  private def bumpEpoch(name: String): Unit = {
    epochs.getOrElseUpdate(name, new java.util.concurrent.atomic.AtomicLong)
      .incrementAndGet()
    ()
  }
  private val replyCache = scala.collection.concurrent.TrieMap.empty[String, SearchEngine.CachedReply]
  private val replyTick = new java.util.concurrent.atomic.AtomicLong
  private[graft] def replyCacheSize: Int = replyCache.size
  private def dropCachedReplies(name: String): Unit = {
    replyCache.filterInPlace { case (_, v) => v.indexName != name }
    ()
  }
  private def replyKey(name: String, ep: Long, query: String,
                       opts: SearchOptions): String = {
    def pv(v: ParamValue): String = v match {
      case StringParam(s) => "s:" + s
      case VectorParam(a) => "v:" + a.mkString(",") // by contents, not identity
    }
    // length-prefixed join: user-controlled strings (query text, param
    // names/values) may contain ANY character, so delimiter joining
    // would let two different requests collide on one key and serve
    // each other's cached replies — "<len>:<content>" per component is
    // unambiguous regardless of content
    val sb = new StringBuilder
    def add(s: String): Unit = { sb.append(s.length).append(':').append(s); () }
    add(name); add(ep.toString); add(query)
    add(opts.limit.toString); add(opts.sortBy.toString)
    opts.returnFields.foreach { case (f, as) => add(f); add(as.toString) }
    add(Seq(opts.noContent, opts.slop, opts.inorder, opts.verbatim,
      opts.withSortKeys).mkString(","))
    opts.params.toSeq.sortBy(_._1).foreach { case (k, v) => add(k); add(pv(v)) }
    add(Seq(maxNonVectorResultsFetched, maxSearchResultRecordSize,
      maxSearchResultFieldsCount).mkString(","))
    sb.toString
  }
  private def evictLruReplies(): Unit =
    while (replyCache.size > replyCacheMaxEntries) {
      val oldest = replyCache.minByOption { case (_, v) => v.lastUsed.get() }
      oldest.foreach { case (k, _) => replyCache.remove(k) }
      if (oldest.isEmpty) return
    }

  // ---------------------------------------------------------------------
  // Filtered-base cache — the second serving lever (ServeLatencyProbe
  // decomposition): the reply cache only serves EXACT repeats, but the
  // expensive half of a non-vector reply — filterStage + limit(cap+1) +
  // the total count — depends on strictly fewer inputs than the reply
  // (query, params, VERBATIM/SLOP/INORDER, the fetch cap; NOT the page
  // offset/limit, SORTBY, RETURN, NOCONTENT, WITHSORTKEYS). A client
  // paging through results, or re-requesting with different RETURN
  // fields, re-pays the corpus scan today. This cache keeps the
  // materialized base (a driver-resident LocalRelation of at most
  // baseCacheMaxRows rows — r13: Spark persists left the serving path,
  // see cachePrivate) plus its count for one registration epoch, so
  // such variants pay a LocalTableScan instead of the corpus scan.
  // Bases past the row bound are served per-request from a
  // cache-private persisted materialization and never cached — when
  // the fetch cap truncates those, the single materialization still
  // guarantees the total and its page draw from the SAME subset.
  // Invalidation and race-ordering are identical to the reply cache
  // (epoch read BEFORE catalog; insert re-checks the epoch). KNN is
  // excluded for the reply cache's reasons. Narrow NOCONTENT bases
  // (see the single-action path in searchReply) are LocalRelations of
  // collected key/sortkey rows and carry their projection in the key so
  // a content request can never hit a keys-only base; a NOCONTENT
  // request may fall through to a full base (a superset projection).
  // ---------------------------------------------------------------------
  /** Cache the filtered cap+1-row base relation + total per (epoch,
    * query, filter-affecting options), serving page/RETURN variants
    * without re-scanning (invalidated per index on createIndex /
    * dropIndex). */
  var baseCacheEnabled: Boolean = true
  /** LRU bound on cached filtered bases across all indexes. Since r13
    * every entry is a driver-resident LocalRelation (full bases of at
    * most [[baseCacheMaxRows]] rows; narrow NOCONTENT bases of key/sort
    * rows) — eviction and invalidation are pure map removals, with NO
    * Spark unpersist lifecycle: the interleaving soak proved that
    * unpersisting plan-keyed cached data while a concurrent request
    * reads a plan-equal relation lets AQE freeze a zero-row stage into
    * that request's reply (see [[cachePrivate]]). */
  var baseCacheMaxEntries: Int = 32
  /** Row bound for caching a FULL base as a LocalRelation. Filtered
    * bases above it (up to the fetch cap) are never cached — they are
    * served from a request-private persisted materialization instead. */
  var baseCacheMaxRows: Int = 4096
  private[graft] val baseCacheHits = new java.util.concurrent.atomic.AtomicLong
  private[graft] val baseCacheMisses = new java.util.concurrent.atomic.AtomicLong
  /** Telemetry: the column list the last single-action NOCONTENT miss
    * collected — at scale this projection is the difference between
    * shipping keys and shipping document text to the driver; specs pin
    * it to exactly key + SORTBY source. */
  private[graft] var lastBaseProjection: Seq[String] = Nil
  private val baseCache = scala.collection.concurrent.TrieMap.empty[String, SearchEngine.CachedBase]
  private[graft] def baseCacheSize: Int = baseCache.size
  private def dropCachedBases(name: String): Unit = {
    baseCache.filterInPlace { case (_, v) =>
      val drop = v.indexName == name
      if (drop) v.kill() // deferred past any in-flight reader
      !drop
    }
    ()
  }
  /** Key of the base-affecting request subset. `projection` is "full"
    * for the whole enriched row set or "nc:<sortalias>" for a narrow
    * NOCONTENT base, so projections can never cross-serve downward. */
  private def baseKey(name: String, ep: Long, query: String,
                      opts: SearchOptions, cap: Int, projection: String): String = {
    def pv(v: ParamValue): String = v match {
      case StringParam(s) => "s:" + s
      case VectorParam(a) => "v:" + a.mkString(",")
    }
    val sb = new StringBuilder
    def add(s: String): Unit = { sb.append(s.length).append(':').append(s); () }
    add(name); add(ep.toString); add(query); add(projection)
    add(Seq(opts.slop, opts.inorder, opts.verbatim, cap).mkString(","))
    opts.params.toSeq.sortBy(_._1).foreach { case (k, v) => add(k); add(pv(v)) }
    sb.toString
  }
  private def evictLruBases(): Unit =
    while (baseCache.size > baseCacheMaxEntries) {
      val oldest = baseCache.minByOption { case (_, v) => v.lastUsed.get() }
      oldest.foreach { case (k, _) => baseCache.remove(k).foreach(_.kill()) }
      if (oldest.isEmpty) return
    }
  /** Insert a freshly collected base; drops any entry stranded by a
    * racing re-registration (same contract as the reply cache's
    * post-insert epoch re-check). The loser of an insert race is
    * killed (its plan is nonce-private, so that touches nobody else);
    * every removal path defers unpersist past in-flight readers. */
  private def putCachedBase(key: String, entry: SearchEngine.CachedBase): Unit = {
    baseCache.putIfAbsent(key, entry) match {
      case Some(_) => entry.kill()
      case None =>
        if (epochOf(entry.indexName) != entry.epoch)
          baseCache.remove(key).foreach(_.kill())
        evictLruBases()
    }
    ()
  }

  /**
   * Attach an inverted posting relation ([[graft.text.PostingIndex]])
   * to a TEXT field. Top-level AND'ed fielded Term predicates then
   * retrieve by posting lookup + semi-join (the reference's X2
   * AND-min-child fetch, src/query/search.cc:336-347) instead of
   * scanning every document's token arrays; all other predicates stay
   * on the columnar path and verify the fetched set.
   */
  def registerPosting(indexName: String, field: String,
                      posting: DataFrame): this.type = {
    postings((indexName, field)) = posting
    derivedEpochs(("posting", indexName, field)) = epochOf(indexName)
    postingStats.remove((indexName, field)) // stats describe the OLD relation
    infoStatsCache.remove(indexName)
    this
  }

  /**
   * Per-term document frequencies for a registered posting — the
   * analogue of the reference's O(1) posting-list sizes on radix nodes,
   * which its planner reads for min-child / cardinality decisions
   * WITHOUT touching the lists. With stats present the routing guard
   * estimates driver-side (hot map — zero jobs) or from the tiny
   * persisted stats relation (one pushed point-read); a posting with
   * NO stats does not route (the guard declines into the
   * always-correct columnar scan rather than pricing the conjunct
   * with a data-proportional count job — see [[PostingStats]]).
   */
  def registerPostingStats(indexName: String, field: String,
                           termCounts: Map[String, Long]): this.type =
    registerPostingStats(indexName, field, PostingStats.hotOnly(termCounts))

  def registerPostingStats(indexName: String, field: String,
                           stats: PostingStats): this.type = {
    postingStats((indexName, field)) = stats
    infoStatsCache.remove(indexName) // num_terms may now serve from stats
    this
  }

  /** Declare the registered relation's physical layout for a NUMERIC
    * field ([[NumericBucketLayout]]): range predicates on the field
    * then AND the implied bucket PartitionFilter under the compiled
    * filter, pruning partition directories at 100-TB layouts. Like all
    * derived registrations, call AFTER createIndex (which drops it). */
  def registerLayout(indexName: String, field: String,
                     layout: NumericBucketLayout): this.type = {
    layouts((indexName, field)) = layout
    this
  }

  /** Declare the registered relation's key-prefix physical layout
    * ([[KeyPrefixLayout]]): when the index carries PREFIX
    * subscriptions, every query then ANDs the implied partition-column
    * conjunct (engine-side, no caller cooperation — the reference's
    * prefix matching lives in index_schema.cc, not in its clients),
    * pruning partition directories before any scan task launches.
    * Like all derived registrations, call AFTER createIndex. */
  def registerKeyPrefixLayout(indexName: String,
                              layout: KeyPrefixLayout): this.type = {
    keyLayouts(indexName) = layout
    this
  }

  /** Attach a suffix posting ([[graft.text.PostingIndex.buildSuffixes]],
    * the WITHSUFFIXTRIE analogue) to a TEXT field: prefix/suffix/infix
    * predicates then retrieve by pushed-filter posting scan + semi-join
    * instead of scanning every document's token arrays. */
  def registerSuffixPosting(indexName: String, field: String,
                            posting: DataFrame): this.type = {
    suffixPostings((indexName, field)) = posting
    derivedEpochs(("suffix", indexName, field)) = epochOf(indexName)
    tokenStats.remove((indexName, field))
    this
  }

  /** Distinct-token document frequencies for pattern-cardinality
    * estimates (prefix/suffix/infix sum the matching tokens' counts). */
  def registerTokenStats(indexName: String, field: String,
                         counts: Map[String, Long]): this.type =
    registerTokenStats(indexName, field, PostingStats.hotOnly(counts))

  def registerTokenStats(indexName: String, field: String,
                         stats: PostingStats): this.type = {
    tokenStats((indexName, field)) = stats
    this
  }

  /** Attach a positional posting ([[graft.text.PostingIndex
    * .buildPositions]], the WITHOFFSETS analogue — text_index.h:57-88
    * keeps word positions in each posting): Phrase predicates then
    * resolve adjacency posting-side (per-word slices chained on
    * `(__key, pos + i)`) instead of fetching a superset slice and
    * reading candidate documents' text. */
  def registerPositionalPosting(indexName: String, field: String,
                                posting: DataFrame): this.type = {
    posPostings((indexName, field)) = posting
    derivedEpochs(("pos", indexName, field)) = epochOf(indexName)
    posStats.remove((indexName, field))
    this
  }

  /** Per-term OCCURRENCE counts for a positional posting (≥ document
    * frequency — a sound upper bound for the routing guard). */
  def registerPositionalStats(indexName: String, field: String,
                              counts: Map[String, Long]): this.type =
    registerPositionalStats(indexName, field, PostingStats.hotOnly(counts))

  def registerPositionalStats(indexName: String, field: String,
                              stats: PostingStats): this.type = {
    posStats((indexName, field)) = stats
    this
  }

  /**
   * Build, save (term-sorted layout) and register posting relations
   * for an index's TEXT and TAG fields in one step — the FT.CREATE-
   * driven form of [[registerPosting]], so any index (not just ones a
   * caller hand-built postings for) gets the reference's radix-posting
   * retrieval shape (text_index.h:57-88, tag.h:33-44). `fields`
   * defaults to every TEXT + TAG field. TEXT fields get a stem posting
   * (unless NOSTEM — those match original tokens) plus, when
   * WITHSUFFIXTRIE, a suffix posting for pattern queries; TAG fields
   * get a normalized-value posting. Per-term/token frequency maps are
   * collected alongside as planner metadata.
   */
  def buildPostings(indexName: String, dir: String,
                    fields: Seq[String] = Nil,
                    numPartitions: Int = 32): this.type = {
    val (schema, docs) = index(indexName)
    val targets =
      if (fields.nonEmpty) fields.map(schema.fieldOrFail)
      else schema.fields.filter(fd => fd.ftype match {
        case _: TextField | _: TagField => true
        case _ => false
      })
    def saveLoad(posting: DataFrame, path: String): DataFrame = {
      graft.text.PostingIndex.save(posting, path, numPartitions)
      graft.text.PostingIndex.load(docs.sparkSession, path)
    }
    targets.foreach { fd =>
      fd.ftype match {
        case tf: TextField =>
          // stem posting — skipped for NOSTEM fields (they match
          // original tokens; postings hold stem sets)
          if (!tf.noStem) {
            val loaded = saveLoad(
              graft.text.PostingIndex.build(docs, schema, fd.alias),
              s"$dir/${fd.alias}")
            registerPosting(indexName, fd.alias, loaded)
            registerPostingStats(indexName, fd.alias,
              PostingStats.persist(loaded, s"$dir/${fd.alias}__stats"))
          }
          // WITHSUFFIXTRIE (suffix.h): suffix posting for `p*` `*s` `*i*`
          if (tf.withSuffixTrie) {
            val sLoaded = saveLoad(
              graft.text.PostingIndex.buildSuffixes(docs, schema, fd.alias),
              s"$dir/${fd.alias}__suffix")
            registerSuffixPosting(indexName, fd.alias, sLoaded)
            registerTokenStats(indexName, fd.alias, PostingStats.persist(
              sLoaded.filter(col("full")), s"$dir/${fd.alias}__suffix_stats"))
          }
          // WITHOFFSETS (default, ft_create_parser.cc:98-99): positional
          // posting so phrases resolve adjacency posting-side — the
          // reference always stores offsets unless NOOFFSETS
          if (schema.analyzer.withOffsets) {
            val pLoaded = saveLoad(
              graft.text.PostingIndex.buildPositions(docs, schema, fd.alias),
              s"$dir/${fd.alias}__pos")
            registerPositionalPosting(indexName, fd.alias, pLoaded)
            registerPositionalStats(indexName, fd.alias,
              PostingStats.persist(pLoaded, s"$dir/${fd.alias}__pos_stats"))
          }
        case _: TagField =>
          val loaded = saveLoad(
            graft.text.PostingIndex.buildTags(docs, schema, fd.alias),
            s"$dir/${fd.alias}")
          registerPosting(indexName, fd.alias, loaded)
          registerPostingStats(indexName, fd.alias,
            PostingStats.persist(loaded, s"$dir/${fd.alias}__stats"))
        case t => throw new IllegalArgumentException(
          s"postings need TEXT or TAG, ${fd.alias} is $t")
      }
    }
    this
  }

  /**
   * Re-attach posting relations previously SAVED by [[buildPostings]]
   * under `dir` — the restart path (the reference's RDB load restores
   * its indexes without a rebuild, rdb_serialization.cc): each
   * `<alias>` / `<alias>__suffix` / `<alias>__pos` subdirectory loads
   * as the matching posting kind for the field, and the persisted
   * stats relation (`*__stats`) re-attaches WITHOUT recomputation —
   * stats survive restart as data. A dir saved before stats
   * persistence upgrades in place (one small groupBy + tiny write).
   */
  def loadPostings(indexName: String, dir: String): this.type = {
    val (schema, docs) = index(indexName)
    val spark = docs.sparkSession
    def sub(name: String): Option[DataFrame] = {
      // Hadoop FS probe (not java.io.File): on a non-local scheme a
      // File probe silently sees nothing and the restart attaches no
      // postings — same contract as PostingStore/FsIO.
      if (graft.util.FsIO.isDir(spark, s"$dir/$name"))
        Some(graft.text.PostingIndex.load(spark, s"$dir/$name"))
      else None
    }
    def stats(name: String, statRows: => DataFrame): PostingStats =
      if (graft.util.FsIO.isDir(spark, s"$dir/$name"))
        PostingStats.fromRelation(PostingStats.load(spark, s"$dir/$name"))
      else PostingStats.persist(statRows, s"$dir/$name") // pre-stats dir
    schema.fields.foreach { fd =>
      if (fd.ftype.isInstanceOf[TextField] || fd.ftype.isInstanceOf[TagField]) {
        sub(fd.alias).foreach { loaded =>
          registerPosting(indexName, fd.alias, loaded)
          registerPostingStats(indexName, fd.alias,
            stats(s"${fd.alias}__stats", loaded))
        }
        sub(s"${fd.alias}__suffix").foreach { loaded =>
          registerSuffixPosting(indexName, fd.alias, loaded)
          registerTokenStats(indexName, fd.alias,
            stats(s"${fd.alias}__suffix_stats", loaded.filter(col("full"))))
        }
        sub(s"${fd.alias}__pos").foreach { loaded =>
          registerPositionalPosting(indexName, fd.alias, loaded)
          registerPositionalStats(indexName, fd.alias,
            stats(s"${fd.alias}__pos_stats", loaded))
        }
      }
    }
    this
  }

  /**
   * Attach a built ANN graph to a vector field — the analogue of
   * declaring the field HNSW instead of FLAT. With one attached,
   * [[search]] applies the reference's hybrid planner rule
   * (src/query/planner.cc:21-46): match-all KNN and low-selectivity
   * hybrid queries take the graph ("inline filter" branch: beam search,
   * post-filter, ef inflated by 1/selectivity); high-selectivity
   * filters keep the pre-filter exact path (FLAT always pre-filters).
   */
  def registerAnn(indexName: String, field: String,
                  ann: graft.pipeline.Nsw.NswIndex): this.type = {
    annIndexes((indexName, field)) = ann
    derivedEpochs(("ann", indexName, field)) = epochOf(indexName)
    this
  }

  /** Pre-filter iff qualified ≤ ratio × N (planner.cc default 0.001;
    * exact path also used when no ANN graph is attached). */
  var prefilterThresholdRatio: Double = 0.001

  /** Execution cap on MATERIALIZED non-vector matches (reference
    * `max-nonvector-search-results-fetched`, default 100K —
    * valkey_search_options.cc:489-498, enforced search.cc:623-668):
    * [[searchReply]] accumulates at most this many matched rows before
    * result shaping; a truncated reply bumps
    * [[Metrics.nonVectorFetchLimited]] and `total` reflects the
    * truncated set, like the reference's appender stopping at the cap.
    * OOM guardrail for match-all / low-selectivity fetches; LIMIT
    * pages past the cap need it raised (same caveat as the
    * reference's config doc).
    *
    * Stored as the configured uint32 (`...Raw`) so CONFIG GET
    * round-trips the full reference range; the engine consumes it
    * through the Int accessor, where values past Int.MaxValue are
    * operationally "unbounded" exactly like the reference's
    * UINT32_MAX default-max (pages go through an Int-typed
    * `limit()`). */
  var maxNonVectorResultsFetchedRaw: Long = 100000L
  def maxNonVectorResultsFetched: Int =
    // MaxValue − 1, not MaxValue: truncation detection materializes
    // cap + 1 rows (`limit(cap + 1)`), which must not overflow Int
    math.min(maxNonVectorResultsFetchedRaw, (Int.MaxValue - 1).toLong).toInt
  def maxNonVectorResultsFetched_=(n: Int): Unit =
    maxNonVectorResultsFetchedRaw = n.toLong

  /** Per-record reply content limits (reference
    * `search.max-search-result-record-size` default 5 MB and
    * `search.max-search-result-fields-count` default 1000,
    * query/response_generator.cc:42-58): a reply record whose fetched
    * content exceeds either limit is dropped from the PAGE (the match
    * total is unaffected, like the reference's
    * ProcessNeighborsForReply erase), bumping
    * [[Metrics.queryResultRecordDropped]]. Content = the returned
    * non-NULL attributes; the key and the KNN score pseudo-field ride
    * the Neighbor, not its content map, so they never count. */
  var maxSearchResultRecordSize: Long = 5L * 1024 * 1024
  var maxSearchResultFieldsCount: Int = 1000

  /** FT.CREATE registry cap (reference `--max-indexes`, default 1000,
    * schema_manager.cc:50-62) — enforced at the command surface. */
  var maxIndexes: Int = 1000

  /** `fuzzy-max-distance` (reference filter_parser.cc:59-74: default 3,
    * range 1..50, runtime-settable) — caps the %%-nesting a query may
    * request; flows into every FilterParser.parse this engine runs.
    * CONFIG SET search.fuzzy-max-distance reaches it at runtime. */
  var fuzzyMaxDistance: Int = graft.query.FilterParser.DefaultFuzzyMaxDistance

  /** Default query timeout (reference search.h:49 kTimeoutMS = 50 s; a
    * compile-time constant there, CONFIG-settable here as
    * search.timeout-ms, capped at kMaxTimeoutMs like per-query
    * TIMEOUT). [[executeWithTimeout]] reads it when the caller passes
    * no explicit budget. */
  var defaultTimeoutMs: Long = 50000

  /** `search.emulate-release` (reference valkey_search_options.h:
    * 161-197, COMPATIBILITY.md "Compatibility Defects"): pins the
    * engine to the behavior of an older release — every
    * compatibility-bug fix shipped after the pinned version runs its
    * LEGACY branch and bumps a `compatibility-<label>` INFO counter.
    * Gated sites here: the 1.2.1 expression fixes (value.cc — string
    * truthiness, NaN-on-unparsable, upper/lower non-string, the
    * date-function negative-ts guard, timefmt empty format, parsetime
    * format mismatch, month's mday rollback) and the 1.3.0
    * invalid-data whole-key drop (index_schema.cc:713-727).
    *
    * Default: [[graft.model.ValkeyVersion.Module]] (fully-fixed
    * semantics). The reference defaults to major.0.0 — legacy — but
    * this engine's differential goldens are the REDISEARCH answers
    * (integration/compatibility answers pickles), which pin the
    * fixed semantics, so fixed is this engine's compatible default.
    * Like the reference, the knob applies to work done AFTER the SET:
    * expressions consult it at compile time, enrichment at
    * FT.CREATE/maintenance-batch time — already-indexed keys are not
    * retroactively re-judged. */
  var emulateRelease: ValkeyVersion = ValkeyVersion.Module

  /** True iff the fix shipped in `major.minor.patch` is active under
    * the current [[emulateRelease]] (reference EnabledInVersion). */
  def emulationEnabled(major: Int, minor: Int, patch: Int): Boolean =
    emulateRelease >= ValkeyVersion(major, minor, patch)

  /** Posting fetch is only taken when the fetched key slice is ≤ this
    * fraction of the corpus — the reference planner's cardinality rule
    * (its query planner fetches the SMALLEST child and scans when
    * estimates are large, src/query/search.cc min-child selection): at
    * scale, joining back a half-corpus key set costs more than the
    * scan the columnar predicate already pays. */
  var postingRouteMaxSelectivity: Double = 0.25

  /** Resident-cache layout grain for [[graft.util.Parallelism.ensureBytes]]:
    * one cache partition per this many ESTIMATED bytes (capped at the
    * default parallelism). Chosen by isolated pairs at sf0.1 (r17):
    * cheap term lookups back at their pre-widen latency, proximity
    * gates within 1.2× of the all-cores layout. */
  val ResidentBytesPerPartition: Long = 256L << 10

  /** FT.CREATE analogue: register an enriched document DataFrame.
    * `resident = true` persists the enriched table (derived tag/token/
    * vector columns included) — the batch counterpart of the
    * reference's always-in-memory index; text queries then skip
    * re-tokenization. At 100 TB the same effect comes from writing the
    * enriched table back to Parquet at ingest ([[saveIndex]]). */
  def createIndex(schema: IndexSchema, docs: DataFrame,
                  resident: Boolean = false): this.type = {
    // Whole-key invalid-data drop (reference index_schema.cc
    // SyncProcessMutation → RemoveKeyFromAllIndexes; see
    // Documents.InvalidCol): the SERVING relation excludes marked docs
    // — queries, postings, ANN builds and counts never see them — while
    // FT.INFO keeps the unfiltered view so hash_indexing_failures still
    // counts the skipped keys.
    val serving =
      if (docs.columns.contains(graft.sources.Documents.InvalidCol))
        docs.filter(!coalesce(col(graft.sources.Documents.InvalidCol), lit(false)))
      else docs
    val stored =
      // resident caches pin their partition layout for every later
      // query — lay out a byte-small (often single-partition)
      // enrichment once at registration so per-row-heavy predicates
      // (proximity/SLOP) run multi-core off the cache. SIZE-DERIVED
      // target, not defaultParallelism (r16 regression: the
      // straight-to-cores layout launched cores× tasks for every
      // sub-100 ms point lookup, costing ~30-60 ms/query on ~16 term
      // gates; ~256 KB of estimated bytes per partition keeps the
      // proximity win — multi-core where there is real per-row work —
      // while point queries pay a handful of tasks). Scale-adaptive:
      // no-op when the source already carries ≥ cores partitions.
      if (resident) graft.util.Parallelism.ensureBytes(serving, ResidentBytesPerPartition)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else serving
    infoDocs(schema.name) = docs
    // ALL derived state describes the PREVIOUS registered relation —
    // a re-registration (maintainer docs refresh, FT.CREATE over an
    // existing name) must not leave queries routing through postings
    // built from the old corpus, FT.INFO serving the old vocabulary's
    // num_terms from surviving stats (r9 ADVICE), or KNN reading an
    // old graph. Every call site (loadIndex, Commands, Queries,
    // Maintainer.onBatch) registers derived state strictly AFTER
    // createIndex, so dropping here is safe; callers that keep a
    // still-valid posting simply re-register it.
    //
    // Drops come BEFORE the catalog swap: a concurrent reader then sees
    // (old docs, old derived) or (either docs, no derived — the
    // always-correct scan path), never (NEW docs, OLD postings) — a
    // mixed view whose posting semi-join would silently MISS documents
    // that only exist in the new corpus, and whose reply, computed
    // after the epoch bump, would be cached as fresh for the whole
    // epoch (a post-batch query serving a pre-batch answer, violating
    // the eviction contract).
    //
    // The INVERSE mix — a reader that captured the OLD docs just before
    // this swap building its plan after the maintainer re-registers
    // postings from the NEW corpus — is killed by the registration-
    // epoch gate, not by ordering: every derived relation records the
    // epoch it was registered at ([[derivedEpochs]]), and filterStage /
    // finishSearch only consult relations whose registration epoch
    // equals the epoch the request captured at entry (before its
    // catalog read). A mismatch degrades that conjunct to the columnar
    // scan (or exact KNN), which is correct against whichever docs the
    // reader holds.
    docCounts.remove(schema.name)
    infoStatsCache.remove(schema.name)
    annIndexes.filterInPlace { case ((idx, _), _) => idx != schema.name }
    postings.filterInPlace { case ((idx, _), _) => idx != schema.name }
    postingStats.filterInPlace { case ((idx, _), _) => idx != schema.name }
    suffixPostings.filterInPlace { case ((idx, _), _) => idx != schema.name }
    tokenStats.filterInPlace { case ((idx, _), _) => idx != schema.name }
    posPostings.filterInPlace { case ((idx, _), _) => idx != schema.name }
    posStats.filterInPlace { case ((idx, _), _) => idx != schema.name }
    layouts.filterInPlace { case ((idx, _), _) => idx != schema.name }
    derivedEpochs.filterInPlace { case ((_, idx, _), _) => idx != schema.name }
    keyLayouts.remove(schema.name)
    catalog.synchronized { catalog(schema.name) = (schema, stored) }
    // catalog swap, THEN the epoch bump (see bumpEpoch's ordering
    // contract with the reply-cache lookup path), THEN the cache drops
    bumpEpoch(schema.name)
    dropCachedReplies(schema.name)
    dropCachedBases(schema.name)
    this
  }

  def index(name: String): (IndexSchema, DataFrame) =
    catalog.synchronized { catalog.get(name) }
      .getOrElse(throw new IllegalArgumentException(s"no such index: $name"))

  /** FT.DROPINDEX analogue. Error if absent, like the reference. */
  def dropIndex(name: String): Unit = {
    if (catalog.synchronized { catalog.remove(name) }.isEmpty)
      throw new IllegalArgumentException(s"no such index: $name")
    bumpEpoch(name)
    dropCachedReplies(name)
    dropCachedBases(name)
    docCounts.remove(name)
    infoStatsCache.remove(name)
    infoDocs.remove(name)
    buildStates.remove(name)
    annIndexes.filterInPlace { case ((idx, _), _) => idx != name }
    postings.filterInPlace { case ((idx, _), _) => idx != name }
    postingStats.filterInPlace { case ((idx, _), _) => idx != name }
    suffixPostings.filterInPlace { case ((idx, _), _) => idx != name }
    tokenStats.filterInPlace { case ((idx, _), _) => idx != name }
    posPostings.filterInPlace { case ((idx, _), _) => idx != name }
    posStats.filterInPlace { case ((idx, _), _) => idx != name }
    layouts.filterInPlace { case ((idx, _), _) => idx != name }
    derivedEpochs.filterInPlace { case ((_, idx, _), _) => idx != name }
    keyLayouts.remove(name)
    ()
  }

  /** FT._LIST analogue. */
  def listIndexes: Seq[String] = catalog.synchronized { catalog.keys.toSeq }

  private val buildStates = scala.collection.concurrent.TrieMap.empty[String, SearchEngine.BuildState]

  /** Current build state (defaults to ready — batch-registered indexes
    * are fully built the moment createIndex returns). */
  def buildState(indexName: String): SearchEngine.BuildState =
    buildStates.getOrElse(indexName, SearchEngine.Ready)

  /** Report initial-fill progress (C3: the coordinator merges these
    * across nodes; here one engine = one scope). `scanned`/`total`
    * drive the percent; a later [[markReady]] (or a full scan) ends the
    * backfill. */
  def reportBackfill(indexName: String, scanned: Long, total: Long,
                     queued: Long = 0L): this.type = {
    val pct =
      if (total <= 0L) 0.0
      else math.min(100.0, scanned.toDouble / total * 100.0)
    buildStates(indexName) =
      if (pct >= 100.0) SearchEngine.Ready.copy(mutationQueueSize = queued)
      else SearchEngine.BuildState("backfill_in_progress", true, pct, queued)
    this
  }

  def markReady(indexName: String): this.type = {
    buildStates(indexName) = SearchEngine.Ready
    this
  }

  private val docCounts = scala.collection.concurrent.TrieMap.empty[String, Long]
  /** Memoized N for the planner's selectivity threshold. */
  private def docCount(name: String): Long =
    docCounts.getOrElseUpdate(name, index(name)._2.count())

  def schemaOf(name: String): IndexSchema = index(name)._1

  /**
   * FT.SEARCH: filter [+ KNN] + SORTBY/LIMIT/RETURN result shaping.
   * Result rows carry `__key`, the KNN score pseudo-column when present,
   * and either all source fields or the RETURN projection.
   */
  def search(indexName: String, query: String,
             opts: SearchOptions = SearchOptions()): DataFrame = {
    // epoch BEFORE the catalog read (bumpEpoch ordering contract)
    val ep = epochOf(indexName)
    val (schema, docs) = index(indexName)
    val parsed = FilterParser.parse(query, opts.params,
      fuzzyMaxDistance = fuzzyMaxDistance, analyzer = schema.analyzer)
    recordQueryClass(parsed)
    finishSearch(indexName, schema, filterStage(schema, docs, parsed, opts, ep),
      parsed, opts, ep)
  }

  /** Observability: query-class counters (reference metrics.h:29-44). */
  private def recordQueryClass(parsed: ParsedQuery): Unit = {
    if (parsed.knn.isDefined) {
      Metrics.queryVector.incrementAndGet()
      if (!parsed.isMatchAll) Metrics.queryHybrid.incrementAndGet()
    } else Metrics.queryNonVector.incrementAndGet()
    def hasText(p: Predicate): Boolean = p match {
      case _: TextPredicate => true
      case And(cs) => cs.exists(hasText)
      case Or(cs) => cs.exists(hasText)
      case Not(c) => hasText(c)
      case _ => false
    }
    if (hasText(parsed.filter)) Metrics.queryText.incrementAndGet()
    ()
  }

  /** Filter + proximity front half, shared by [[search]] and
    * [[searchReply]] (which caches its output so total and page read
    * one plan). `ep` is the registration epoch the caller captured
    * BEFORE its catalog read — the routing below only consults derived
    * relations registered at exactly that epoch (see [[createIndex]]'s
    * mixed-view notes; private[graft] for the interleaving specs). */
  private[graft] def filterStage(schema: IndexSchema, docs: DataFrame,
                                 parsed: ParsedQuery, opts: SearchOptions,
                                 ep: Long): DataFrame = {
    val analyzerCfg =
      if (opts.verbatim) schema.analyzer.copy(stem = false) else schema.analyzer
    val compiler = new PredicateCompiler(schema, analyzerCfg)
    var df = docs
    lastRouteEstimates = Nil
    // Key-prefix layout pruning (registerKeyPrefixLayout): AND the
    // PartitionFilter the index's PREFIX subscriptions imply — a
    // superset of the exact startsWith applied at bind, so semantics
    // are untouched; the effect is fewer files scanned, match-all
    // queries included.
    keyLayouts.get(schema.name).foreach { kl =>
      // an EMPTY prefix among the subscriptions matches every key
      // (''.startsWith contract) — the implied partition filter is then
      // the whole table, so no prune may apply at all: reducing over
      // only the non-empty prefixes would wrongly exclude keys that the
      // empty subscription admits
      if (!schema.subscribedPrefixes.contains(""))
        schema.subscribedPrefixes.filter(_.nonEmpty)
          .map(kl.pruneCond).reduceOption(_ || _)
          .foreach(c => df = df.filter(c))
    }
    if (!parsed.isMatchAll) {
      // Route posting-servable conjuncts through posting lookup +
      // semi-join; everything else compiles to the columnar predicate
      // as usual. A conjunct routes when it is a Term/TagMatch leaf
      // with a registered posting, or an OR tree whose EVERY leaf is
      // such (the reference's X3 concat-fetchers-plus-dedup,
      // src/query/search.cc:349-359,644-652 — here the fetcher union
      // is a posting-keys union and the dedup is the semi-join).
      // NOT trees keep the column path (complement needs the scan).
      val conjuncts = parsed.filter match {
        case And(cs) => cs
        case p => Seq(p)
      }
      // One consistent snapshot of each derived-state registry per plan
      // build (TrieMap snapshots are O(1)): a maintainer batch
      // re-registering concurrently (createIndex drops postings/stats,
      // onBatch re-adds them) must degrade a conjunct to the
      // always-correct scan path — it must never crash plan
      // construction between a routability check and the lookup it
      // guards (the SocketMaintainSpec reader race). Shadowing the
      // fields keeps every helper below on the snapshot.
      val postings = this.postings.readOnlySnapshot()
      val postingStats = this.postingStats.readOnlySnapshot()
      val suffixPostings = this.suffixPostings.readOnlySnapshot()
      val tokenStats = this.tokenStats.readOnlySnapshot()
      val posPostings = this.posPostings.readOnlySnapshot()
      val posStats = this.posStats.readOnlySnapshot()
      val derivedEpochs = this.derivedEpochs.readOnlySnapshot()
      // Registration-epoch gate (the createIndex inverse-mix contract):
      // a derived relation is consulted only when it was registered at
      // the epoch THIS request captured at entry — a reader holding the
      // pre-swap docs must not semi-join postings rebuilt from the new
      // corpus (it would drop keys its snapshot matches). Mismatch =
      // the conjunct keeps the always-correct columnar scan.
      def fresh(kind: String, f: String): Boolean =
        derivedEpochs.get((kind, schema.name, f)).contains(ep)
      def postingFields(field: Option[String]): Option[Seq[String]] = {
        // postings hold the STEM sets — only routable when the query
        // stems too (not VERBATIM) and no target field is NOSTEM
        // (those take the exact-original-token path in the compiler)
        def stemMatched(f: String) = schema.fieldOrFail(f).ftype match {
          case tf: TextField => analyzerCfg.stem && !tf.noStem
          case _ => false
        }
        field match {
          case Some(f) =>
            if (postings.contains((schema.name, f)) && fresh("posting", f) &&
                stemMatched(f)) Some(Seq(f))
            else None
          case None =>
            // unfielded term = OR over ALL text fields: routable only when
            // every text field has a posting (keys = union of lookups)
            val tfs = schema.textFields.map(_.alias)
            if (tfs.nonEmpty && tfs.forall(f =>
                postings.contains((schema.name, f)) && fresh("posting", f) &&
                stemMatched(f)))
              Some(tfs)
            else None
        }
      }
      def termKeys(f: Option[String], w: String): DataFrame = {
        val stemmed = Analyzer.stemToken(Analyzer.caseFold(w, analyzerCfg), analyzerCfg)
        postingFields(f).get
          .map(fa => postings((schema.name, fa))
            .filter(col("term") === stemmed)
            .select(col("__key").as(schema.keyColumn)))
          .reduce(_ unionByName _)
      }
      def tagKeys(f: String, patterns: Seq[TagPattern]): DataFrame = {
        val cs = schema.fieldOrFail(f).ftype match {
          case TagField(_, c) => c
          case _ => false
        }
        def norm(s: String) = if (cs) s else Analyzer.asciiLower(s)
        // OR of equality / prefix conditions — each pushable, so the
        // term-sorted posting scan reads only the matching slices.
        val cond = patterns.map { p =>
          val v = norm(p.value.trim)
          if (p.isPrefix) col("term").startsWith(v) else col("term") === v
        }.reduce(_ || _)
        // no distinct(): left_semi tolerates duplicate keys, and the
        // dedup shuffle would cost more than it saves
        postings((schema.name, f)).filter(cond)
          .select(col("__key").as(schema.keyColumn))
      }
      // Suffix-posting routing (WITHSUFFIXTRIE, reference suffix.h):
      // fielded or unfielded pattern predicates retrieve from the
      // suffix posting when every target field has one registered.
      // Unfielded targets are the TRIE-BACKED text fields only — the
      // set the compiler searches (filter_parser.cc:798-806 restricts
      // the field mask the same way).
      def allHavePostings(tfs: Seq[String]): Option[Seq[String]] =
        if (tfs.nonEmpty &&
            tfs.forall(f => suffixPostings.contains((schema.name, f)) &&
              fresh("suffix", f)))
          Some(tfs)
        else None
      def suffixFields(field: Option[String]): Option[Seq[String]] = field match {
        case Some(f) => allHavePostings(Seq(f))
        case None => allHavePostings(schema.textFields.filter(_.ftype match {
          case tf: TextField => tf.withSuffixTrie
          case _ => false
        }).map(_.alias))
      }
      // Prefix does NOT require the trie (filter_parser.cc:757 passes
      // with_suffix=false): its compile targets are ALL text fields, so
      // an unfielded prefix routes only when every text field has a
      // suffix posting — otherwise the fetch would miss matches in
      // posting-less fields.
      def prefixFields(field: Option[String]): Option[Seq[String]] = field match {
        case Some(f) => allHavePostings(Seq(f))
        case None => allHavePostings(schema.textFields.map(_.alias))
      }
      def suffixKeys(fields: Seq[String])(cond: Column): DataFrame =
        fields
          .map(fa => suffixPostings((schema.name, fa)).filter(cond)
            .select(col("__key").as(schema.keyColumn)))
          .reduce(_ unionByName _)
      // Positional route (WITHOFFSETS postings — the reference keeps
      // word positions inside each posting, text_index.h:57-88, and its
      // phrase iterator walks them): a phrase's targets are ALL text
      // fields when unfielded, so routing requires a positional posting
      // on every target.
      def phraseFields(field: Option[String]): Option[Seq[String]] = {
        val tfs = field.map(Seq(_)).getOrElse(schema.textFields.map(_.alias))
        if (tfs.nonEmpty &&
            tfs.forall(f => posPostings.contains((schema.name, f)) &&
              fresh("pos", f)))
          Some(tfs)
        else None
      }
      /** Adjacency posting-side: each word's slice carries positions
        * normalized to the phrase anchor (`pos - wordIndex`), so a
        * match is keys sharing one anchor position across ALL words —
        * chained (__key, anchor) semi-joins. Slices join RAREST-first
        * (min-child inside the phrase, reference X2): the running set
        * starts at the smallest slice instead of dragging a common
        * word's occurrences through the chain. Every slice is a pushed
        * EqualTo on term-sorted parquet; no document text is read. The
        * columnar verify below owns final semantics. */
      def phraseKeys(fields: Seq[String], words: Seq[String]): DataFrame = {
        val folded = words.map(w => Analyzer.caseFold(w, analyzerCfg))
        fields.map { fa =>
          val pp = posPostings((schema.name, fa))
          // rarest-first ordering from the HOT stats only — ordering is
          // a best-effort optimization, never worth point-read jobs
          val order = posStats.get((schema.name, fa)).flatMap(_.hot) match {
            case Some(m) => folded.indices.sortBy(i => m.getOrElse(folded(i), 0L))
            case None => folded.indices
          }
          def slice(i: Int): DataFrame = pp.filter(col("term") === folded(i))
          val head = slice(order.head)
            .select(col("__key"), (col("pos") - order.head).as("__anchor"))
          order.tail.foldLeft(head) { case (acc, i) =>
            val nxt = slice(i)
              .select(col("__key").as("__key_r"), (col("pos") - i).as("__anchor_r"))
            acc.join(nxt,
              acc("__key") === nxt("__key_r") && acc("__anchor") === nxt("__anchor_r"),
              "left_semi")
          }.select(col("__key").as(schema.keyColumn))
        }.reduce(_ unionByName _)
      }
      /** Key relation for a posting-servable sub-tree, None if any leaf
        * needs the columnar scan. */
      def keysFor(p: Predicate): Option[DataFrame] = p match {
        case Term(f, w) if postingFields(f).isDefined &&
            !analyzerCfg.stopWords.contains(Analyzer.caseFold(w, analyzerCfg)) =>
          Some(termKeys(f, w))
        case TagMatch(f, patterns)
            // TAG postings (reference tag radix postings, tag.h:33-44):
            // a registered tag posting serves both exact and prefix
            // patterns — stored terms are already normalized.
            if postings.contains((schema.name, f)) && fresh("posting", f) &&
              schema.fieldOrFail(f).ftype.isInstanceOf[TagField] =>
          Some(tagKeys(f, patterns))
        // Pattern classes over the suffix posting — each a pushed
        // filter on the term-sorted parquet: prefix = StartsWith over
        // full-token rows; suffix s = EqualTo (a token ends with s ⟺
        // one of its suffixes IS s); infix i = StartsWith (a token
        // contains i ⟺ one of its suffixes starts with i).
        case Prefix(f, p) if prefixFields(f).isDefined =>
          val v = Analyzer.caseFold(p, analyzerCfg)
          Some(suffixKeys(prefixFields(f).get)(
            col("term").startsWith(v) && col("full")))
        case Suffix(f, sfx) if suffixFields(f).isDefined =>
          Some(suffixKeys(suffixFields(f).get)(
            col("term") === Analyzer.caseFold(sfx, analyzerCfg)))
        case Infix(f, in) if suffixFields(f).isDefined =>
          Some(suffixKeys(suffixFields(f).get)(col("term").startsWith(
            Analyzer.caseFold(in, analyzerCfg))))
        // Phrase, positional route: every word's occurrence slice
        // exists in the positional posting (terms are the post-stop-word
        // token stream), so adjacency resolves entirely posting-side —
        // including correctly-empty results for phrases containing stop
        // words or out-of-vocabulary words (their slices are empty).
        case Phrase(f, words) if phraseFields(f).isDefined =>
          Some(phraseKeys(phraseFields(f).get, words))
        // Phrase, stem-posting fallback: a doc holding original word w
        // necessarily has stemToken(w) in its stem set, so the term
        // posting of any phrase word is a SUPERSET fetch for the phrase
        // — fetch on the RAREST word (min-child, reference X2) and let
        // the columnar phrase predicate verify adjacency. Stop words
        // never reach the stem posting (analyzer drops them), so they
        // can't drive the fetch; an all-stop-word phrase keeps the scan.
        case Phrase(f, words) if postingFields(f).isDefined =>
          val cand = words.map(w => Analyzer.caseFold(w, analyzerCfg))
            .filterNot(analyzerCfg.stopWords.contains)
          if (cand.isEmpty) None
          else {
            val best = cand.minBy(w =>
              statEstimate(Term(f, w)).getOrElse(Long.MaxValue))
            Some(termKeys(f, best))
          }
        case Or(cs) =>
          val ks = cs.map(keysFor)
          if (ks.nonEmpty && ks.forall(_.isDefined))
            Some(ks.map(_.get).reduce(_ unionByName _))
          else None
        case _ => None
      }
      // Cardinality guard (reference planner behavior): a fetcher only
      // wins when its posting slice is selective. Like the reference,
      // the estimate reads O(1) metadata — the registered per-term
      // frequencies (its radix nodes carry posting sizes): the driver
      // hot map (zero jobs, the normal case) or one pushed point-read
      // of the tiny persisted stats relation (vocabularies past the
      // hot cap — see [[PostingStats]]). An OR's cardinality is the
      // SUM of its branches: a cheap upper bound that can only
      // over-reject into the always-correct scan path, never
      // under-reject into a bad join. A posting with NO stats at all
      // does not route — the guard NEVER prices a conjunct by counting
      // its posting slice (the round-4 finding: at 100-TB vocabularies
      // a count job per conjunct serializes plan construction).
      /** Pattern cardinality: sum of matching distinct-token counts. */
      def patternEstimate(fields: Seq[String], v: String,
                          m: (String, String) => Boolean,
                          dataPred: Column): Option[Long] = {
        val per = fields.map(fa => tokenStats.get((schema.name, fa))
          .flatMap(_.matchSum(t => m(t, v), dataPred)))
        if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
      }
      def statEstimate(p: Predicate): Option[Long] = p match {
        case Term(f, w) =>
          val stemmed = Analyzer.stemToken(Analyzer.caseFold(w, analyzerCfg), analyzerCfg)
          val fields = postingFields(f).get
          val perField = fields.map(fa => postingStats.get((schema.name, fa))
            .flatMap(_.lookup(stemmed)))
          if (perField.forall(_.isDefined)) Some(perField.flatten.sum) else None
        case TagMatch(f, patterns) =>
          postingStats.get((schema.name, f)).flatMap { stats =>
            val cs = schema.fieldOrFail(f).ftype match {
              case TagField(_, c) => c
              case _ => false
            }
            def norm(s: String) = if (cs) s else Analyzer.asciiLower(s)
            val per = patterns.map { p =>
              val v = norm(p.value.trim)
              if (p.isPrefix)
                stats.matchSum(_.startsWith(v), col("term").startsWith(v))
              else stats.lookup(v)
            }
            if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
          }
        case Prefix(f, p) =>
          val v = Analyzer.caseFold(p, analyzerCfg)
          patternEstimate(prefixFields(f).get, v,
            (tok, v) => tok.startsWith(v), col("term").startsWith(v))
        case Suffix(f, sfx) =>
          val v = Analyzer.caseFold(sfx, analyzerCfg)
          patternEstimate(suffixFields(f).get, v,
            (tok, v) => tok.endsWith(v), col("term").endsWith(v))
        case Infix(f, in) =>
          val v = Analyzer.caseFold(in, analyzerCfg)
          patternEstimate(suffixFields(f).get, v,
            (tok, v) => tok.contains(v), col("term").contains(v))
        case Phrase(f, words) if phraseFields(f).isDefined =>
          // positional route: the adjacency chain's output ⊆ every
          // word's occurrence slice — min occurrence count bounds it
          val fields = phraseFields(f).get
          val per = words.map(w => Analyzer.caseFold(w, analyzerCfg)).map { w =>
            val counts = fields.map(fa =>
              posStats.get((schema.name, fa)).flatMap(_.lookup(w)))
            if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
          }
          if (per.nonEmpty && per.forall(_.isDefined)) Some(per.flatten.min)
          else None
        case Phrase(f, words) =>
          // the fetch is the rarest word's stem slice: its estimate IS
          // the fetched-relation size (an upper bound on phrase hits)
          val es = words.map(w => Analyzer.caseFold(w, analyzerCfg))
            .filterNot(analyzerCfg.stopWords.contains)
            .map(w => statEstimate(Term(f, w)))
          if (es.nonEmpty && es.forall(_.isDefined)) Some(es.flatten.min)
          else None
        case Or(cs) =>
          val es = cs.map(statEstimate)
          if (es.forall(_.isDefined)) Some(es.flatten.sum) else None
        case _ => None
      }
      val maxKeys = math.max(1L,
        (postingRouteMaxSelectivity * docCount(schema.name)).toLong)
      // Min-child ordering (reference X2: the AND picks its SMALLEST
      // fetcher to drive retrieval, search.cc EvaluateFilterAsPrimary):
      // routed conjuncts semi-join in ascending estimated cardinality,
      // so the tightest slice prunes the probe side before the wider
      // ones run. A conjunct whose estimate is unavailable (no stats
      // in either tier) stays on the scan path.
      val routed = conjuncts
        .flatMap(c => for { keys <- keysFor(c); est <- statEstimate(c) }
          yield (keys, est))
        .filter(_._2 <= maxKeys)
        .sortBy(_._2)
      lastRouteEstimates = routed.map(_._2)
      routed.foreach { case (keys, _) =>
        df = df.join(keys, Seq(schema.keyColumn), "left_semi")
      }
      // Fetch-then-verify (reference search.cc: every retrieved doc is
      // re-evaluated against the FULL predicate tree): the posting
      // semi-joins prune what gets scanned, the compiled predicate owns
      // the semantics — which also keeps results exact when the key
      // column is not unique (two rows sharing a key must not admit
      // each other through the other's postings).
      df = df.filter(compiler.compile(parsed.filter))
      // Layout pruning (registerLayout): AND the PartitionFilter each
      // NUMERIC range implies on its declared bucket column — a
      // superset by construction, so semantics stay with the compiled
      // predicate above; the only effect is fewer files scanned.
      layoutPrune(schema, parsed.filter).foreach(c => df = df.filter(c))
    }
    (opts.slop, parsed.filter) match {
      case (Some(s), f) => df = applyProximity(df, schema, f, s, opts.inorder, analyzerCfg)
      case (None, f) if opts.inorder => df = applyProximity(df, schema, f, Int.MaxValue, inorder = true, analyzerCfg)
      case _ =>
    }
    df
  }

  /** The PartitionFilter a predicate tree implies under the
    * registered [[NumericBucketLayout]] hints, if any: range leaves
    * map to bucket bounds (`lo ≤ f` implies `floor(lo/step) ≤ __nb` —
    * exclusive bounds imply the same floor, a sound superset); AND
    * combines any available child prunes; OR prunes only when EVERY
    * branch does (else a branch could match outside the pruned set);
    * NOT and non-numeric leaves never prune. */
  private def layoutPrune(schema: IndexSchema, p: Predicate): Option[Column] = p match {
    case NumericRange(field, min, _, max, _) =>
      layouts.get((schema.name, field)).flatMap { l =>
        val lo =
          if (min.isNegInfinity) None
          else Some(col(l.bucketCol) >= math.floor(min / l.step).toLong)
        val hi =
          if (max.isPosInfinity) None
          else Some(col(l.bucketCol) <= math.floor(max / l.step).toLong)
        Seq(lo, hi).flatten.reduceOption(_ && _)
      }
    case And(cs) => cs.flatMap(layoutPrune(schema, _)).reduceOption(_ && _)
    case Or(cs) =>
      val ps = cs.map(layoutPrune(schema, _))
      if (ps.nonEmpty && ps.forall(_.isDefined)) Some(ps.flatten.reduce(_ || _))
      else None
    case _ => None
  }

  /** KNN + SORTBY/LIMIT/RETURN back half over an already-filtered plan.
    * `ep` gates the ANN graph exactly like filterStage gates postings:
    * a graph re-registered from a newer corpus than the docs this
    * request captured returns neighbors whose keys/vectors disagree
    * with the snapshot — mismatch falls back to exact KNN. */
  private[graft] def finishSearch(indexName: String, schema: IndexSchema,
                                  filtered: DataFrame, parsed: ParsedQuery,
                                  opts: SearchOptions, ep: Long): DataFrame = {
    var df = filtered
    val keyCol = col(schema.keyColumn)
    var scoreName: Option[String] = None

    parsed.knn match {
      case Some(knn) =>
        val fd = schema.fieldOrFail(knn.field)
        val vf = fd.ftype match {
          case v: VectorField => v
          case _ => throw new IllegalArgumentException(s"${knn.field} is not VECTOR")
        }
        checkBlobSize(knn, vf)
        val name = knn.asName.getOrElse(schema.scoreField(knn.field))
        scoreName = Some(name)
        val normalized = vf.metric == DistanceMetric.Cosine && vf.normalizeAtIngest
        val qvec =
          if (normalized) normalizeQuery(knn.queryVector, vf.metric) else knn.queryVector
        // Cosine fields unit-normalized at ingest (vector_base.cc:113-133)
        // run the cheaper IP loop; raw cosine fields compute full cosine.
        val metric = if (normalized) "IP" else vf.metric.name

        // Hybrid planner (planner.cc:21-46): pre-filter (exact KNN over
        // qualified keys) iff qualified ≤ ratio × N; otherwise, when an
        // ANN graph is attached, beam-search + post-filter.
        //
        // Single-pass prologue: the filtered KEY SET materializes once
        // (select(key).persist + count) and feeds the planner probe,
        // the Bloom sizing, AND the Bloom build — where this used to be
        // three separate scans of the filtered plan (LIMIT-bounded
        // probe, count, bloomFilter). Keys-only keeps the cache tiny at
        // scale (no document columns); the cache is released the moment
        // the Bloom is built. In the prefilter regime (qualified ≤
        // threshold) the filter is selective, so the full count costs
        // what the old short-circuit probe did anyway.
        val ann = annIndexes.get((indexName, knn.field))
          .filter(_ => derivedEpochs.get(("ann", indexName, knn.field)).contains(ep))
        val qualifiedKeys: Option[(DataFrame, Long)] =
          if (ann.isDefined && !parsed.isMatchAll) {
            // cache-private for the same reason as knnReply's base: the
            // unpersist after the Bloom build must only ever reach THIS
            // request's materialization
            val keys = cachePrivate(df.select(keyCol))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            val cnt =
              try keys.count()
              catch { case t: Throwable =>
                keys.unpersist(blocking = false); throw t
              }
            Some((keys, cnt))
          } else None
        // Failure bracket: every exit of the planner block below
        // releases the qualified-key cache — including a throw from
        // the bloomFilter/count actions (task failure, cancellation),
        // which would otherwise strand a materialization that, unlike
        // reply bases, is NOT cap-bounded. unpersist is idempotent, so
        // the normal-path releases inside the block stay as-is.
        try {
        val useAnn = ann.isDefined && (parsed.isMatchAll || {
          val n = docCount(indexName)
          val threshold = math.max(1L, (prefilterThresholdRatio * n).toLong)
          qualifiedKeys.get._2 > threshold
        })
        def exactKnn(base: DataFrame): DataFrame = base
          .filter(col(fd.alias).isNotNull)
          .withColumn(name, vector_distance(col(fd.alias),
            lit(qvec).cast(org.apache.spark.sql.types.ArrayType(FloatType)), metric))
          .orderBy(col(name).asc, keyCol.asc)
          .limit(knn.k)

        (if (useAnn) Metrics.knnInline else Metrics.knnPrefilter)
          .incrementAndGet()
        Metrics.lastKnnBranchInline.set(useAnn)
        if (useAnn) {
          // Inline filter (X9, hnswlib BaseFilterFunctor): the beam
          // traverses the whole graph but only admits keys in a Bloom
          // filter of the qualified set. The Bloom is sized to the
          // QUALIFIED count, not the full table N (a full-N Bloom at
          // 1 B+ keys is GBs), and shipped via broadcast — serialized
          // once per executor, not per task closure. The join-back
          // against the filtered docs removes Bloom false positives
          // exactly.
          val keyFilter: Option[String => Boolean] =
            qualifiedKeys.map { case (keys, qualified) =>
              // reads the cached key set, not the filtered plan
              val bloom = keys.stat.bloomFilter(schema.keyColumn,
                math.max(qualified, 64L), 0.01)
              val bloomBc = df.sparkSession.sparkContext.broadcast(bloom)
              (k: String) => bloomBc.value.mightContain(k)
            }
          // bloomFilter is an action — the key cache has served its
          // three consumers and can go before the beam runs.
          qualifiedKeys.foreach(_._1.unpersist(blocking = false))
          val overFetch = if (parsed.isMatchAll) knn.k else knn.k * 2 // FP slack
          // Per-query EF_RUNTIME overrides the schema default
          // (reference COMMANDS.md:64-66, ft_search_parser.cc).
          val ef = math.max(knn.efRuntime.getOrElse(vf.efRuntime), overFetch)
          val hits = ann.get.searchFiltered(qvec, k = overFetch, ef, keyFilter)
            .withColumnRenamed("distance", name)
            .withColumnRenamed("__key", "__ann_key")
          // ≤ k rows after the top-k merge: eager localCheckpoint keeps
          // the completeness probe below AND the caller's downstream use
          // from re-running the beam search + join.
          val annResult = hits.join(df, hits("__ann_key") === keyCol)
            .drop("__ann_key")
            .orderBy(col(name).asc, keyCol.asc)
            .limit(knn.k)
            .localCheckpoint(true)
          // Completeness fallback: if fewer than k qualified neighbors
          // survived (tiny qualified set or ef too small), the exact
          // pre-filter path answers instead.
          df = if (parsed.isMatchAll || annResult.count() >= knn.k) annResult
               else exactKnn(df)
        } else {
          qualifiedKeys.foreach(_._1.unpersist(blocking = false))
          df = exactKnn(df)
        }
        } catch { case t: Throwable =>
          qualifiedKeys.foreach(_._1.unpersist(blocking = false))
          throw t
        }
      case None =>
    }

    // SORTBY: missing-value docs go last (reference search.cc SORTBY;
    // SURVEY §2.7 R2); key tiebreak keeps results deterministic.
    val sorted = opts.sortBy match {
      case Some((field, asc)) =>
        val c = col(schema.fieldOrFail(field).alias)
        df.orderBy(if (asc) c.asc_nulls_last else c.desc_nulls_last, keyCol.asc)
      case None if parsed.knn.isDefined =>
        df.orderBy(col(scoreName.get).asc, keyCol.asc) // R4 default ordering
      case None =>
        df.orderBy(keyCol.asc)
    }

    val (offset, count) = opts.limit
    val paged = (if (offset > 0) sorted.offset(offset) else sorted).limit(count)

    // WITHSORTKEYS: "#"-prefixed sort-key value per result
    // (ft_search.cc:120-132 GetSortKeyValue — empty when the field is
    // missing or no SORTBY was given).
    val sortKeyCols: Seq[Column] =
      if (!opts.withSortKeys) Nil
      else Seq((opts.sortBy match {
        case Some((field, _)) =>
          val (src, isNumeric) =
            if (scoreName.contains(field)) (col(field), true)
            else {
              val fd = schema.fieldOrFail(field)
              (col(fd.alias), fd.ftype == NumericField)
            }
          // a NUMERIC sort key renders like the hash stores it: "25",
          // not the Spark double's "25.0" (GetSortKeyValue returns the
          // raw hash string)
          val rendered =
            if (!isNumeric) src.cast("string")
            else {
              val d = src.cast("double")
              when(d === d.cast("long").cast("double"),
                d.cast("long").cast("string")).otherwise(src.cast("string"))
            }
          concat(lit("#"), coalesce(rendered, lit("")))
        case None => lit("#")
      }).as("__sortkey"))

    if (opts.noContent) paged.select(keyCol +: sortKeyCols: _*)
    else if (opts.returnFields.nonEmpty) {
      // RETURN accepts any document attribute, indexed or not
      // (ft_search_parser.cc ConstructReturnParser: unknown aliases fall
      // through as raw identifiers fetched from the doc; absent → NULL)
      val cols = (keyCol +: sortKeyCols) ++ opts.returnFields.map { case (f, as) =>
        val src =
          if (scoreName.contains(f)) col(f)
          else schema.field(f) match {
            case Some(fd) => col(fd.alias)
            case None if paged.columns.contains(f) => col(f)
            case None => lit(null).cast("string")
          }
        src.as(as.getOrElse(f))
      }
      paged.select(cols: _*)
    } else if (sortKeyCols.nonEmpty) {
      val rest = paged.columns.filterNot(_ == schema.keyColumn).map(col)
      paged.select((keyCol +: sortKeyCols) ++ rest: _*)
    } else paged
  }

  /**
   * FT.AGGREGATE: the FT.SEARCH key-selection front-end followed by the
   * stage pipeline (reference: ft_aggregate.cc:272-363; SURVEY §2.4).
   *
   * @param stageTokens the command tokens after `FT.AGGREGATE idx query`
   *                    (LOAD/APPLY/FILTER/GROUPBY/SORTBY/LIMIT...), or
   *                    use [[aggregateStages]] with a pre-built pipeline.
   */
  def aggregate(indexName: String, query: String, stageTokens: Seq[String],
                opts: SearchOptions = SearchOptions()): DataFrame =
    aggregateStages(indexName, query, graft.query.AggregateParser.parse(stageTokens), opts)

  def aggregateStages(indexName: String, query: String,
                      stages: Seq[graft.query.AggStage],
                      opts: SearchOptions = SearchOptions()): DataFrame = {
    val ep = epochOf(indexName) // BEFORE the catalog read (cache contract)
    val (schema, docs) = index(indexName)
    val parsed = FilterParser.parse(query, opts.params,
      fuzzyMaxDistance = fuzzyMaxDistance, analyzer = schema.analyzer)
    // Same front half as FT.SEARCH — incl. posting routing + proximity.
    // A FULL filtered base cached by searchReply whose cap did NOT bind
    // (n ≤ cap ⟹ the limit(cap+1) materialized the COMPLETE filtered
    // set) is this front half already materialized — the
    // search-then-aggregate-the-same-filter serving pattern skips the
    // corpus scan. A truncated base is never valid here: aggregates are
    // not subject to the search fetch cap.
    var df = {
      val cached =
        if (baseCacheEnabled && parsed.knn.isEmpty) {
          val cap = maxNonVectorResultsFetched
          // LOCAL bases only: the returned DataFrame escapes the engine
          // (the caller collects whenever it likes), so a refcounted
          // persisted base cannot be handed out here — a LocalRelation
          // is immutable and safe forever
          baseCache.get(baseKey(indexName, ep, query, opts, cap, "full"))
            .filter(cb => cb.local && cb.n <= cap)
        } else None
      cached match {
        case Some(cb) =>
          cb.lastUsed.set(replyTick.incrementAndGet())
          baseCacheHits.incrementAndGet()
          cb.df
        case None =>
          // count the miss too, so hits/misses describe one coherent
          // lookup population across search AND aggregate traffic
          if (baseCacheEnabled && parsed.knn.isEmpty)
            baseCacheMisses.incrementAndGet()
          // NOT widened (Parallelism.ensure) on purpose: double
          // reducers (AVG/SUM/STDDEV) are summation-order-sensitive,
          // and re-partitioning the pipeline input changes which rows
          // each partial aggregate sees — measured flipping a
          // round(avg, 4) at the rounding boundary at sf0.01. The
          // reducer results must stay bit-stable under the engine's
          // declared plan, so the aggregate keeps the scan's layout.
          filterStage(schema, docs, parsed, opts, ep)
      }
    }

    // Vector/hybrid front-end: working set = top-k neighbors sorted by
    // distance, score as a loadable pseudo-field (ft.aggregate.md:3-5).
    var scoreField: Option[String] = None
    parsed.knn.foreach { knn =>
      val fd = schema.fieldOrFail(knn.field)
      val vf = fd.ftype match {
        case v: VectorField => v
        case _ => throw new IllegalArgumentException(s"${knn.field} is not VECTOR")
      }
      checkBlobSize(knn, vf)
      val name = knn.asName.getOrElse(schema.scoreField(knn.field))
      scoreField = Some(name)
      val normalized = vf.metric == DistanceMetric.Cosine && vf.normalizeAtIngest
      val qvec = if (normalized) normalizeQuery(knn.queryVector, vf.metric) else knn.queryVector
      val metric = if (normalized) "IP" else vf.metric.name
      df = df
        .filter(col(fd.alias).isNotNull)
        .withColumn(name, vector_distance(col(fd.alias),
          lit(qvec).cast(org.apache.spark.sql.types.ArrayType(FloatType)), metric))
        .orderBy(col(name).asc, col(schema.keyColumn).asc)
        .limit(knn.k)
    }

    val stringParams = opts.params.collect { case (k, StringParam(v)) => k -> v }
    new AggregatePipeline(schema, stringParams, emulateRelease)
      .run(df, scoreField, stages)
  }

  /**
   * Full FT.SEARCH reply shape (reference S7/R6, ft_search.cc:40-180):
   * `total` counts ALL matches regardless of LIMIT; `rows` is the
   * requested page. One filtered plan feeds both (computed once here
   * rather than per-caller).
   */
  def searchReply(indexName: String, query: String,
                  opts: SearchOptions = SearchOptions()): SearchEngine.SearchReply =
    Metrics.timed {
      // epoch BEFORE the catalog read (bumpEpoch ordering contract)
      val ep = epochOf(indexName)
      val (schema, docs) = index(indexName)
      val parsed = FilterParser.parse(query, opts.params,
      fuzzyMaxDistance = fuzzyMaxDistance, analyzer = schema.analyzer)
      recordQueryClass(parsed)
      val cacheable = replyCacheEnabled && parsed.knn.isEmpty
      val key = if (cacheable) replyKey(indexName, ep, query, opts) else ""
      val hit = if (cacheable) replyCache.get(key) else None
      hit match {
        case Some(e) =>
          e.lastUsed.set(replyTick.incrementAndGet())
          replyCacheHits.incrementAndGet()
          // replay the per-call metric effects so counters stay
          // call-accurate (EngineAdminSpec / ResponseGeneratorParitySpec
          // semantics: every capped/dropping call counts)
          if (e.limited) Metrics.nonVectorFetchLimited.incrementAndGet()
          if (e.dropped > 0) Metrics.queryResultRecordDropped.addAndGet(e.dropped)
          e.reply
        case None =>
          replyCacheMisses.incrementAndGet()
          val (reply, limited, dropped) =
            if (parsed.knn.isEmpty)
              Metrics.nonVectorLatency.timed(
                nonVectorReply(indexName, ep, schema, docs, parsed, query, opts))
            else {
              // per-class reply-latency histograms (reference
              // hnsw/flat_vector_index_search_latency, metrics.h:74-78):
              // the planner branch finishSearch takes attributes the
              // sample via the thread-confined marker
              val t0 = System.nanoTime()
              val r = knnReply(indexName, ep, schema, docs, parsed, opts)
              (if (Metrics.lastKnnBranchInline.get()) Metrics.hnswSearchLatency
               else Metrics.flatSearchLatency)
                .observeNanos(System.nanoTime() - t0)
              r
            }
          if (cacheable && reply.rows.length <= replyCacheMaxRows) {
            replyCache.put(key, SearchEngine.CachedReply(indexName, ep, reply, limited,
              dropped, new java.util.concurrent.atomic.AtomicLong(
                replyTick.incrementAndGet())))
            // a re-registration that raced this compute bumped the
            // epoch: the entry is unreachable (keys carry the epoch),
            // remove it so it can't linger holding rows
            if (epochOf(indexName) != ep) replyCache.remove(key)
            evictLruReplies()
          }
          reply
      }
    }

  /** Non-vector total+page compute behind the reply cache. Serves from
    * the filtered-base cache when the base-affecting request subset
    * matches (page/SORTBY/RETURN/NOCONTENT variants of a seen filter);
    * otherwise materializes the base once — via a SINGLE collect of the
    * narrow key/sort projection for NOCONTENT requests (the reference's
    * single-pass total+page, search.cc:780-814, needs no second job
    * when no content is fetched), or a persisted cap+1-row relation
    * whose count fills the cache and whose page reads it (one scan of
    * the source; the +1 detects truncation — the reference's fetch cap,
    * search.cc:623). Either base then populates the base cache for the
    * next variant of the same filter. */
  private def nonVectorReply(indexName: String, ep: Long, schema: IndexSchema,
                             docs: DataFrame, parsed: ParsedQuery, query: String,
                             opts: SearchOptions): (SearchEngine.SearchReply, Boolean, Long) = {
    val cap = maxNonVectorResultsFetched
    def finishFrom(base: DataFrame, n: Long): (SearchEngine.SearchReply, Boolean, Long) = {
      val limited = n > cap
      if (limited) Metrics.nonVectorFetchLimited.incrementAndGet()
      val total = math.min(n, cap.toLong)
      // the page draws from the SAME truncated set the total counted
      val page = finishSearch(indexName, schema, base.limit(cap), parsed, opts, ep)
      val collected = page.collect()
      // Temporary anomaly forensics (r13 soak finding: page collected
      // empty while the total counted; retry healed). Enabled only by
      // the soak/probes — pinpoints WHICH read went empty.
      if (SearchEngine.debugEmptyPage && collected.isEmpty && n > 0 &&
          opts.limit._1 == 0 && opts.limit._2 > 0) {
        val n2 = base.count()
        val again = page.collect().length
        val fresh = filterStage(schema, docs, parsed, opts, ep).count()
        val plan = page.queryExecution.executedPlan.toString
        throw new IllegalStateException(
          s"EMPTYPAGE n=$n recount=$n2 recollect=$again " +
          s"lvl=${base.storageLevel} freshCount=$fresh epNow=${epochOf(indexName)} ep=$ep " +
          s"PLAN<<<${plan.take(3000)}>>>")
      }
      val (rows, dropped) =
        applyContentLimits(collected, page.schema, schema, parsed, opts)
      if (dropped > 0) Metrics.queryResultRecordDropped.addAndGet(dropped)
      (SearchEngine.SearchReply(total, rows), limited, dropped)
    }
    // NOCONTENT replies read only the key and the SORTBY source column
    val narrowProjection: Option[Seq[String]] =
      if (!opts.noContent) None
      else Some((schema.keyColumn +: opts.sortBy.map { case (f, _) =>
        schema.fieldOrFail(f).alias }.toSeq).distinct)
    val fullKey = baseKey(indexName, ep, query, opts, cap, "full")
    // a NOCONTENT request may serve from a full base (superset
    // projection) but prefers its own narrow one; a content request
    // must never see a keys-only base — the projection is in the key
    val lookupKeys = narrowProjection match {
      case Some(cols) =>
        Seq(baseKey(indexName, ep, query, opts, cap, "nc:" + cols.mkString(",")), fullKey)
      case None => Seq(fullKey)
    }
    val hit =
      if (baseCacheEnabled)
        lookupKeys.view.flatMap(baseCache.get).find(_.acquire())
      else None
    hit match {
      case Some(cb) =>
        try {
          cb.lastUsed.set(replyTick.incrementAndGet())
          baseCacheHits.incrementAndGet()
          finishFrom(cb.df, cb.n)
        } finally cb.release()
      case None =>
        if (baseCacheEnabled) baseCacheMisses.incrementAndGet()
        narrowProjection match {
          case Some(cols) =>
            lastBaseProjection = cols
            val narrow = filterStage(schema, docs, parsed, opts, ep)
              .select(cols.map(col): _*).limit(cap + 1)
            val collected = narrow.collect()
            // the page re-runs finishSearch over a LocalRelation of the
            // collected rows, keeping sort/offset/sortkey semantics on
            // the one code path at LocalTableScan cost
            val local = docs.sparkSession.createDataFrame(
              java.util.Arrays.asList(collected: _*), narrow.schema)
            if (baseCacheEnabled)
              putCachedBase(lookupKeys.head, SearchEngine.CachedBase(indexName, ep,
                local, collected.length.toLong,
                new java.util.concurrent.atomic.AtomicLong(replyTick.incrementAndGet())))
            finishFrom(local, collected.length.toLong)
          case None =>
            // ONE cache-PRIVATE persisted materialization serves total
            // and page — the nonce keeps every other request's plans on
            // separate CacheManager entries, so the ONLY unpersist that
            // can reach this relation is its own lifecycle (the r13
            // soak's AQE empty-propagation race is impossible by
            // construction). Bases within baseCacheMaxRows are then
            // collected off the cached relation into a driver-resident
            // LocalRelation (no lifecycle at all) and the transient
            // persist is dropped; bigger bases stay persisted and enter
            // the cache under the reader-refcounted CachedBase
            // lifecycle, so a paging client pays the corpus scan once
            // and page latency is flat in corpus size (ServeScaleProbe
            // contract). Failures (a SORTBY on an unknown field raises
            // in finishSearch) always unpersist.
            val bound = math.min(cap, baseCacheMaxRows)
            // The base materializes REPLY columns only: the key, the
            // source attributes, and the preserved raws (content
            // fallback). The enrichment projections (token arrays,
            // term sets, tag arrays) exist for FILTERING, which
            // filterStage already applied — carrying them through the
            // persist would re-tokenize and store every matched
            // document's text (measured 4.5× the raw scan floor at the
            // 100× corpus; ColdFloorProbe). Dropping them here lets
            // Catalyst prune the derivation out of the scan entirely.
            val replyCols = {
              val enriched = filterStage(schema, docs, parsed, opts, ep)
              val keep = enriched.columns.filter(c =>
                c == schema.keyColumn || !c.startsWith("__") ||
                  c.endsWith("__raw"))
              enriched.select(keep.map(col).toIndexedSeq: _*)
            }
            val solo = cachePrivate(replyCols)
              .limit(cap + 1)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              val n = solo.count()
              if (n <= bound) {
                val head = solo.collect() // cache-served, no second scan
                val local = docs.sparkSession.createDataFrame(
                  java.util.Arrays.asList(head: _*), solo.schema)
                solo.unpersist(blocking = false)
                if (baseCacheEnabled)
                  putCachedBase(fullKey, SearchEngine.CachedBase(indexName, ep,
                    local, n,
                    new java.util.concurrent.atomic.AtomicLong(replyTick.incrementAndGet())))
                finishFrom(local, n)
              } else {
                val out = finishFrom(solo, n)
                if (baseCacheEnabled)
                  putCachedBase(fullKey, SearchEngine.CachedBase(indexName, ep,
                    solo, n,
                    new java.util.concurrent.atomic.AtomicLong(replyTick.incrementAndGet()),
                    local = false))
                else solo.unpersist(blocking = false)
                out
              }
            } catch { case e: Throwable =>
              solo.unpersist(blocking = false); throw e
            }
        }
    }
  }

  /** Make a serving-path plan cache-PRIVATE: Spark's CacheManager
    * keys persisted data by normalized analyzed plan, so two requests
    * materializing the SAME logical plan share one entry — and either
    * side's unpersist (or a maintainer epoch drop of a plan-equal
    * cached entry) destroys the other's in-flight read. Under AQE the
    * destroyed read can materialize a shuffle stage as ZERO rows and
    * AQEPropagateEmptyRelation freezes the empty into the Dataset's
    * final plan (r13 InterleaveSoak forensics: total counted 8, page
    * collected 0, recollect 0, fresh plan 8). A vacuous filter on a
    * per-request literal keeps the analyzed plan distinct — same
    * semantics, same schema, folded away by the optimizer — so the
    * only actor that can unpersist a serving read's plan is the
    * request that owns it, strictly after its own reads. */
  private def cachePrivate(df: DataFrame): DataFrame = {
    val u = lit(java.util.UUID.randomUUID().toString)
    df.filter(u === u)
  }

  /** Vector/hybrid total+page compute (never cached — ANN registration
    * and the hybrid planner's mutable threshold are not in any key, and
    * planner counters bump per call). */
  private def knnReply(indexName: String, ep: Long, schema: IndexSchema, docs: DataFrame,
                       parsed: ParsedQuery, opts: SearchOptions): (SearchEngine.SearchReply, Boolean, Long) = {
    val k = parsed.knn.get
    // cache-private: concurrent identical KNN requests must not share
    // a CacheManager entry — this request's finally-unpersist would
    // otherwise destroy the other's in-flight page read (r13 soak race)
    val base = cachePrivate(filterStage(schema, docs, parsed, opts, ep))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // bounded probe: k+1 rows decide min(count, k) — never a full
      // count of the filtered cache
      val total = math.min(
        base.filter(col(schema.fieldOrFail(k.field).alias).isNotNull)
          .limit(k.k + 1).count(),
        k.k.toLong)
      val page = finishSearch(indexName, schema, base, parsed, opts, ep)
      val (rows, dropped) =
        applyContentLimits(page.collect(), page.schema, schema, parsed, opts)
      if (dropped > 0) Metrics.queryResultRecordDropped.addAndGet(dropped)
      (SearchEngine.SearchReply(total, rows), false, dropped)
    } finally { base.unpersist(blocking = false); () }
  }

  /** Reply-record content limits (reference ProcessNeighborsForReply,
    * query/response_generator.cc:385-442): a record whose fetched
    * content holds more than [[maxSearchResultFieldsCount]] attributes
    * or more than [[maxSearchResultRecordSize]] bytes (attribute name
    * + value, summed) is erased from the page; the caller counts the
    * returned drop count into [[Metrics.queryResultRecordDropped]] (and
    * the reply cache replays it per hit). Runs on the collected page
    * (≤ LIMIT rows — the reference likewise checks only the reply
    * vector, after trimming). NOCONTENT replies fetch no content, so
    * nothing can exceed. */
  private def applyContentLimits(rows: Array[org.apache.spark.sql.Row],
                                 pageSchema: org.apache.spark.sql.types.StructType,
                                 idxSchema: IndexSchema, parsed: ParsedQuery,
                                 opts: SearchOptions): (Array[org.apache.spark.sql.Row], Long) = {
    val scoreNames = parsed.knn
      .map(k => k.asName.getOrElse(idxSchema.scoreField(k.field))).toSet
    // content = returned attributes; the key, WITHSORTKEYS pseudo-field
    // and KNN distance ride the Neighbor itself in the reference reply
    val contentIdx = pageSchema.fieldNames.zipWithIndex.filterNot { case (n, _) =>
      n == idxSchema.keyColumn || n == "__sortkey" || scoreNames(n)
    }
    if (opts.noContent || contentIdx.isEmpty) (rows, 0L)
    else {
      var dropped = 0L
      val kept = rows.filter { r =>
        var fields = 0
        var size = 0L
        contentIdx.foreach { case (n, i) =>
          if (!r.isNullAt(i)) {
            fields += 1
            size += contentByteSize(n, r.get(i))
          }
        }
        val keep = fields <= maxSearchResultFieldsCount &&
          size <= maxSearchResultRecordSize
        if (!keep) dropped += 1
        keep
      }
      (kept, dropped)
    }
  }

  /** Reply byte accounting (response_generator.cc:421-425 sums
    * identifier + value sizes): strings count UTF-8 bytes; float/double
    * arrays count their raw-blob width (the reference stores vectors as
    * packed float32); anything else counts its string form. */
  private def contentByteSize(name: String, v: Any): Long = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val valueBytes: Long = v match {
      case s: String => s.getBytes(utf8).length.toLong
      case b: Array[Byte] => b.length.toLong // binary blob: raw width
      case a: scala.collection.Seq[_] => a.headOption match {
        case Some(_: Float) => 4L * a.length
        case Some(_: Double) => 8L * a.length
        case _ => String.valueOf(a).getBytes(utf8).length.toLong
      }
      case other => String.valueOf(other).getBytes(utf8).length.toLong
    }
    name.getBytes(utf8).length.toLong + valueBytes
  }

  /** Match-count half of the FT.SEARCH reply (total before LIMIT, R6). */
  def searchCount(indexName: String, query: String,
                  params: Map[String, ParamValue] = Map.empty): Long = {
    val (schema, docs) = index(indexName)
    val parsed = FilterParser.parse(query, params,
      fuzzyMaxDistance = fuzzyMaxDistance, analyzer = schema.analyzer)
    val compiler = new PredicateCompiler(schema, schema.analyzer)
    val base = if (parsed.isMatchAll) docs else docs.filter(compiler.compile(parsed.filter))
    parsed.knn match {
      case Some(k) => math.min(base.filter(col(schema.fieldOrFail(k.field).alias).isNotNull).count(), k.k.toLong)
      case None => base.count()
    }
  }

  /**
   * FT.INFO analogue (reference COMMANDS.md FT.INFO; cluster scopes ≈
   * SURVEY §2.8 C3): index metadata + document/field statistics as a
   * DataFrame — one row per field plus a summary row. The per-field
   * `num_tracked` mirrors the reference's untracked-key bookkeeping
   * (a NULL field value ≡ key untracked for that field).
   */
  /** num_terms: distinct terms across TEXT fields. The reference reads
    * a counter it maintains per mutation (index_schema.cc FT.INFO);
    * when every TEXT field carries registered posting stats the same
    * answer comes from their term universes in O(vocabulary) — the
    * stats relation IS the maintained counter store. Only a stats-less
    * index pays the exact distinct over the derived term sets. */
  private def computeNumTerms(schema: IndexSchema, docs: DataFrame): Long = {
    import org.apache.spark.sql.functions._
    if (schema.textFields.isEmpty) 0L
    else {
      val sts = schema.textFields.map(fd =>
        postingStats.get((schema.name, fd.alias)))
      if (sts.forall(_.isDefined)) {
        val unis = sts.flatten.map(_.termUniverse)
        if (unis.forall(_.isLeft))
          unis.iterator.flatMap(_.left.toOption.get).toSet.size.toLong
        else {
          val sp = docs.sparkSession
          unis.map {
            case Left(s) => sp
              .createDataset(s.toSeq)(org.apache.spark.sql.Encoders.STRING)
              .toDF("term")
            case Right(df) => df
          }.reduce(_ union _)
            .agg(countDistinct(col("term"))).collect()(0).getLong(0)
        }
      } else docs.select(explode(flatten(array(schema.textFields.map(fd =>
          coalesce(col(s"__${fd.alias}__terms"),
            array().cast("array<string>"))): _*))).as("__term"))
        .agg(countDistinct(col("__term"))).collect()(0).getLong(0)
    }
  }

  def info(indexName: String): DataFrame = {
    val (schema, servingDocs) = index(indexName)
    // the unfiltered view keeps whole-key-dropped docs countable; the
    // validity predicate scopes every index-content counter back to the
    // serving population
    val docs = infoDocs.getOrElse(indexName, servingDocs)
    import org.apache.spark.sql.functions._
    val validC =
      if (docs.columns.contains(graft.sources.Documents.InvalidCol))
        !coalesce(col(graft.sources.Documents.InvalidCol), lit(false))
      else lit(true)
    // raw pre-enrichment value when reachable: aliased/JSON identifiers
    // read the source directly; same-named replaced columns were
    // preserved by enrichment under rawCol (column-pruned when unused)
    def rawExpr(fd: FieldDef): Option[Column] = fd.ftype match {
      case NumericField | _: VectorField =>
        if (fd.alias != fd.identifier ||
            graft.sources.Documents.isJsonPath(fd.identifier))
          Some(graft.sources.Documents.sourceColumn(fd.identifier))
        else if (docs.columns.contains(graft.sources.Documents.rawCol(fd.alias)))
          Some(col(graft.sources.Documents.rawCol(fd.alias)))
        else None
      case _ => None
    }
    // A NUMERIC field carries the NaN-sentinel encoding iff its source
    // was a CONVERSION (string column or JSONPath extraction) —
    // Documents.enrich's invalid-data boundary. JSONPath extractions
    // are always strings; aliased sources keep their original column
    // (check its type); same-named string sources were REPLACED by the
    // cast but preserved under rawCol (rawCol presence IS the marker —
    // enrich writes it only on the sentinel path for numeric fields).
    def numericSentinelShape(fd: FieldDef, d: DataFrame): Boolean =
      if (graft.sources.Documents.isJsonPath(fd.identifier)) true
      else if (fd.alias != fd.identifier)
        scala.util.Try(d.select(
            graft.sources.Documents.sourceColumn(fd.identifier))
          .schema.head.dataType == org.apache.spark.sql.types.StringType)
          .getOrElse(false)
      else d.columns.contains(graft.sources.Documents.rawCol(fd.alias))
    // hash_indexing_failures (reference index_schema.cc FT.INFO reply):
    // numeric failures carry the NaN sentinel in the enriched column
    // (Documents.enrich: NULL = missing, NaN = present-but-invalid, one
    // source evaluation); vector failures are a present raw value whose
    // enriched form is NULL (wrong dimension, unparsable string)
    val failAggs = schema.fields.map { fd =>
      val agg = fd.ftype match {
        case NumericField if numericSentinelShape(fd, docs) =>
          // Conversion-bearing (string/JSON) source: NaN sentinel =
          // fixed-mode invalid; (raw present, alias NULL) = legacy-mode
          // invalid (emulate-release < 1.3.0 enrichment NULLs the field
          // instead of whole-key dropping). The two shapes are mutually
          // exclusive per enrichment mode, so one predicate serves both.
          val legacyInvalid = rawExpr(fd)
            .map(raw => raw.isNotNull && col(fd.alias).isNull)
            .getOrElse(lit(false))
          sum(when(coalesce(isnan(col(fd.alias)), lit(false)) || legacyInvalid,
            1L).otherwise(0L))
        case NumericField =>
          // native numeric source: the cast is total and NaN is a VALUE
          // of the typed column, never invalid data — serving keeps such
          // rows (Documents.enrich emits no conjunct), so counting them
          // here would make metrics and serving disagree
          sum(lit(0L))
        case _ => rawExpr(fd) match {
          case Some(raw) =>
            sum(when(raw.isNotNull && col(fd.alias).isNull, 1L).otherwise(0L))
          case None => sum(lit(0L))
        }
      }
      coalesce(agg, lit(0L)).as(s"__fail_${fd.alias}")
    }
    // total_term_occurrences (reference FT.INFO text block): token
    // instances across TEXT fields — rides the same single stats job
    val occExpr = schema.textFields.map(fd =>
        coalesce(size(col(schema.tokensCol(fd.alias))), lit(0)).cast("long"))
      .reduceOption(_ + _).getOrElse(lit(0L))
    // num_docs / per-field num_tracked / occurrences count only the
    // SERVING population (whole-key-dropped docs are out of the index);
    // the failure aggregates above read the raws, which include them
    val aggs = (count(when(validC, lit(1))).as("num_docs") +:
      schema.fields.map(fd =>
        count(when(validC, col(fd.alias))).as(s"__t_${fd.alias}"))) ++
      failAggs :+ coalesce(sum(when(validC, occExpr)), lit(0L)).as("__occ")
    // counters memoized per registration (reference: maintained per
    // mutation, read O(1) at reply time — here the relation is immutable
    // between registrations, so one computation serves every FT.INFO)
    val (stats, numTermsCached) = infoStatsCache.getOrElseUpdate(indexName, {
      val row = docs.agg(aggs.head, aggs.tail: _*).collect()(0)
      (row, computeNumTerms(schema, servingDocs))
    })
    val numRecords = schema.fields.indices.map(i => stats.getLong(i + 1)).sum
    val failures = schema.fields.indices
      .map(i => stats.getLong(1 + schema.fields.size + i)).sum
    val termOccurrences = stats.getLong(1 + 2 * schema.fields.size)
    val numTerms: Long = numTermsCached
    val spark = docs.sparkSession
    import spark.implicits._
    val fieldRows = schema.fields.zipWithIndex.map { case (fd, i) =>
      val ftype = fd.ftype match {
        case NumericField => "NUMERIC"
        case t: TagField => s"TAG(separator=${t.separator},caseSensitive=${t.caseSensitive})"
        case t: TextField =>
          val mss = if (t.minStemSize > 0) t.minStemSize else schema.analyzer.minStemSize
          s"TEXT(noStem=${t.noStem},minStemSize=$mss)"
        case v: VectorField => s"VECTOR(dim=${v.dim},metric=${v.metric.name})"
      }
      // per-attribute attached index structures (the reference's FT.INFO
      // attribute blocks name each field's index; here the derived
      // relations are opt-in, so surface which ones are registered)
      val attached = Seq(
        postings.contains((indexName, fd.alias)) -> "posting",
        suffixPostings.contains((indexName, fd.alias)) -> "suffix_posting",
        posPostings.contains((indexName, fd.alias)) -> "positional_posting",
        annIndexes.contains((indexName, fd.alias)) -> "ann_graph")
        .collect { case (true, n) => n }.mkString(",")
      (indexName, fd.alias, fd.identifier, ftype, stats.getLong(i + 1), attached)
    }
    val bs = buildState(indexName)
    fieldRows.toDF("index_name", "field", "identifier", "field_type",
        "num_tracked", "attached_indexes")
      .withColumn("num_docs", lit(stats.getLong(0)))
      // num_records / hash_indexing_failures (reference FT.INFO reply,
      // index_schema.cc:1244-1263): total indexed field records and the
      // count of present-but-unindexable raw values
      .withColumn("num_records", lit(numRecords))
      .withColumn("hash_indexing_failures", lit(failures))
      // build-state block (reference FT.INFO, index_schema.cc:1244-1263)
      .withColumn("state", lit(bs.state))
      .withColumn("backfill_in_progress", lit(bs.backfillInProgress))
      .withColumn("backfill_complete_percent", lit(bs.backfillCompletePercent))
      .withColumn("mutation_queue_size", lit(bs.mutationQueueSize))
      // score plumbing (reference FT.INFO "score_field" reply,
      // index_schema.cc:1214-1216)
      .withColumn("score", lit(schema.docScore))
      .withColumn("score_field", lit(schema.docScoreField.orNull))
      // index_definition block (reference FT.INFO reply,
      // index_schema.cc:1203-1216): the normalized PREFIX subscriptions
      // and the (single-valued) language
      // array<string>, matching the reference's array reply
      // (index_schema.cc:1206-1210) — a joined string is ambiguous when
      // a prefix contains the separator and renders the subscribe-all
      // sentinel "" invisibly
      .withColumn("prefixes", typedLit(schema.subscribedPrefixes))
      .withColumn("language", lit("english"))
      // text-index counters (reference FT.INFO num_terms /
      // total_term_occurrences): exact, from the derived term relations
      .withColumn("num_terms", lit(numTerms))
      .withColumn("total_term_occurrences", lit(termOccurrences))
  }

  /** Per-document ingested score (reference IndexSchema::
    * GetDocumentScore, index_schema_test.cc:2676-2800): the
    * SCORE_FIELD attribute's numeric value when present, the index's
    * default score when the field is missing or non-numeric. The
    * score field may be ANY document attribute, indexed or not. */
  def documentScores(indexName: String): DataFrame = {
    val (schema, docs) = index(indexName)
    val scoreCol = schema.docScoreField match {
      case Some(f) if docs.columns.contains(f) =>
        coalesce(col(f).try_cast("double"), lit(schema.docScore))
      case _ => lit(schema.docScore)
    }
    docs.select(col(schema.keyColumn), scoreCol.as("score"))
  }

  /** Engine-wide metrics snapshot as a DataFrame — the `INFO SEARCH`
    * section surface (reference src/metrics.h:29-80). */
  def metricsInfo(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Metrics.snapshot().toDF("metric", "value")
  }

  /**
   * Index persistence (reference S5, src/rdb_serialization.cc): the
   * enriched document table checkpoints as Parquet with the schema
   * declaration alongside; [[SearchEngine.loadIndex]] restores both.
   * Rebuild-from-source (`--skip-rdb-load`) ≡ re-running the
   * [[graft.sources.Documents.enrich]] ingest instead.
   *
   * Attached derived state rides along — the reference's RDB sections
   * serialize the INDEXES themselves (rdb_serialization.cc:324), not
   * just documents: every registered posting relation (term / suffix /
   * positional, each with its stats) is written in the exact layout
   * [[loadPostings]] re-attaches, and each registered NSW graph saves
   * under `ann/<field>` — so a reloaded engine serves posting-routed
   * and graph-ANN queries without any rebuild.
   */
  def saveIndex(indexName: String, path: String): Unit = {
    val (schema, docs) = index(indexName)
    val spark = docs.sparkSession
    docs.write.mode("overwrite").parquet(s"$path/data")
    graft.util.FsIO.writeObjAtomic(spark, s"$path/schema.bin", schema)
    // subdir names MUST match what loadPostings probes: <a>/<a>__stats,
    // <a>__suffix/<a>__suffix_stats, <a>__pos/<a>__pos_stats
    def savePosting(p: DataFrame, sub: String, statsSub: String,
                    stats: Option[PostingStats]): Unit = {
      graft.text.PostingIndex.save(p, s"$path/postings/$sub")
      stats.foreach(st =>
        PostingStats.save(st.countsRelation(spark),
          s"$path/postings/$statsSub"))
    }
    schema.fields.foreach { fd =>
      val a = fd.alias
      postings.get((indexName, a)).foreach(p =>
        savePosting(p, a, s"${a}__stats", postingStats.get((indexName, a))))
      suffixPostings.get((indexName, a)).foreach(p =>
        savePosting(p, s"${a}__suffix", s"${a}__suffix_stats",
          tokenStats.get((indexName, a))))
      posPostings.get((indexName, a)).foreach(p =>
        savePosting(p, s"${a}__pos", s"${a}__pos_stats",
          posStats.get((indexName, a))))
      annIndexes.get((indexName, a)).foreach(ann =>
        graft.pipeline.Nsw.save(ann, s"$path/ann/$a"))
    }
  }

  /** Execute with cooperative cancellation (reference R5 TIMEOUT,
    * src/query/search.h:49-50: default 50 s). Returns collected rows or
    * throws `TimeoutException` after cancelling the running Spark jobs. */
  def executeWithTimeout(df: DataFrame, timeoutMs: Long = -1): Array[org.apache.spark.sql.Row] = {
    // -1 = "use the engine default" ([[defaultTimeoutMs]], the
    // reference's kTimeoutMS — CONFIG-settable as search.timeout-ms)
    val budgetMs = if (timeoutMs < 0) defaultTimeoutMs else timeoutMs
    val spark = df.sparkSession
    val group = s"graft-query-${java.util.UUID.randomUUID()}"
    val result = new java.util.concurrent.CompletableFuture[Array[org.apache.spark.sql.Row]]()
    val t = new Thread(() => {
      try {
        spark.sparkContext.setJobGroup(group, "graft query", interruptOnCancel = true)
        result.complete(df.collect())
      } catch { case e: Throwable => result.completeExceptionally(e) }
      finally spark.sparkContext.clearJobGroup()
    })
    t.setDaemon(true); t.start()
    try result.get(budgetMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    catch {
      case e: java.util.concurrent.TimeoutException =>
        spark.sparkContext.cancelJobGroup(group)
        throw new java.util.concurrent.TimeoutException(
          s"query exceeded ${budgetMs}ms (jobs cancelled)")
    }
  }

  /** Query vectors are normalized for cosine like ingested ones. */
  /** Query vector length must match the index's declared dimension —
    * the reference rejects mismatched blobs after param substitution
    * (search.cc:1154-1160, byte sizes: 4 bytes per FLOAT32 lane). */
  private def checkBlobSize(knn: graft.query.KnnClause, vf: VectorField): Unit =
    if (knn.queryVector.length != vf.dim)
      throw new IllegalArgumentException(
        "Error parsing vector similarity parameters: query vector blob " +
          s"size (${knn.queryVector.length * 4L}) does not match index's " +
          s"expected size (${vf.dim * 4L}).")

  private def normalizeQuery(v: Array[Float], metric: DistanceMetric): Array[Float] =
    metric match {
      case DistanceMetric.Cosine =>
        val mag = math.sqrt(v.map(x => x.toDouble * x).sum)
        if (mag == 0) v else v.map(x => (x / mag).toFloat)
      case _ => v
    }

  /**
   * SLOP/INORDER positional matching (SURVEY §2.2 P11; reference
   * src/indexes/text/proximity.h:22-51): every multi-text-matcher AND
   * additionally requires its words to appear within `slop` intervening
   * positions (optionally in query order) in ONE text field.
   */
  private def applyProximity(df: DataFrame, schema: IndexSchema,
                             filter: Predicate, slop: Int, inorder: Boolean,
                             analyzerCfg: graft.text.Analyzer.Config): DataFrame = {
    // Stop-word terms are removed from the query (search-query.md:152) —
    // they occupy no position in the token stream, so they must not
    // contribute a matcher either (a StemSpec("the") can never match and
    // would wrongly reject every document).
    val matcherGroups = collectMatcherGroups(filter).map(_.filterNot {
      case Term(_, w) =>
        analyzerCfg.stopWords.contains(graft.text.Analyzer.caseFold(w, analyzerCfg))
      case _ => false
    }).filter(_.nonEmpty)
    if (matcherGroups.size < 2) return df
    require(schema.analyzer.withOffsets,
      "SLOP/INORDER requires positions; the index was created NOOFFSETS")
    // Positional constraints apply within a single field; fields named
    // by the matchers (or all text fields when unfielded).
    val fieldsInPlay: Seq[FieldDef] = {
      val named = matcherGroups.flatten.flatMap(_.field).distinct
      if (named.nonEmpty) named.map(schema.fieldOrFail)
      else schema.textFields
    }
    // Per-field matcher specs under that field's EFFECTIVE config (index
    // analyzer + VERBATIM override + per-field NOSTEM) — identical to
    // what PredicateCompiler applies on the plain term path.
    val cond = fieldsInPlay
      .map { fd =>
        val eff = fd.ftype match {
          case tf: TextField if tf.noStem => analyzerCfg.copy(stem = false)
          case _ => analyzerCfg
        }
        val specs = matcherGroups.map {
          case Seq(single) => graft.text.Proximity.toSpec(single, eff)
          case alts =>
            graft.text.Proximity.AnySpec(
              alts.map(graft.text.Proximity.toSpec(_, eff)))
        }
        graft.functions.proximity_match(
          col(schema.tokensCol(fd.alias)), specs, slop, inorder)
      }
      .reduce(_ || _)
    df.filter(cond)
  }

  /** Proximity matcher groups: a plain text leaf is a one-matcher
    * group; an AND contributes each child's groups; a PURE-TEXT OR
    * subtree collapses to ONE group of alternatives (the reference's
    * OrProximityIterator, orproximity.h:20-31 — its positions are the
    * union of the branches'). Mixed ORs and NOTs keep filter semantics
    * only (the reference's proximity tree is likewise built from text
    * iterators alone). */
  private def collectMatcherGroups(p: Predicate): Seq[Seq[TextPredicate]] = p match {
    case t: TextPredicate => Seq(Seq(t))
    case And(cs) => cs.flatMap(collectMatcherGroups)
    case Or(cs) =>
      val leaves = cs.flatMap(orTextLeaves)
      if (leaves.nonEmpty && leaves.length == countLeaves(Or(cs))) Seq(leaves)
      else Seq.empty
    case _ => Seq.empty
  }

  /** Text leaves of an OR subtree (nested ORs flatten). */
  private def orTextLeaves(p: Predicate): Seq[TextPredicate] = p match {
    case t: TextPredicate => Seq(t)
    case Or(cs) => cs.flatMap(orTextLeaves)
    case _ => Seq.empty
  }

  private def countLeaves(p: Predicate): Int = p match {
    case Or(cs) => cs.map(countLeaves).sum
    case _ => 1
  }
}
