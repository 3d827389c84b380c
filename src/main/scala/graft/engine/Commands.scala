package graft.engine

import org.apache.spark.sql.{Column, DataFrame}

import graft.model._
import graft.query.{ExprParseException, ParamValue, StringParam}
import graft.streaming.IndexMaintainer

/**
 * Command-string front-end: the reference's full client API surface
 * (reference COMMANDS.md — FT.CREATE / FT.DROPINDEX / FT.INFO /
 * FT._LIST / FT.SEARCH, plus FT.AGGREGATE from
 * docs/commands/ft.aggregate.md) over argv token lists, so a caller
 * can drive the engine exactly the way a Valkey client drives the
 * module. RESP transport excluded by design — results come back as
 * DataFrames / SearchReply instead of RESP arrays.
 *
 * Data binding: where the reference scans the keyspace by PREFIX, the
 * batch engine binds an index to a document table through `source`
 * (prefixes → raw DataFrame + key expression). SKIPINITIALSCAN maps to
 * registering the schema over an empty slice of the source (no
 * backfill; the streaming path fills it later, SURVEY §2.1 S1/S2).
 */
final class Commands(
    engine: SearchEngine,
    source: Seq[String] => (DataFrame, Column)) {

  // Maintainers created by FT.CREATE MAINTAIN — retrieved by the caller
  // to wire into the ingest stream (Ingest.start(onBatch = _)); the
  // argv analogue of the reference attaching per-field indexes at
  // create time and updating them per mutation (index_schema.cc:964).
  private val maintainerByIndex =
    scala.collection.concurrent.TrieMap.empty[String, IndexMaintainer]

  /** The maintainer FT.CREATE MAINTAIN registered for an index. */
  def maintainer(indexName: String): Option[IndexMaintainer] =
    maintainerByIndex.get(indexName)

  private final class Args(tokens: Seq[String]) {
    private var i = 0
    def hasNext: Boolean = i < tokens.length
    def peek: String = tokens(i)
    def peekIs(kw: String): Boolean = hasNext && tokens(i).equalsIgnoreCase(kw)
    def next(): String = {
      if (!hasNext) throw new ExprParseException("unexpected end of command")
      val t = tokens(i); i += 1; t
    }
    def nextInt(what: String): Int = next().toIntOption.getOrElse(
      throw new ExprParseException(s"$what expects an integer"))
  }

  /** Execute one command argv (command name as first token). */
  def execute(argv: Seq[String]): Any = {
    require(argv.nonEmpty, "empty command")
    argv.head.toUpperCase match {
      case "FT.CREATE" => ftCreate(new Args(argv.tail))
      case "FT.DROPINDEX" =>
        requireIndex("FT.DROPINDEX", argv)
        engine.dropIndex(argv(1))
        // a stale maintainer would re-register views for (and its
        // docsSource branch re-CREATE) the dropped index on next batch
        maintainerByIndex.remove(argv(1))
        "OK"
      case "FT._LIST" => engine.listIndexes
      case "FT.INFO" =>
        requireIndex("FT.INFO", argv)
        ftInfoScoped(argv)
      // Server INFO, SEARCH section (reference metrics surface,
      // src/metrics.h:29-80): engine-wide counters as (metric, value).
      case "INFO" => engine.metricsInfo(source(Nil)._1.sparkSession)
      case "FT.SEARCH" => ftSearch(new Args(argv.tail))
      case "FT.AGGREGATE" => ftAggregate(new Args(argv.tail))
      case "CONFIG" => config(argv.tail)
      case other => throw new ExprParseException(s"unknown command $other")
    }
  }

  /** FT.INFO optional args (reference ft_info_parser.cc:33-117;
    * COMMANDS.md:86-146): LOCAL|PRIMARY|CLUSTER scope plus the
    * ALLSHARDS|SOMESHARDS and CONSISTENT|INCONSISTENT fanout flags —
    * keyword flags in any order (KeyValueParser), last one wins,
    * anything else is "Unexpected parameter". This deployment has no
    * cluster coordinator, so PRIMARY/CLUSTER are REJECTED with the
    * reference's exact non-cluster-configuration errors
    * (ft_info_parser.cc:100-111 — the same path a reference node
    * without `IsCluster() && UsingCoordinator()` takes); the fanout
    * flags parse fine and only modulate fanout, so under LOCAL they
    * are accepted no-ops there and here. */
  private def ftInfoScoped(argv: Seq[String]): DataFrame = {
    var scope = "LOCAL"
    argv.drop(2).foreach { tok =>
      tok.toUpperCase match {
        case s @ ("LOCAL" | "PRIMARY" | "CLUSTER") => scope = s
        case "ALLSHARDS" | "SOMESHARDS" | "CONSISTENT" | "INCONSISTENT" => ()
        case _ => throw new ExprParseException(s"Unexpected parameter: $tok")
      }
    }
    scope match {
      case "PRIMARY" => throw new ExprParseException(
        "PRIMARY option is not valid in this configuration")
      case "CLUSTER" => throw new ExprParseException(
        "CLUSTER option is not valid in this configuration")
      case _ => engine.info(argv(1))
    }
  }

  // ------------------------------------------------------------------ //
  // CONFIG GET/SET — the reference registers its planner/cap knobs as
  // runtime module config (Valkey surfaces them as `search.<flag>`):
  // prefiltering-threshold-ratio (valkey_search_options.cc:355-368,
  // double 0..1, default 0.001), max-nonvector-search-results-fetched
  // (:489-501, uint32, default 100000), fuzzy-max-distance
  // (filter_parser.cc:59-74, 1..50, default 3), plus the query timeout
  // default (search.h:49 kTimeoutMS — a constant there, a knob here).

  private final case class Knob(get: () => String, set: String => Unit)

  private def numKnob(name: String, lo: Long, hi: Long,
                      get: () => Long, set: Long => Unit): (String, Knob) =
    name -> Knob(() => get().toString, { v =>
      val n = v.toLongOption.getOrElse(throw new ExprParseException(
        s"CONFIG SET failed - argument couldn't be parsed into an integer"))
      if (n < lo || n > hi) throw new ExprParseException(
        s"CONFIG SET failed - argument must be between $lo and $hi inclusive")
      set(n)
    })

  private val knobs: Map[String, Knob] = Map(
    "search.prefiltering-threshold-ratio" -> Knob(
      () => graft.resp.Resp.render(engine.prefilterThresholdRatio),
      { v =>
        val d = v.toDoubleOption.getOrElse(throw new ExprParseException(
          "CONFIG SET failed - argument couldn't be parsed into a double"))
        if (d < 0.0 || d > 1.0) throw new ExprParseException(
          "CONFIG SET failed - argument must be between 0 and 1 inclusive")
        engine.prefilterThresholdRatio = d
      }),
    numKnob("search.max-nonvector-search-results-fetched", 0L, 4294967295L,
      // GET echoes the configured uint32 verbatim (the reference
      // round-trips the full range); the Int.MaxValue clamp the
      // engine's limit() arithmetic needs is applied where the cap is
      // CONSUMED (SearchEngine.maxNonVectorResultsFetched), not here
      () => engine.maxNonVectorResultsFetchedRaw,
      n => engine.maxNonVectorResultsFetchedRaw = n),
    numKnob("search.fuzzy-max-distance", 1L, 50L,
      () => engine.fuzzyMaxDistance.toLong,
      n => engine.fuzzyMaxDistance = n.toInt),
    numKnob("search.timeout-ms", 1L, 60000L, // kMaxTimeoutMs cap
      () => engine.defaultTimeoutMs,
      n => engine.defaultTimeoutMs = n),
    // Compatibility-bug emulation pin (valkey_search_options.h:161-197,
    // COMPATIBILITY.md "Compatibility Defects"): major.minor.patch;
    // floor 1.0.0 (kEmulateReleaseMin), ceiling this engine's newest
    // implemented fix version (can't emulate the future —
    // valkey_search_options.cc ValidateEmulateRelease).
    "search.emulate-release" -> Knob(
      () => engine.emulateRelease.toString,
      { v =>
        val ver = graft.model.ValkeyVersion.parse(v).getOrElse(
          throw new ExprParseException(
            "CONFIG SET failed - argument couldn't be parsed into a " +
              "version (major.minor.patch)"))
        if (ver < graft.model.ValkeyVersion.Min)
          throw new ExprParseException(
            s"CONFIG SET failed - argument must be >= " +
              s"${graft.model.ValkeyVersion.Min}")
        if (ver > graft.model.ValkeyVersion.Module)
          throw new ExprParseException(
            s"CONFIG SET failed - search.emulate-release must be <= " +
              s"${graft.model.ValkeyVersion.Module}")
        engine.emulateRelease = ver
      }))

  /** Valkey CONFIG glob: `*` and `?` only (util.c stringmatch subset —
    * the full grammar also has [classes], unused for config names). */
  private def globMatch(pat: String, s: String): Boolean = {
    val re = java.util.regex.Pattern.quote(pat)
      .replace("*", "\\E.*\\Q").replace("?", "\\E.\\Q")
    s.matches(re)
  }

  private def config(args: Seq[String]): Any = {
    if (args.isEmpty) throw new ExprParseException(
      "wrong number of arguments for 'config' command")
    args.head.toUpperCase match {
      case "GET" =>
        if (args.length < 2) throw new ExprParseException(
          "wrong number of arguments for 'config|get' command")
        // flat [name, value, ...] pairs, pattern-matched like Valkey.
        // Dedupe by knob NAME (a knob matched by overlapping patterns
        // appears once) BEFORE pairing — deduping the flattened array
        // would drop a repeated VALUE string and misalign every pair
        // after it (e.g. two knobs both set to "3").
        args.tail
          .flatMap(pat => knobs.keys.filter(globMatch(pat.toLowerCase, _)))
          .distinct.sorted
          .flatMap(name => Seq(name, knobs(name).get()))
      case "SET" =>
        if (args.length != 3) throw new ExprParseException(
          "wrong number of arguments for 'config|set' command")
        val name = args(1).toLowerCase
        knobs.getOrElse(name, throw new ExprParseException(
          s"Unknown option or number of arguments for CONFIG SET - '${args(1)}'"))
          .set(args(2))
        "OK"
      case other => throw new ExprParseException(
        s"Unknown CONFIG subcommand or wrong number of arguments for '$other'")
    }
  }

  // ---------------------------------------------------------------- //

  /** Arity + existence checks with the reference's messages
    * (vmsdk wrong-arity; index_schema.h:59 not-found — single-db here,
    * so the db number is always 0). */
  private def requireIndex(cmd: String, argv: Seq[String]): Unit = {
    if (argv.length < 2) throw new ExprParseException(
      s"wrong number of arguments for '$cmd' command")
    if (!engine.listIndexes.contains(argv(1))) throw new ExprParseException(
      s"Index with name '${argv(1)}' not found in database 0")
  }

  /** Redis cluster hash tag: a `{...}` span that routes the key. */
  private def hasHashTag(s: String): Boolean = {
    val i = s.indexOf('{')
    i >= 0 && s.indexOf('}', i + 1) > i
  }

  private def ftCreate(a: Args): String = {
    val name = a.next()
    var prefixes: Seq[String] = Nil
    var skipScan = false
    var postingsDir: Option[String] = None
    var postingsLoadDir: Option[String] = None
    var maintainDir: Option[String] = None
    var maintainOpenDir: Option[String] = None
    var score = 1.0
    var scoreField: Option[String] = None
    // Index-level text options (reference ft_create_parser.cc:640-725):
    // flexible order before SCHEMA, defaults per the reference.
    var analyzerCfg = graft.text.Analyzer.Default
    var onJson = false
    if (a.peekIs("ON")) { a.next(); val t = a.next().toUpperCase
      require(t == "HASH" || t == "JSON", s"ON expects HASH|JSON, got $t")
      onJson = t == "JSON" }
    var done = false
    while (!done && a.hasNext) {
      a.peek.toUpperCase match {
        case "PREFIX" =>
          a.next(); val n = a.nextInt("PREFIX")
          // count is bounds-checked at parse (reference max-prefixes 16;
          // ft_create_parser_test.cc invalid_*_prefix_cnt)
          if (n < 0 || n > 16) throw new ExprParseException(
            s"Bad arguments for PREFIX: `$n` is outside acceptable bounds")
          prefixes = prefixes ++ (0 until n).map { _ =>
            val p = a.next()
            // cluster slot-routing constraint (ft_create_parser.cc):
            // prefixes must not carry a hash tag
            if (hasHashTag(p)) throw new ExprParseException(
              "PREFIX argument(s) must not contain a hash tag")
            p
          }
        case "SKIPINITIALSCAN" => a.next(); skipScan = true
        case "PUNCTUATION" =>
          a.next(); val p = a.next()
          if (p.isEmpty)
            throw new ExprParseException("PUNCTUATION string cannot be empty")
          analyzerCfg = analyzerCfg.copy(punctuation = p.toSet)
        case "STOPWORDS" =>
          a.next(); val n = a.nextInt("STOPWORDS")
          if (n < 0) throw new ExprParseException(
            s"Error parsing value for the parameter `STOPWORDS` - `$n` is " +
              "outside acceptable bounds")
          analyzerCfg = analyzerCfg.copy(
            stopWords = (0 until n).map(_ => a.next().toLowerCase).toSet)
        case "NOSTOPWORDS" =>
          a.next(); analyzerCfg = analyzerCfg.copy(stopWords = Set.empty)
        case "NOSTEM" => a.next(); analyzerCfg = analyzerCfg.copy(stem = false)
        case "MINSTEMSIZE" =>
          a.next(); val n = a.nextInt("MINSTEMSIZE")
          if (n <= 0) throw new ExprParseException(
            "Error parsing value for the parameter `MINSTEMSIZE` - " +
              "MINSTEMSIZE must be positive")
          analyzerCfg = analyzerCfg.copy(minStemSize = n)
        case "WITHOFFSETS" => a.next(); analyzerCfg = analyzerCfg.copy(withOffsets = true)
        case "NOOFFSETS" => a.next(); analyzerCfg = analyzerCfg.copy(withOffsets = false)
        case "LANGUAGE" =>
          a.next(); val l = a.next()
          if (!l.equalsIgnoreCase("ENGLISH")) throw new ExprParseException(
            s"Bad arguments for LANGUAGE: Unknown argument `$l`")
        // Engine extension (no reference syntax — the reference ALWAYS
        // builds postings in RAM; here they are opt-in storage): build +
        // register term-sorted posting relations for every TEXT/TAG
        // field under the given directory.
        case "POSTINGS" => a.next(); postingsDir = Some(a.next())
        // Engine extension, restart path: re-ATTACH postings previously
        // saved under the dir (no rebuild — the RDB-load shape). The
        // caller owns snapshot/corpus consistency, exactly like an RDB.
        case "POSTINGS_LOAD" => a.next(); postingsLoadDir = Some(a.next())
        // Engine extension: build + register EVERY maintainable derived
        // index (term/suffix posting stores, NSW graphs) under the given
        // directory and keep a registered IndexMaintainer — the argv
        // reach into the incremental layer ([[IndexMaintainer.forIndex]];
        // wire `maintainer(name).get.onBatch` into Ingest.start).
        case "MAINTAIN" => a.next(); maintainDir = Some(a.next())
        // Engine extension, restart path: re-OPEN the maintained set a
        // prior MAINTAIN persisted under the dir (stores via manifests,
        // ANN via its last checkpoint) instead of rebuilding; catch-up
        // is the caller's stream replay (idempotent per batch).
        case "MAINTAIN_OPEN" => a.next(); maintainOpenDir = Some(a.next())
        // Engine extension: ICU-parity full case folding (ß→ss class);
        // the reference always folds this way (unicode_normalizer.cc),
        // here it is opt-in to keep existing simple-fold indexes stable.
        case "UNICODEFOLD" =>
          a.next(); analyzerCfg = analyzerCfg.copy(fullFold = true)
        // Per-document score plumbing (reference ft_create_parser.cc
        // ParseScore:284-301, SCORE_FIELD:302-310; index_schema.cc:
        // 631-645 stores it per key): parsed, validated and surfaced by
        // FT.INFO — like the reference, no scorer consumes it yet.
        case "SCORE" =>
          a.next(); val tok = a.next()
          val v = tok.toDoubleOption.getOrElse(throw new ExprParseException(
            s"Bad arguments for SCORE: `$tok` is not a valid float"))
          if (v < 0.0 || v > 1.0)
            throw new ExprParseException(
              s"`SCORE` parameter with a value `$tok` is not supported. " +
                "The value must be between 0.0 and 1.0")
          score = v
        case "SCORE_FIELD" => a.next(); scoreField = Some(a.next())
        // Rejected with the reference's error shape
        // (ft_create_parser.cc NotSupportedParamErrorMsg: FILTER:647-651,
        // LANGUAGE_FIELD:279-283, PAYLOAD_FIELD:689-695).
        case p @ ("FILTER" | "LANGUAGE_FIELD" | "PAYLOAD_FIELD") =>
          throw new ExprParseException(s"The parameter `$p` is not supported")
        case "SCHEMA" => a.next(); done = true
        case _ => throw new ExprParseException(
          s"Unexpected parameter `${a.peek}`, expecting `SCHEMA`")
      }
    }
    // hash-tagged index names route by their tag and need an explicit
    // PREFIX; checked before missing-SCHEMA like the reference
    if (hasHashTag(name) && prefixes.isEmpty) throw new ExprParseException(
      "PREFIX parameter is required for hash-tagged indexes")
    if (!done) throw new ExprParseException("Missing argument")
    val fields = Seq.newBuilder[FieldDef]
    while (a.hasNext) {
      val identifier = a.next()
      // all attribute-parse errors carry the reference's prefix
      // (ft_create_parser.cc "Invalid field type for field `x`: ...")
      def fieldErr(msg: String): Nothing = throw new ExprParseException(
        s"Invalid field type for field `$identifier`: $msg")
      def nextTok(): String =
        if (a.hasNext) a.next() else fieldErr("Missing argument")
      val alias = if (a.peekIs("AS")) { a.next(); nextTok() } else identifier
      // ValidateAttributeAlias (ft_create_parser.cc:545-556): any char
      // from the default punctuation set is invalid in an alias
      alias.find(graft.text.Analyzer.DefaultPunctuation.contains(_)).foreach(c =>
        fieldErr(s"Attribute alias `$alias` contains invalid character `$c`"))
      val typeTok = nextTok()
      val ftype = typeTok.toUpperCase match {
        case "NUMERIC" => NumericField
        case "TAG" =>
          var sep = ","; var cs = false
          var more = true
          while (more && a.hasNext) a.peek.toUpperCase match {
            case "SEPARATOR" =>
              a.next(); sep = nextTok()
              if (sep.length != 1) fieldErr(
                s"The separator must be a single character, but got `$sep`")
            case "CASESENSITIVE" => a.next(); cs = true
            case _ => more = false
          }
          TagField(sep, cs)
        case "TEXT" =>
          // per-field TEXT params are NOSTEM / WITHSUFFIXTRIE /
          // NOSUFFIXTRIE / WEIGHT only — STOPWORDS, PUNCTUATION and
          // MINSTEMSIZE are index-level (before SCHEMA), like the
          // reference's per-field grammar
          var noStem = false; var weight = 1.0; var suffix = false
          var more = true
          while (more && a.hasNext) a.peek.toUpperCase match {
            case "NOSTEM" => a.next(); noStem = true
            case "WEIGHT" =>
              // parsed but only 1.0 is accepted, like the reference
              // (ft_create_parser.cc:526-531)
              a.next(); val w = nextTok()
              weight = w.toDoubleOption.getOrElse(fieldErr(
                s"Error parsing value for the parameter `WEIGHT` - `$w` is " +
                  "not a valid float"))
              if (weight != 1.0) fieldErr(
                "The `WEIGHT` clause with a value other than `1.0` is not supported.")
            case "WITHSUFFIXTRIE" => a.next(); suffix = true
            case "NOSUFFIXTRIE" => a.next(); suffix = false
            case _ => more = false
          }
          TextField(noStem, suffix, -1, weight)
        case "VECTOR" =>
          val algoTok = nextTok()
          val algo = algoTok.toUpperCase
          if (algo != "HNSW" && algo != "FLAT")
            fieldErr(s"Unknown argument `$algoTok`")
          val cntTok = nextTok()
          val nAttrs = cntTok.toIntOption.filter(_ >= 0).getOrElse(
            fieldErr(s"`$cntTok` is outside acceptable bounds"))
          var dim = -1; var metric: Option[DistanceMetric] = None
          var typed = false
          var m = 16; var efc = 200; var efr = 10
          // value ranges mirror HNSWParameters/FlatParameters::Verify
          // (ft_create_parser.cc:777-832) with the vmsdk VerifyRange
          // message shapes
          def ranged(k: String, v: String, lo: Long, hi: Long, what: String): Int = {
            val n = v.toLongOption.getOrElse(fieldErr(
              s"Error parsing value for the parameter `$k` - `$v` is " +
                "outside acceptable bounds"))
            if (n < lo) fieldErr(s"Invalid range: Value below minimum; $what")
            if (n > hi) fieldErr(s"Invalid range: Value above maximum; $what")
            n.toInt
          }
          var consumed = 0
          while (consumed < nAttrs) {
            if (!a.hasNext) fieldErr(
              s"Expected $nAttrs parameters for $algo but got $consumed parameters.")
            val kTok = a.next(); consumed += 1
            val k = kTok.toUpperCase
            if (consumed >= nAttrs || !a.hasNext) fieldErr(
              s"Error parsing value for the parameter `$k` - Missing argument")
            val v = a.next(); consumed += 1
            k match {
              case "DIM" => dim = v.toIntOption.getOrElse(fieldErr(
                s"Error parsing value for the parameter `DIM` - `$v` is " +
                  "outside acceptable bounds"))
              case "TYPE" =>
                if (!v.equalsIgnoreCase("FLOAT32")) fieldErr(
                  s"Error parsing value for the parameter `TYPE` - Unknown argument `$v`")
                typed = true
              case "DISTANCE_METRIC" =>
                metric = Some(scala.util.Try(DistanceMetric.parse(v)).getOrElse(fieldErr(
                  s"Error parsing value for the parameter `DISTANCE_METRIC` - " +
                    s"Unknown argument `$v`")))
              case "INITIAL_CAP" =>
                // capacity is storage-managed here; bounds still verify
                ranged(k, v, 1, 10000000,
                  "INITIAL_CAP must be a positive integer greater than 0 and " +
                    "cannot exceed 10000000.")
                ()
              case "M" if algo == "HNSW" =>
                m = ranged(k, v, 2, 2000000,
                  "M must be a positive integer greater than 2 and cannot " +
                    "exceed 2000000.")
              case "EF_CONSTRUCTION" if algo == "HNSW" =>
                efc = ranged(k, v, 1, 1000000,
                  "EF_CONSTRUCTION must be a positive integer greater than 0 " +
                    "and cannot exceed 1000000.")
              case "EF_RUNTIME" if algo == "HNSW" =>
                // unsigned in the reference: a negative value fails the
                // parse, zero fails the range check
                if (v.startsWith("-")) fieldErr(
                  s"Error parsing value for the parameter `EF_RUNTIME` - " +
                    s"`$v` is outside acceptable bounds")
                efr = ranged(k, v, 1, 1000000,
                  "EF_RUNTIME must be a positive integer greater than 0 and " +
                    "cannot exceed 1000000.")
              case "BLOCK_SIZE" if algo == "FLAT" =>
                // flat blocks are storage-managed here; bounds still verify
                ranged(k, v, 1, 10000000,
                  "BLOCK_SIZE must be a positive integer greater than 0 and " +
                    "cannot exceed 10000000.")
                ()
              case _ => fieldErr(s"Unexpected argument `$kTok`")
            }
          }
          // reference FTCreateVectorParameters::Verify: required params
          if (dim < 0) fieldErr("Missing dimensions parameter.")
          if (dim < 1 || dim > 32768) fieldErr(
            "The dimensions value must be a positive integer greater than 0 " +
              "and less than or equal to 32768.")
          if (!typed) fieldErr("Missing vector TYPE parameter.")
          if (metric.isEmpty) fieldErr("Missing DISTANCE_METRIC parameter.")
          VectorField(dim, metric.get, m, efc, efr)
        case _ => fieldErr(s"Unknown argument `$typeTok`")
      }
      if (a.peekIs("SORTABLE")) a.next() // accepted & ignored, as the reference
      // ON JSON: identifiers are JSONPaths into the document; a bare
      // name resolves as the module's legacy path (`e1` ≡ `$.e1` —
      // JSON.GET accepts both, attribute_data_type.cc GetJsonRecord
      // passes the identifier through verbatim)
      val boundId =
        if (onJson && !graft.sources.Documents.isRootedJsonPath(identifier))
          s"$$.$identifier"
        else identifier
      fields += FieldDef(boundId, alias, ftype)
    }
    // schema-level validation (reference ft_create_parser.cc:746-763):
    // duplicate identifiers, attribute count, text-field count
    val defs = fields.result()
    defs.groupBy(_.identifier).collectFirst { case (id, ds) if ds.size > 1 =>
      throw new ExprParseException(s"Duplicate field in schema - $id")
    }
    if (defs.size > 1000) throw new ExprParseException(
      "Invalid range: Value above maximum; The maximum number of attributes " +
        "cannot exceed 1000.")
    if (defs.count(_.ftype.isInstanceOf[TextField]) > 64)
      throw new ExprParseException(
        "Invalid range: Value above maximum; The maximum number of text " +
          "fields cannot exceed 64.")
    if (prefixes.size > 16) throw new ExprParseException(
      "The maximum number of prefixes cannot exceed 16.")
    // subscribed-prefix normalization (index_schema.cc:321-334): dups
    // and already-covered prefixes drop before the source binds
    val normPrefixes = graft.sources.Documents.normalizePrefixes(prefixes)
    val schema = IndexSchema(name, defs, analyzer = analyzerCfg,
      docScore = score, docScoreField = scoreField,
      subscribedPrefixes = normPrefixes, onJson = onJson)
    // registry checks at the command surface only (reference
    // SchemaManager::CreateIndexSchema, schema_manager.cc:148 +
    // max-indexes config default 1000, :50-62; internal re-register
    // paths — maintainer refresh — keep replace semantics)
    if (engine.listIndexes.contains(name)) throw new ExprParseException(
      s"Index $name in database 0 already exists.")
    if (engine.listIndexes.size >= engine.maxIndexes)
      throw new ExprParseException(
        "Invalid range: Value above maximum; Maximum number of indexes " +
          s"reached (${engine.maxIndexes}). Cannot create additional indexes.")
    val (raw, keyExpr) = source(normPrefixes)
    // a JSON-bound source must carry the serialized document column the
    // JSONPath identifiers extract from and replies serve under `$`
    if (onJson && !raw.columns.contains(graft.model.IndexSchema.DocColumn))
      throw new ExprParseException(
        s"ON JSON requires the source to provide a " +
          s"`${graft.model.IndexSchema.DocColumn}` document column")
    // The PREFIX subscription is ENGINE-side, like the reference's
    // index_schema.cc prefix matching — a source that ignores the
    // prefixes it is handed still yields a correctly-restricted index.
    // (Sources that pre-filter just produce a redundant conjunct.)
    val subscribed =
      if (normPrefixes == Seq("")) raw
      else raw.filter(
        graft.sources.Documents.keyPrefixPredicate(keyExpr, normPrefixes))
    val bound = if (skipScan) subscribed.limit(0) else subscribed
    // TEXT-bearing indexes default resident, like the reference's
    // always-in-memory text index — otherwise every query re-runs the
    // analyzer over the corpus (tokenize-on-read, a per-query cost the
    // reference never pays).
    // pre-1.3.0 emulation (invalid data ≡ missing field, no whole-key
    // drop) is consulted at create time, like the reference consulting
    // the knob per mutation — a later CONFIG SET does not re-judge
    // already-indexed keys
    val legacyInvalid = !engine.emulationEnabled(1, 3, 0)
    if (legacyInvalid) Metrics.legacyUsed("invalid_data_drops_key")
    engine.createIndex(schema,
      graft.sources.Documents.enrich(bound, schema, keyExpr = Some(keyExpr),
        legacyInvalidData = legacyInvalid),
      resident = schema.textFields.nonEmpty)
    // SKIPINITIALSCAN: the index starts EMPTY awaiting the stream — the
    // initial fill has not happened (FT.INFO backfill fields,
    // index_schema.cc:1244-1263); a full initial scan means ready.
    if (skipScan) engine.reportBackfill(name, 0L, 1L)
    postingsDir.foreach(d => engine.buildPostings(name, d))
    postingsLoadDir.foreach(d => engine.loadPostings(name, d))
    // docsSource re-resolves the bound source per batch (a parquet-backed
    // DataFrame pins its file list at creation; a stale handle would miss
    // the batch's writes) with the key column pre-applied — onBatch's
    // enrich path keys off schema.keyColumn when present.
    // SKIPINITIALSCAN means pre-existing source documents are NOT
    // indexed until streamed — but the maintain wiring's docsSource
    // re-registers the FULL bound source per batch, which would
    // resurrect them all after one batch. Honoring skip semantics
    // needs the Ingest STATE as docsSource (only streamed docs);
    // Commands cannot know that path — wire IndexMaintainer manually
    // for that deployment instead of silently breaking the contract.
    if (skipScan && (maintainDir.isDefined || maintainOpenDir.isDefined))
      throw new ExprParseException(
        "SKIPINITIALSCAN cannot be combined with MAINTAIN/MAINTAIN_OPEN; " +
          "wire IndexMaintainer with the ingest state as docsSource instead")
    def boundSource(): () => DataFrame = () => {
      val (raw2, key2) = source(normPrefixes)
      val sub2 =
        if (normPrefixes == Seq("")) raw2
        else raw2.filter(
          graft.sources.Documents.keyPrefixPredicate(key2, normPrefixes))
      sub2.withColumn(schema.keyColumn, key2.cast(org.apache.spark.sql.types.StringType))
    }
    maintainDir.foreach { d =>
      maintainerByIndex(name) =
        IndexMaintainer.forIndex(engine, name, d, docsSource = Some(boundSource()))
    }
    maintainOpenDir.foreach { d =>
      maintainerByIndex(name) =
        IndexMaintainer.openIndex(engine, name, d, docsSource = Some(boundSource()))
    }
    "OK"
  }

  private def parseParams(a: Args): Map[String, ParamValue] = {
    val n = a.nextInt("PARAMS")
    if (n % 2 != 0) throw new ExprParseException(
      "Parameter count must be an even number.")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, ParamValue]
    (0 until n / 2).foreach { _ =>
      val k = a.next(); val v = a.next()
      // re-declaration rejected (reference ft_search_parser.cc:127-135)
      if (out.contains(k)) throw new ExprParseException(
        s"Parameter $k is already defined.")
      out(k) = StringParam(v)
    }
    out.toMap
  }

  /** Every PARAMS entry must be referenced by the query — the reference
    * rejects the command otherwise (ft_search_parser.cc:91-99). */
  private def requireAllParamsUsed(query: String, opts: SearchOptions): Unit =
    if (opts.params.nonEmpty) {
      val parsed = graft.query.FilterParser.parse(query, opts.params,
        fuzzyMaxDistance = engine.fuzzyMaxDistance)
      val unused = opts.params.keySet -- parsed.usedParams
      if (unused.nonEmpty) throw new ExprParseException(
        s"Parameter `${unused.min}` not used.")
    }

  private def ftSearch(a: Args): SearchEngine.SearchReply = {
    val (index, query, opts) = parseFtSearch(a)
    engine.searchReply(index, query, opts)
  }

  /** Parse FT.SEARCH arguments WITHOUT executing — the RESP adapter
    * ([[graft.resp.RespCommands]]) needs the parsed options to shape
    * the wire reply (NOCONTENT / WITHSORTKEYS / KNN score naming). */
  private[graft] def parseFtSearch(argv: Seq[String]): (String, String, SearchOptions) =
    parseFtSearch(new Args(argv))

  private def parseFtSearch(a: Args): (String, String, SearchOptions) = {
    val index = a.next()
    val query = a.next()
    var opts = SearchOptions()
    while (a.hasNext) {
      a.next().toUpperCase match {
        case "NOCONTENT" => opts = opts.copy(noContent = true)
        case "TIMEOUT" =>
          // applied by executeWithTimeout callers; reference caps it
          // (search.h:50 kMaxTimeoutMs)
          val t = a.nextInt("TIMEOUT")
          if (t < 0 || t > 60000) throw new ExprParseException(
            "TIMEOUT must be a positive integer greater than 0 and " +
              "cannot exceed 60000.")
        case "PARAMS" => opts = opts.copy(params = parseParams(a))
        case "LIMIT" =>
          // unsigned in the reference (ft_search_parser.cc:102-111):
          // a negative offset/count fails the value parse
          val off = a.nextInt("LIMIT"); val num = a.nextInt("LIMIT")
          Seq(off, num).find(_ < 0).foreach(v => throw new ExprParseException(
            s"Bad arguments for LIMIT: `$v` is outside acceptable bounds"))
          opts = opts.copy(limit = (off, num))
        case "SORTBY" =>
          val f = a.next()
          val asc = if (a.peekIs("ASC")) { a.next(); true }
            else if (a.peekIs("DESC")) { a.next(); false } else true
          opts = opts.copy(sortBy = Some((f, asc)))
        case "RETURN" =>
          val n = a.nextInt("RETURN")
          val fs = Seq.newBuilder[(String, Option[String])]
          var consumed = 0
          while (consumed < n) {
            val f = a.next(); consumed += 1
            if (a.peekIs("AS")) { a.next(); fs += ((f, Some(a.next()))); consumed += 2 }
            else fs += ((f, None))
          }
          val parsed = fs.result()
          opts =
            if (n == 0) opts.copy(noContent = true) // RETURN 0 ≡ NOCONTENT
            else opts.copy(returnFields = parsed)
        case "DIALECT" =>
          val d = a.nextInt("DIALECT")
          // reference Verify range (ft_search_parser.cc:85-88)
          if (d < 2 || d > 4) throw new ExprParseException(
            "DIALECT requires a non negative integer >=2 and <= 4")
        case "VERBATIM" => opts = opts.copy(verbatim = true)
        // Positional options (reference ft_search_parser.cc:232-236)
        case "SLOP" =>
          val s = a.nextInt("SLOP")
          if (s < 0) throw new ExprParseException("SLOP must be non-negative")
          opts = opts.copy(slop = Some(s))
        case "INORDER" => opts = opts.copy(inorder = true)
        case "WITHSORTKEYS" => opts = opts.copy(withSortKeys = true)
        // Cluster scope/consistency hints (reference ft_search_parser
        // .cc:208-221, search.h:66-70): accepted flags; a single Spark
        // engine always behaves as LOCALONLY+CONSISTENT, so they carry
        // no effect here — but a reference client may always send them.
        case "LOCALONLY" | "ALLSHARDS" | "SOMESHARDS" |
             "CONSISTENT" | "INCONSISTENT" => ()
        case other => throw new ExprParseException(s"unknown FT.SEARCH option $other")
      }
    }
    requireAllParamsUsed(query, opts)
    (index, query, opts)
  }

  private def ftAggregate(a: Args): DataFrame = {
    val index = a.next()
    val query = a.next()
    // Non-stage options may appear among the stages (reference
    // ft_aggregate_parser.cc:240-251): PARAMS/TIMEOUT/DIALECT, the
    // filter-text options SLOP/INORDER/VERBATIM (flow into the query's
    // text parsing, search.cc:1040-1042), and ADDSCORES (parsed flag
    // the reference exec never reads — accepted, no effect). Everything
    // else passes through as a stage token.
    val stageTokens = Seq.newBuilder[String]
    var opts = SearchOptions()
    while (a.hasNext) {
      if (a.peekIs("PARAMS")) { a.next(); opts = opts.copy(params = parseParams(a)) }
      else if (a.peekIs("TIMEOUT")) {
        a.next(); val t = a.nextInt("TIMEOUT")
        if (t < 0 || t > 60000) throw new ExprParseException(
          "TIMEOUT must be a positive integer greater than 0 and " +
            "cannot exceed 60000.")
      }
      else if (a.peekIs("DIALECT")) {
        a.next(); val d = a.nextInt("DIALECT")
        if (d < 2 || d > 4) throw new ExprParseException(
          "DIALECT requires a non negative integer >=2 and <= 4")
      }
      else if (a.peekIs("VERBATIM")) { a.next(); opts = opts.copy(verbatim = true) }
      else if (a.peekIs("INORDER")) { a.next(); opts = opts.copy(inorder = true) }
      else if (a.peekIs("SLOP")) {
        a.next(); val s = a.nextInt("SLOP")
        if (s < 0) throw new ExprParseException("SLOP must be non-negative")
        opts = opts.copy(slop = Some(s))
      }
      else if (a.peekIs("ADDSCORES")) { a.next() }
      else stageTokens += a.next()
    }
    engine.aggregate(index, query, stageTokens.result(), opts)
  }
}
