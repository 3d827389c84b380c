package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Commands, Metrics, SearchEngine}
import graft.model.ValkeyVersion
import graft.query.ExprParseException

/**
 * `search.emulate-release` compatibility-bug emulation (reference
 * valkey_search_options.h:161-197 VALKEY_SEARCH_COMPATIBILITY_FIX,
 * COMPATIBILITY.md "Compatibility Defects"): pinning the knob below a
 * fix's release re-enables that fix's LEGACY behavior and bumps a
 * `compatibility-<label>` INFO counter. Each gated site is pinned in
 * BOTH modes here; legacy expectations derive from the reference's
 * explicitly labeled pre-fix branches (value.cc old_fn lambdas;
 * index_schema.cc:713-727 pre-1.3.0 comment).
 *
 * Default = fully-fixed semantics ([[ValkeyVersion.Module]]): this
 * engine's differential goldens are the Redisearch answers, which pin
 * the FIXED behavior (the reference itself defaults to major.0.0).
 */
class EmulateReleaseSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var engine: SearchEngine = _
  private var cmds: Commands = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("emulate-release-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark; import sp.implicits._
    val docs = Seq(
      ("e1", "abc", "42"),
      ("e2", "", "not_a_number"),
      ("e3", "xyz", "7.5"))
      .toDF("pk", "s", "num")
    engine = new SearchEngine
    cmds = new Commands(engine, _ => (docs, col("pk")))
    assert(cmds.execute(Seq("FT.CREATE", "er", "SCHEMA",
      "s", "TEXT", "num", "NUMERIC")) == "OK")
  }
  override def afterAll(): Unit = ()

  /** Run body with the knob pinned to `v`, restoring the default. */
  private def pinned[T](v: String)(body: => T): T = {
    assert(cmds.execute(Seq("CONFIG", "SET", "search.emulate-release", v)) == "OK")
    try body
    finally assert(cmds.execute(
      Seq("CONFIG", "SET", "search.emulate-release",
        ValkeyVersion.Module.toString)) == "OK")
  }

  private def applyOne(expr: String): Row =
    cmds.execute(Seq("FT.AGGREGATE", "er", "@num:[42 42]",
      "APPLY", expr, "AS", "r", "LIMIT", "0", "1"))
      .asInstanceOf[DataFrame].select("r").collect().head

  private def applyD(expr: String): java.lang.Double = {
    val row = applyOne(expr)
    if (row.isNullAt(0)) null else java.lang.Double.valueOf(row.getDouble(0))
  }
  private def applyS(expr: String): String = {
    val row = applyOne(expr)
    if (row.isNullAt(0)) null else row.getString(0)
  }

  // ---- the knob itself ----

  test("CONFIG GET/SET round-trips; default is the fully-fixed module version") {
    assert(cmds.execute(Seq("CONFIG", "GET", "search.emulate-release")) ==
      Seq("search.emulate-release", "1.3.0"))
    assert(cmds.execute(Seq("CONFIG", "SET", "search.emulate-release",
      "1.2.0")) == "OK")
    assert(cmds.execute(Seq("CONFIG", "GET", "search.emulate-release")) ==
      Seq("search.emulate-release", "1.2.0"))
    assert(cmds.execute(Seq("CONFIG", "SET", "search.emulate-release",
      "1.3.0")) == "OK")
  }

  test("SET rejects malformed versions and enforces the reference's bounds") {
    // not major.minor.patch
    intercept[ExprParseException] {
      cmds.execute(Seq("CONFIG", "SET", "search.emulate-release", "1.2"))
    }
    intercept[ExprParseException] {
      cmds.execute(Seq("CONFIG", "SET", "search.emulate-release", "lots"))
    }
    // below kEmulateReleaseMin 1.0.0 (valkey_search_options.cc:737)
    intercept[ExprParseException] {
      cmds.execute(Seq("CONFIG", "SET", "search.emulate-release", "0.9.9"))
    }
    // can't emulate the future (ValidateEmulateRelease)
    intercept[ExprParseException] {
      cmds.execute(Seq("CONFIG", "SET", "search.emulate-release", "9.9.9"))
    }
    assert(engine.emulateRelease == ValkeyVersion.Module) // unchanged
  }

  // ---- 1.2.1 expression sites (value.cc old_fn branches) ----

  test("asbool_string_truthy: pre-1.2.1 every non-Nil string is false") {
    def count(q: Seq[String]): Long =
      cmds.execute(q).asInstanceOf[DataFrame].count()
    val filterS = Seq("FT.AGGREGATE", "er", "*", "LOAD", "1", "@s",
      "FILTER", "@s", "LIMIT", "0", "10")
    assert(count(filterS) == 2L) // fixed: "abc"/"xyz" truthy, "" falsy
    pinned("1.2.0") { assert(count(filterS) == 0L) } // legacy: all false
  }

  test("numeric_unary_nan_on_unparsable: pre-1.2.1 floor('abc') is Nil, not NaN") {
    val fixed = applyD("floor(@s)")
    assert(fixed != null && fixed.isNaN)
    pinned("1.2.0") { assert(applyD("floor(@s)") == null) }
  }

  test("upper/lower_non_string_to_nil: pre-1.2.1 numbers pass through AsStringView") {
    assert(applyS("upper(@num)") == null) // fixed: non-string -> Nil
    pinned("1.2.0") {
      assert(applyS("upper(@num)") == "42") // %.11g form, no letters to map
      assert(applyS("lower(3.5)") == "3.5")
    }
  }

  test("date_fn_negative_ts_to_nil: pre-1.2.1 date functions compute pre-epoch") {
    assert(applyD("year(0 - 86400)") == null) // fixed: Nil
    pinned("1.2.0") {
      assert(applyD("year(0 - 86400)") == 1969.0) // Dec 31 1969
      assert(applyD("dayofweek(0 - 86400)") == 3.0) // Wednesday (0=Sun)
      assert(applyD("day(0 - 90000)") == -172800.0) // FLOOR, not trunc
      assert(applyD("hour(0 - 1800)") == -3600.0)
    }
  }

  test("month_mday_off_by_one: pre-1.2.1 month() rolls back to the previous day") {
    val feb10_1970 = 86400.0 * 40
    assert(applyD(s"month(${feb10_1970.toLong})") == 2678400.0) // Feb 1
    pinned("1.2.0") { // mday=0 -> mktime rolls back one day (Jan 31)
      assert(applyD(s"month(${feb10_1970.toLong})") == 2678400.0 - 86400.0)
    }
  }

  test("timefmt_empty_format_to_nil: pre-1.2.1 an empty format returned ''") {
    assert(applyS("timefmt(0, '')") == null) // fixed
    pinned("1.2.0") {
      assert(applyS("timefmt(0, '')") == "")
      // the fast-path sits AFTER the timestamp guards: bad ts stays Nil
      assert(applyS("timefmt(@s, '')") == null)
    }
  }

  test("parsetime_format_mismatch_to_nil: pre-1.2.1 fed the zeroed tm to mktime") {
    assert(applyD("parsetime('hello', '%Y-%m-%d')") == null) // fixed
    pinned("1.2.0") { // zeroed tm, mday=0 rollback -> Dec 31 1899 UTC
      assert(applyD("parsetime('hello', '%Y-%m-%d')") == -2209075200.0)
    }
  }

  // ---- 1.3.0 invalid-data whole-key drop (index_schema.cc:713-727) ----

  test("invalid_data_drops_key: pre-1.3.0 treats the bad FIELD as missing, " +
      "keeping the key; FT.INFO counts the failure either way") {
    def keys(q: String): Set[String] =
      cmds.execute(Seq("FT.SEARCH", "legacyidx", q, "NOCONTENT", "DIALECT", "2"))
        .asInstanceOf[graft.engine.SearchEngine.SearchReply]
        .rows.map(_.getString(0)).toSet
    // fixed mode (default): e2's num "not_a_number" drops the key whole
    assert(cmds.execute(Seq("FT.CREATE", "legacyidx", "SCHEMA",
      "num", "NUMERIC", "s", "TEXT")) == "OK")
    assert(keys("-@num:[0 100]") == Set.empty) // whole-key drop: not even negated
    val fixedInfo = cmds.execute(Seq("FT.INFO", "legacyidx"))
      .asInstanceOf[DataFrame].collect().head
    assert(fixedInfo.getAs[Long]("num_docs") == 2)
    assert(fixedInfo.getAs[Long]("hash_indexing_failures") == 1)
    cmds.execute(Seq("FT.DROPINDEX", "legacyidx"))

    pinned("1.2.1") { // below 1.3.0: legacy missing-field semantics
      assert(cmds.execute(Seq("FT.CREATE", "legacyidx", "SCHEMA",
        "num", "NUMERIC", "s", "TEXT")) == "OK")
      assert(keys("-@num:[0 100]") == Set("e2")) // present, field missing
      assert(keys("@s:xyz") == Set("e3")) // other fields of e2 still indexed
      val info = cmds.execute(Seq("FT.INFO", "legacyidx"))
        .asInstanceOf[DataFrame].collect().head
      assert(info.getAs[Long]("num_docs") == 3) // key kept in the index
      assert(info.getAs[Long]("hash_indexing_failures") == 1) // still counted
      cmds.execute(Seq("FT.DROPINDEX", "legacyidx"))
      ()
    }
  }

  // ---- compatibility INFO counters ----

  test("legacy use bumps the compatibility-<label> counter; INFO surfaces it") {
    val before = Metrics.legacyUses("timefmt_empty_format_to_nil")
    pinned("1.2.0") { applyS("timefmt(0, '%Y')") }
    val after = Metrics.legacyUses("timefmt_empty_format_to_nil")
    assert(after > before) // compiled-site count (see Metrics scaladoc)
    val info = cmds.execute(Seq("INFO")).asInstanceOf[DataFrame]
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(info.contains("compatibility-timefmt_empty_format_to_nil"))
    // fixed mode compiles the fixed branch: counter stays put
    applyS("timefmt(0, '%Y')")
    assert(Metrics.legacyUses("timefmt_empty_format_to_nil") == after)
  }
}
