package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Commands, SearchEngine}
import graft.resp.{Resp, RespCommands}

/**
 * RESP2 wire adapter (round-9 verdict #7 stretch): the byte replies
 * must frame exactly as the reference renders them — FT.SEARCH
 * `[total, key, fields…]` with NOCONTENT / WITHSORTKEYS / KNN-score
 * variants (ft_search.cc:40-190), FT.AGGREGATE `[n, [name, value,…]…]`
 * (ft_aggregate.cc:369-404), FT.INFO pairs with nested prefixes,
 * error replies with the reference's message text. A tiny RESP parser
 * below validates framing byte-for-byte.
 */
class RespSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var resp: RespCommands = _
  private var engine: SearchEngine = _

  // minimal RESP2 reader: returns (value, remaining)
  private def parse(b: Array[Byte]): (Any, Array[Byte]) = {
    val s = new String(b, UTF_8)
    val nl = s.indexOf("\r\n")
    val (head, rest) = (s.substring(1, nl), b.drop(nl + 2))
    s.charAt(0) match {
      case '+' => (head, rest)
      case '-' => (("ERR", head), rest)
      case ':' => (head.toLong, rest)
      case '$' =>
        val n = head.toInt
        if (n < 0) (null, rest)
        else (new String(rest.take(n), UTF_8), rest.drop(n + 2))
      case '*' =>
        var r = rest
        val items = (0 until head.toInt).map { _ =>
          val (v, r2) = parse(r); r = r2; v
        }
        (items.toVector, r)
    }
  }
  private def decode(b: Array[Byte]): Any = {
    val (v, rest) = parse(b)
    assert(rest.isEmpty, s"trailing bytes: ${new String(rest, UTF_8)}")
    v
  }

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("resp-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark; import sp.implicits._
    val docs = Seq(
      ("k1", "merge fast", 10L, Array.fill(4)(0.1f)),
      ("k2", "merge slow", 25L, Array.fill(4)(0.9f)),
      ("k3", "quick query", 40L, Array.fill(4)(0.5f)))
      .toDF("pk", "body", "size", "vec")
    engine = new SearchEngine
    val cmds = new Commands(engine, _ => (docs, col("pk")))
    resp = new RespCommands(engine, cmds)
    cmds.execute(Seq("FT.CREATE", "r_t", "SCHEMA", "body", "TEXT",
      "size", "NUMERIC", "vec", "VECTOR", "FLAT", "6",
      "TYPE", "FLOAT32", "DIM", "4", "DISTANCE_METRIC", "L2"))
    ()
  }
  override def afterAll(): Unit = ()

  test("fmtG matches C %.12g trimming") {
    assert(Resp.fmtG(0.25) == "0.250000000000".replaceAll("0+$", "") || Resp.fmtG(0.25) == "0.25")
    assert(Resp.fmtG(0.25) == "0.25")
    assert(Resp.fmtG(1.0) == "1")
    assert(Resp.fmtG(1e-7) == "1.00000000000e-07".replace("1.00000000000", "1") || Resp.fmtG(1e-7) == "1e-07")
  }

  test("FT.SEARCH NOCONTENT: [total, keys...]") {
    val got = decode(resp.execute(Seq("FT.SEARCH", "r_t", "@size:[20 50]",
      "NOCONTENT", "SORTBY", "size", "ASC")))
    assert(got == Vector(2L, "k2", "k3"))
  }

  test("FT.SEARCH with content: per-key field arrays, nil attrs skipped") {
    val got = decode(resp.execute(Seq("FT.SEARCH", "r_t", "@size:[20 30]",
      "RETURN", "2", "body", "size")))
    got match {
      case Vector(total, key, fields: Vector[_]) =>
        assert(total == 1L && key == "k2")
        assert(fields == Vector("body", "merge slow", "size", "25"))
      case other => fail(s"unexpected shape: $other")
    }
  }

  test("FT.SEARCH WITHSORTKEYS inserts #sortkey after each key") {
    val got = decode(resp.execute(Seq("FT.SEARCH", "r_t", "@size:[20 50]",
      "SORTBY", "size", "ASC", "WITHSORTKEYS", "NOCONTENT")))
    // reference: WITHSORTKEYS applies to content replies; our engine
    // emits __sortkey only when requested — NOCONTENT branch returns
    // keys only, so use the content form for the 3-element shape
    val got2 = decode(resp.execute(Seq("FT.SEARCH", "r_t", "@size:[20 50]",
      "SORTBY", "size", "ASC", "WITHSORTKEYS", "RETURN", "1", "size")))
    got2 match {
      case Vector(total, k1, sk1, f1: Vector[_], k2, sk2, f2: Vector[_]) =>
        assert(total == 2L)
        assert(Seq(k1, k2) == Seq("k2", "k3"))
        assert(Seq(sk1, sk2) == Seq("#25", "#40"))
        assert(f1 == Vector("size", "25") && f2 == Vector("size", "40"))
      case other => fail(s"unexpected shape: $other")
    }
    assert(got.asInstanceOf[Vector[_]].head == 2L)
  }

  test("FT.SEARCH KNN: score pair leads the field array, %.12g formatted") {
    val buf = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 4).foreach(_ => buf.putFloat(0.1f))
    val blob = new String(buf.array(), java.nio.charset.StandardCharsets.ISO_8859_1)
    val got = decode(resp.execute(Seq("FT.SEARCH", "r_t",
      "*=>[KNN 2 @vec $q AS d]", "PARAMS", "2", "q", blob,
      "RETURN", "2", "d", "size")))
    got match {
      case Vector(total, k1, f1: Vector[_], k2, f2: Vector[_]) =>
        assert(total == 2L)
        assert(k1 == "k1") // exact match, distance 0
        assert(f1.take(2) == Vector("d", "0"))
        assert(f2.head == "d")
        assert(Seq(k1, k2).contains("k1"))
      case other => fail(s"unexpected shape: $other")
    }
  }

  test("full-content reply carries stored attributes only, no enrichment internals") {
    val got = decode(resp.execute(Seq("FT.SEARCH", "r_t", "@size:[20 30]")))
    got match {
      case Vector(total, key, fields: Vector[_]) =>
        assert(total == 1L && key == "k2")
        val names = fields.grouped(2).map(_.head.asInstanceOf[String]).toSet
        // the reference replies the doc's hash fields (attribute
        // contents) — never derived index state; pk rides as the key
        assert(!names.exists(_.startsWith("__")), s"internals leaked: $names")
        assert(names.contains("body") && names.contains("size"))
      case other => fail(s"unexpected shape: $other")
    }
  }

  test("FT.AGGREGATE: [n, [name, value...]...] with names as simple strings") {
    val got = decode(resp.execute(Seq("FT.AGGREGATE", "r_t", "*",
      "GROUPBY", "0", "REDUCE", "COUNT", "0", "AS", "n")))
    got match {
      case Vector(n, rec: Vector[_]) =>
        assert(n == 1L)
        assert(rec == Vector("n", "3"))
      case other => fail(s"unexpected shape: $other")
    }
  }

  test("FT.INFO: name/value pairs, prefixes nested; FT._LIST array; +OK; errors") {
    val info = decode(resp.execute(Seq("FT.INFO", "r_t"))).asInstanceOf[Vector[Any]]
    val asMap = info.grouped(2).map(p => (p(0), p(1))).toMap
    assert(asMap("index_name") == "r_t")
    assert(asMap("num_docs") == "3")
    assert(asMap("prefixes").isInstanceOf[Vector[_]])
    assert(decode(resp.execute(Seq("FT._LIST"))) == Vector("r_t"))
    val err = decode(resp.execute(Seq("FT.INFO", "nope")))
    assert(err == (("ERR", "Index with name 'nope' not found in database 0")))
    val ok = decode(resp.execute(Seq("FT.CREATE", "r_t2", "SCHEMA", "body", "TEXT")))
    assert(ok == "OK")
  }

  test("FT.INFO scope args: LOCAL + fanout flags accepted, PRIMARY/CLUSTER " +
      "rejected like a reference node without a cluster coordinator") {
    // the fanout flags are keyword flags in any order
    // (ft_info_parser.cc:33-76) and only modulate fanout — accepted
    // no-ops under LOCAL
    val info = decode(resp.execute(Seq("FT.INFO", "r_t", "LOCAL",
      "ALLSHARDS", "CONSISTENT"))).asInstanceOf[Vector[Any]]
    assert(info.grouped(2).map(p => (p(0), p(1))).toMap.apply("index_name") == "r_t")
    // non-cluster configuration: PRIMARY/CLUSTER are errors with the
    // reference's exact messages (ft_info_parser.cc:100-111)
    assert(decode(resp.execute(Seq("FT.INFO", "r_t", "PRIMARY"))) ==
      (("ERR", "PRIMARY option is not valid in this configuration")))
    assert(decode(resp.execute(Seq("FT.INFO", "r_t", "CLUSTER", "SOMESHARDS"))) ==
      (("ERR", "CLUSTER option is not valid in this configuration")))
    // anything else is an unexpected parameter (ft_info_parser.cc:94-97)
    assert(decode(resp.execute(Seq("FT.INFO", "r_t", "BOGUS"))) ==
      (("ERR", "Unexpected parameter: BOGUS")))
  }
}
