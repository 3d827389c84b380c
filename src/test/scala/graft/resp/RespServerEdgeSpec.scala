package graft.resp

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.ISO_8859_1

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Commands, SearchEngine}

/**
 * Transport edge cases from the round-11 review: bare-LF inline
 * commands (Redis accepts them; CR-only termination deadlocked the
 * connection), EOF-truncated inline lines must never execute, and the
 * PARAMS-clause locator must not be preempted by a query string that
 * merely equals "params" (structural validation: index ≥ 3, positive
 * even count, value slots present; last valid candidate wins).
 */
class RespServerEdgeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var server: RespServer = _
  private var port: Int = 0

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("resp-edge-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark; import sp.implicits._
    val docs = Seq(("k1", "params"), ("k2", "other")).toDF("__key", "body")
    val engine = new SearchEngine
    val cmds = new Commands(engine, _ => (docs, col("__key")))
    server = new RespServer(new RespCommands(engine, cmds))
    port = server.start()
    cmds.execute(Seq("FT.CREATE", "edge_t", "SCHEMA", "body", "TEXT"))
    ()
  }
  override def afterAll(): Unit = if (server != null) server.stop()

  private def withConn[T](f: (BufferedOutputStream, BufferedInputStream) => T): T = {
    val s = new Socket("127.0.0.1", port)
    s.setSoTimeout(10000)
    try f(new BufferedOutputStream(s.getOutputStream),
      new BufferedInputStream(s.getInputStream))
    finally s.close()
  }

  private def readReplyLine(in: BufferedInputStream): String = {
    val sb = new StringBuilder
    var b = in.read()
    while (b >= 0 && b != '\n') { sb.append(b.toChar); b = in.read() }
    sb.toString.stripSuffix("\r")
  }

  test("bare-LF inline command gets a reply (no CR required)") {
    withConn { (out, in) =>
      out.write("PING\n".getBytes(ISO_8859_1)); out.flush()
      assert(readReplyLine(in) == "+PONG")
      // and pipelined bare-LF inline commands stay separate
      out.write("PING\nPING\n".getBytes(ISO_8859_1)); out.flush()
      assert(readReplyLine(in) == "+PONG")
      assert(readReplyLine(in) == "+PONG")
    }
  }

  test("CRLF inline command still works") {
    withConn { (out, in) =>
      out.write("PING hello\r\n".getBytes(ISO_8859_1)); out.flush()
      val l = readReplyLine(in)
      assert(l == "$5", s"got $l") // bulk echo of the argument
    }
  }

  test("EOF-truncated inline line is never executed") {
    // half a command then close: the server must drop it silently —
    // provable from a second connection still serving normally
    withConn { (out, _) =>
      out.write("FT.DROPINDEX edge_t".getBytes(ISO_8859_1)); out.flush()
    } // no newline → truncated → must NOT execute
    withConn { (out, in) =>
      out.write("FT._LIST\r\n".getBytes(ISO_8859_1)); out.flush()
      assert(readReplyLine(in) == "*1") // edge_t still exists
      assert(readReplyLine(in) == "$6")
      assert(readReplyLine(in) == "edge_t")
    }
  }

  test("decodeArgv: a query string equal to 'params' does not preempt the real PARAMS clause") {
    def b(s: String) = s.getBytes(ISO_8859_1)
    // FT.SEARCH idx params PARAMS 2 v <binary> — the binary value must
    // decode ISO-8859-1 (byte-preserving), not strict-UTF-8-or-fallback
    val blob = Array[Byte](0x41, (0xC3 & 0xFF).toByte, (0xA9 & 0xFF).toByte, 0x42) // valid UTF-8 "AéB"
    val argv = RespServer.decodeArgv(Seq(
      b("FT.SEARCH"), b("edge_t"), b("params"),
      b("PARAMS"), b("2"), b("v"), blob))
    // byte-preserving decode: each input byte one char
    assert(argv(6).length == 4, s"param value was UTF-8-decoded: '${argv(6)}'")
    assert(argv(6).toCharArray.map(_.toInt).toSeq == Seq(0x41, 0xC3, 0xA9, 0x42))
    // and the accidental 'params' query token decodes as ordinary text
    assert(argv(2) == "params")
  }

  test("decodeArgv: structurally invalid 'params' tokens are ignored") {
    def b(s: String) = s.getBytes(ISO_8859_1)
    // 'params' followed by a non-integer: no clause at all → all UTF-8
    val argv = RespServer.decodeArgv(Seq(
      b("FT.SEARCH"), b("edge_t"), b("q"), b("params"), b("LIMIT"),
      b("0"), b("10")))
    assert(argv == Seq("FT.SEARCH", "edge_t", "q", "params", "LIMIT", "0", "10"))
  }
}
