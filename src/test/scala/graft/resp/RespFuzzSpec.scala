package graft.resp

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{Socket, SocketTimeoutException}
import java.nio.charset.StandardCharsets.ISO_8859_1

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Commands, SearchEngine}

/**
 * Framing fuzz over the real socket: 300 seeded random byte blobs —
 * raw garbage, mangled RESP arrays (bad lengths, truncated bulks,
 * negative counts, huge declared sizes), and valid-prefix-then-junk —
 * must each produce only well-formed error replies or a clean close,
 * never a hang or a server crash; after every blob the server still
 * answers a valid FT.SEARCH on a fresh connection. Deterministic
 * (fixed seed) so a failure reproduces.
 */
class RespFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var server: RespServer = _
  private var port: Int = 0

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("resp-fuzz-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark; import sp.implicits._
    val docs = Seq(("k1", "alpha"), ("k2", "beta")).toDF("__key", "body")
    val engine = new SearchEngine
    val cmds = new Commands(engine, _ => (docs, col("__key")))
    server = new RespServer(new RespCommands(engine, cmds))
    port = server.start()
    require(cmds.execute(Seq("FT.CREATE", "fz_idx", "SCHEMA", "body", "TEXT")) == "OK")
  }
  override def afterAll(): Unit = if (server != null) server.stop()

  private def sendBlob(blob: Array[Byte]): Unit = {
    val s = new Socket("127.0.0.1", port)
    s.setSoTimeout(5000) // a hang = SocketTimeoutException = test failure
    try {
      val o = new BufferedOutputStream(s.getOutputStream)
      o.write(blob); o.flush()
      s.shutdownOutput()
      val i = new BufferedInputStream(s.getInputStream)
      // drain whatever the server says until it closes; replies must be
      // bytes, not an exception other than clean EOF
      val buf = new Array[Byte](4096)
      var n = i.read(buf)
      while (n >= 0) n = i.read(buf)
    } finally s.close()
  }

  private def healthy(): Boolean = {
    val s = new Socket("127.0.0.1", port)
    s.setSoTimeout(5000)
    try {
      val o = new BufferedOutputStream(s.getOutputStream)
      val req = "*4\r\n$9\r\nFT.SEARCH\r\n$6\r\nfz_idx\r\n$11\r\n@body:alpha\r\n$9\r\nNOCONTENT\r\n"
      o.write(req.getBytes(ISO_8859_1)); o.flush()
      val i = new BufferedInputStream(s.getInputStream)
      val first = i.read()
      first == '*' // well-formed array reply
    } finally s.close()
  }

  test("300 seeded framing blobs: no hang, no crash, server stays healthy") {
    val rnd = new scala.util.Random(0x5eed)
    def randomBlob(): Array[Byte] = rnd.nextInt(6) match {
      case 0 => // pure garbage
        Array.fill(rnd.nextInt(200) + 1)(rnd.nextInt(256).toByte)
      case 1 => // RESP array with a lying element count
        s"*${rnd.nextInt(100) + 2}\r\n$$4\r\nPING\r\n".getBytes(ISO_8859_1)
      case 2 => // truncated bulk (declared longer than sent)
        s"*1\r\n$$${rnd.nextInt(5000) + 10}\r\nhi\r\n".getBytes(ISO_8859_1)
      case 3 => // negative / non-numeric lengths
        val bad = Seq("*-3\r\n", "$-2\r\n", "*x\r\n", "$\r\n", "*2\r\n$abc\r\nzz\r\n")
        bad(rnd.nextInt(bad.length)).getBytes(ISO_8859_1)
      case 4 => // valid command then mid-frame junk
        ("*1\r\n$4\r\nPING\r\n*2\r\n$3\r\nFT." +
          new String(Array.fill(rnd.nextInt(30))(
            (rnd.nextInt(94) + 33).toChar))).getBytes(ISO_8859_1)
      case 5 => // inline line of random printable junk
        (new String(Array.fill(rnd.nextInt(80) + 1)(
          (rnd.nextInt(94) + 33).toChar)) + "\r\n").getBytes(ISO_8859_1)
    }
    (1 to 300).foreach { i =>
      try sendBlob(randomBlob())
      catch {
        case _: SocketTimeoutException => fail(s"blob $i: server hang (no reply, no close)")
      }
    }
    assert(healthy(), "server must answer a valid FT.SEARCH after the fuzz")
  }
}
