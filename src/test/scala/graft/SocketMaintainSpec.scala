package graft

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Commands, SearchEngine}
import graft.resp.{RespCommands, RespServer}

/**
 * Serve-while-maintaining through the wire: the full deployment story
 * — an Ingest-maintained doc state, FT.CREATE ... MAINTAIN issued as
 * RESP2 bytes, change batches applied by the maintenance hook, and
 * concurrent socket clients querying throughout — in one suite. This
 * is the composition the reference runs as a server: keyspace events
 * mutate indexes while FT.SEARCH traffic is live
 * (index_schema.cc subscription processing + ft_search.cc serving),
 * re-expressed as Ingest state + Maintainer.onBatch + RespServer.
 *
 * The concurrency assertion is deliberately the INVARIANT query (its
 * result is identical before/after the batch): maintenance applies
 * store-by-store, not as one atomic swap, so a query racing the batch
 * may legitimately observe a mix of old/new stores for a changing
 * term. What the engine does guarantee — replies stay well-formed,
 * connections never break, invariant results never flicker, and the
 * post-batch state is exact — is what the suite pins.
 */
class SocketMaintainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var server: RespServer = _
  private var port: Int = 0
  private var cmds: Commands = _
  private var statePath: String = _
  private var derivedDir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("socket-maintain-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark; import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("sock-maintain").toString
    statePath = s"$tmp/state"
    derivedDir = s"$tmp/derived"
    streaming.Ingest.backfill(
      Seq(("d1", "hash join plan"), ("d2", "sort merge join"))
        .toDF("__key", "txt"), statePath, nBuckets = 4)
    val engine = new SearchEngine
    cmds = new Commands(engine,
      _ => (streaming.Ingest.readState(spark, statePath), col("__key")))
    server = new RespServer(new RespCommands(engine, cmds))
    port = server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop()

  // ---- minimal RESP2 client (same framing CompatSocketSpec pins) ----

  private def writeArgv(out: OutputStream, args: Seq[String]): Unit = {
    out.write(s"*${args.length}\r\n".getBytes(UTF_8))
    args.foreach { a =>
      val b = a.getBytes(UTF_8)
      out.write(s"$$${b.length}\r\n".getBytes(UTF_8))
      out.write(b)
      out.write("\r\n".getBytes(UTF_8))
    }
  }

  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var b = in.read()
    while (b >= 0 && b != '\r') { sb.append(b.toChar); b = in.read() }
    assert(b == '\r' && in.read() == '\n', "malformed reply line")
    sb.toString
  }

  private def readReply(in: InputStream): Any = {
    val t = in.read()
    assert(t >= 0, "EOF before reply")
    val head = readLine(in)
    t.toChar match {
      case '+' => head
      case '-' => ("ERR", head)
      case ':' => head.toLong
      case '$' =>
        val n = head.toInt
        if (n < 0) null
        else {
          val buf = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = in.read(buf, off, n - off); assert(r >= 0); off += r
          }
          assert(in.read() == '\r' && in.read() == '\n')
          new String(buf, UTF_8)
        }
      case '*' => Vector.fill(head.toInt)(readReply(in))
      case c => fail(s"unknown reply type '$c'")
    }
  }

  /** One command on a fresh connection. */
  private def cmd(args: String*): Any = {
    val sock = new Socket("127.0.0.1", port)
    try {
      val out = new BufferedOutputStream(sock.getOutputStream)
      val in = new BufferedInputStream(sock.getInputStream)
      writeArgv(out, args); out.flush()
      readReply(in)
    } finally sock.close()
  }

  private def searchKeys(query: String): Set[String] = {
    val got = cmd("FT.SEARCH", "live_idx", query, "NOCONTENT", "DIALECT", "2")
      .asInstanceOf[Vector[Any]]
    got.tail.map(_.toString).toSet
  }

  test("FT.CREATE MAINTAIN over the wire; search sees the backfilled state") {
    assert(cmd("FT.CREATE", "live_idx", "MAINTAIN", derivedDir,
      "SCHEMA", "txt", "TEXT") == "OK")
    assert(cmds.maintainer("live_idx").isDefined)
    assert(searchKeys("@txt:hash") == Set("d1"))
    assert(searchKeys("@txt:merge") == Set("d2"))
  }

  test("a change batch is visible over the wire with no re-create") {
    val sp = spark; import sp.implicits._
    // Ingest contract: state commits first, then onBatch
    streaming.Ingest.backfill(
      Seq(("d2", "sort merge join"), ("d3", "hash aggregate path"))
        .toDF("__key", "txt"), statePath, nBuckets = 4)
    cmds.maintainer("live_idx").get.onBatch(Seq(
      ("upsert", "d3", "hash aggregate path", 1L),
      ("delete", "d1", null.asInstanceOf[String], 2L))
      .toDF("op", "__key", "txt", "__seq"))
    // new connections: the maintained index answers with the new state
    assert(searchKeys("@txt:hash") == Set("d3"))
    assert(searchKeys("@txt:merge") == Set("d2"))
    assert(cmd("FT.SEARCH", "live_idx", "@txt:plan", "NOCONTENT")
      .asInstanceOf[Vector[Any]].head == 0L)
  }

  test("concurrent clients keep getting well-formed, invariant replies during a batch") {
    val sp = spark; import sp.implicits._
    val errs = new AtomicInteger(0)
    val wrong = new AtomicInteger(0)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    // d2/"merge" is untouched by the in-flight batch: its result set
    // must never flicker no matter how the stores interleave
    val readers = (1 to 4).map { _ =>
      new Thread(() => {
        while (!done.get) {
          try {
            val ks = searchKeys("@txt:merge")
            if (ks != Set("d2")) wrong.incrementAndGet()
          } catch { case _: Throwable => errs.incrementAndGet() }
        }
      })
    }
    readers.foreach(_.start())
    try {
      streaming.Ingest.backfill(
        Seq(("d2", "sort merge join"), ("d3", "hash aggregate path"),
          ("d4", "hash probe build"))
          .toDF("__key", "txt"), statePath, nBuckets = 4)
      cmds.maintainer("live_idx").get.onBatch(Seq(
        ("upsert", "d4", "hash probe build", 3L))
        .toDF("op", "__key", "txt", "__seq"))
    } finally {
      done.set(true)
      readers.foreach(_.join(30000))
    }
    assert(errs.get == 0, s"${errs.get} reader errors during maintenance")
    assert(wrong.get == 0, s"${wrong.get} flickers of the invariant query")
    // post-batch state is exact, through fresh connections
    assert(searchKeys("@txt:hash") == Set("d3", "d4"))
    assert(searchKeys("@txt:probe") == Set("d4"))
  }

  test("FT.DROPINDEX under concurrent query load: clean errors, no torn state") {
    // a second index the readers hammer while the first is dropped and
    // re-created — admin ops and queries share the synchronized catalog;
    // every reply must be either a valid result or a clean not-found
    // error, and the connection must survive both
    assert(cmd("FT.CREATE", "drop_idx", "SCHEMA", "txt", "TEXT") == "OK")
    val malformed = new AtomicInteger(0)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readers = (1 to 3).map { _ =>
      new Thread(() => {
        val sock = new Socket("127.0.0.1", port)
        try {
          val out = new BufferedOutputStream(sock.getOutputStream)
          val in = new BufferedInputStream(sock.getInputStream)
          while (!done.get) {
            writeArgv(out, Seq("FT.SEARCH", "drop_idx", "@txt:hash",
              "NOCONTENT"))
            out.flush()
            readReply(in) match {
              case v: Vector[_] => () // served from a live registration
              case ("ERR", _) => ()   // dropped mid-flight: clean error
              case other => malformed.incrementAndGet()
            }
          }
        } catch { case _: Throwable => malformed.incrementAndGet() }
        finally sock.close()
      })
    }
    readers.foreach(_.start())
    try {
      (1 to 5).foreach { _ =>
        assert(cmd("FT.DROPINDEX", "drop_idx") == "OK")
        assert(cmd("FT.CREATE", "drop_idx", "SCHEMA", "txt", "TEXT") == "OK")
      }
    } finally {
      done.set(true)
      readers.foreach(_.join(30000))
    }
    assert(malformed.get == 0, s"${malformed.get} malformed replies/errors")
    // final state serves exactly
    assert(cmd("FT.SEARCH", "drop_idx", "@txt:hash", "NOCONTENT")
      .asInstanceOf[Vector[Any]].head.asInstanceOf[Long] >= 1L)
  }
}
