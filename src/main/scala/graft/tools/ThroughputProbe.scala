package graft.tools

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{Commands, SearchEngine}
import graft.resp.{RespCommands, RespServer}

/**
 * RESP endpoint throughput probe — the shape of the reference's
 * endurance harness (scripts/benchmark/run_endurance_test.sh drives
 * memtier with env-driven threads/clients/pipeline depth; the repo
 * publishes no numbers, BASELINE.md) against [[RespServer]]: T client
 * threads × persistent connections × depth-P pipelined FT.SEARCH over
 * the sf documents fixture, reporting aggregate qps and per-request
 * latency. Honest framing: each request is a Spark job over the
 * persisted relation — per-request latency is scheduler-bound
 * (~tens of ms), and throughput comes from concurrent jobs sharing
 * 32 cores, not from a lock-free in-memory read path.
 */
object ThroughputProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threads = sys.env.getOrElse("PROBE_THREADS", "8").toInt
    val pipeline = sys.env.getOrElse("PROBE_PIPELINE", "4").toInt
    val reqsPerThread = sys.env.getOrElse("PROBE_REQS", "200").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val engine = new SearchEngine
    val cmds = new Commands(engine, _ => (docs, col("doc_id")))
    val server = new RespServer(new RespCommands(engine, cmds))
    val port = server.start()
    require(cmds.execute(Seq("FT.CREATE", "tp_idx", "SCHEMA",
      "text", "TEXT", "lang", "TAG", "n_chars", "NUMERIC")) == "OK")

    val queries = Array(
      Seq("FT.SEARCH", "tp_idx", "@text:dup", "NOCONTENT", "LIMIT", "0", "10"),
      Seq("FT.SEARCH", "tp_idx", "@lang:{en} @n_chars:[100 500]",
        "NOCONTENT", "LIMIT", "0", "10"),
      Seq("FT.SEARCH", "tp_idx", "@text:agg @lang:{en}", "NOCONTENT",
        "LIMIT", "0", "10"),
      Seq("FT.SEARCH", "tp_idx", "*", "NOCONTENT", "LIMIT", "0", "5"))

    def writeArgv(out: java.io.OutputStream, a: Seq[String]): Unit = {
      out.write(s"*${a.length}\r\n".getBytes(UTF_8))
      a.foreach { s =>
        val b = s.getBytes(UTF_8)
        out.write(s"$$${b.length}\r\n".getBytes(UTF_8))
        out.write(b); out.write("\r\n".getBytes(UTF_8))
      }
    }
    def skipReply(in: InputStream): Unit = {
      def line(): String = {
        val sb = new StringBuilder
        var b = in.read()
        while (b >= 0 && b != '\r') { sb.append(b.toChar); b = in.read() }
        in.read(); sb.toString
      }
      in.read().toChar match {
        case '+' | '-' | ':' => line(); ()
        case '$' =>
          val n = line().toInt
          if (n >= 0) { var i = 0; while (i < n + 2) { in.read(); i += 1 } }
        case '*' =>
          val n = line().toInt
          (0 until n).foreach(_ => skipReply(in))
        case _ => sys.error("bad reply")
      }
    }

    // warm: one run of each query shape (index build + relation persist)
    queries.foreach { q =>
      val s = new Socket("127.0.0.1", port)
      val o = new BufferedOutputStream(s.getOutputStream)
      val i = new BufferedInputStream(s.getInputStream)
      writeArgv(o, q); o.flush(); skipReply(i); s.close()
    }

    val done = new AtomicLong(0)
    val nanos = new AtomicLong(0)
    val t0 = System.nanoTime()
    val workers = (0 until threads).map { tid =>
      new Thread(() => {
        val s = new Socket("127.0.0.1", port)
        s.setTcpNoDelay(true)
        val o = new BufferedOutputStream(s.getOutputStream)
        val i = new BufferedInputStream(s.getInputStream)
        var sent = 0
        while (sent < reqsPerThread) {
          val burst = math.min(pipeline, reqsPerThread - sent)
          val q0 = System.nanoTime()
          (0 until burst).foreach { j =>
            writeArgv(o, queries((sent + j + tid) % queries.length))
          }
          o.flush()
          (0 until burst).foreach(_ => skipReply(i))
          nanos.addAndGet(System.nanoTime() - q0)
          done.addAndGet(burst)
          sent += burst
        }
        s.close()
      })
    }
    workers.foreach(_.start()); workers.foreach(_.join())
    val wall = (System.nanoTime() - t0) / 1e9
    val n = done.get()
    println(f"PROBE threads=$threads pipeline=$pipeline reqs=$n " +
      f"wall=$wall%.1f s qps=${n / wall}%.0f " +
      f"latency_per_pipelined_req=${nanos.get / 1e6 / n}%.1f ms")

    // Paging workload: every request a DISTINCT page offset of one
    // filter, so the reply cache never hits — what a client walking
    // results costs. With the filtered-base cache each page is one
    // LocalRelation-sized job over the cached narrow base; without it,
    // each page re-pays the corpus scan.
    val pageReqs = sys.env.getOrElse("PROBE_PAGE_REQS", "100").toInt
    def pagingPhase(label: String): Unit = {
      val pdone = new AtomicLong(0)
      val p0 = System.nanoTime()
      val ws = (0 until threads).map { tid =>
        new Thread(() => {
          val s = new Socket("127.0.0.1", port)
          s.setTcpNoDelay(true)
          val o = new BufferedOutputStream(s.getOutputStream)
          val i = new BufferedInputStream(s.getInputStream)
          var sent = 0
          while (sent < pageReqs) {
            val burst = math.min(pipeline, pageReqs - sent)
            (0 until burst).foreach { j =>
              val off = (tid * pageReqs + sent + j) * 10
              writeArgv(o, Seq("FT.SEARCH", "tp_idx", "@text:dup",
                "NOCONTENT", "LIMIT", off.toString, "10"))
            }
            o.flush()
            (0 until burst).foreach(_ => skipReply(i))
            pdone.addAndGet(burst)
            sent += burst
          }
          s.close()
        })
      }
      ws.foreach(_.start()); ws.foreach(_.join())
      val pw = (System.nanoTime() - p0) / 1e9
      println(f"PROBE paging($label) reqs=${pdone.get} wall=$pw%.1f s " +
        f"qps=${pdone.get / pw}%.0f")
    }
    pagingPhase("base_cache_on")
    engine.baseCacheEnabled = false
    pagingPhase("base_cache_off")
    engine.baseCacheEnabled = true
    server.stop()
    spark.stop()
  }
}
