package graft.tools

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{Commands, SearchEngine, SearchOptions}
import graft.resp.{RespCommands, RespServer}

/**
 * Serving under maintenance churn: the reply cache's eviction contract
 * (every maintainer batch re-registers via createIndex, bumping the
 * epoch and clearing the index's entries) means a serving workload
 * loses its cache once per batch and re-warms from the cold Spark-job
 * floor. This probe drives the ThroughputProbe workload while a
 * maintainer thread applies a state+onBatch cycle every
 * PROBE_BATCH_MS, and reports qps, the reply-cache hit rate, and a
 * freshness check (a key upserted by the final batch must be served
 * over the wire after the stream quiesces).
 */
object ChurnProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threads = sys.env.getOrElse("PROBE_THREADS", "8").toInt
    val pipeline = sys.env.getOrElse("PROBE_PIPELINE", "4").toInt
    val reqsPerThread = sys.env.getOrElse("PROBE_REQS", "2000").toInt
    val batchMs = sys.env.getOrElse("PROBE_BATCH_MS", "500").toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // maintained shape: DocState-backed relation + IndexMaintainer
    val statePath = java.nio.file.Files
      .createTempDirectory("graft-churn-state").toString + "/state"
    val derived = java.nio.file.Files
      .createTempDirectory("graft-churn-derived").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("string").as("__key"), col("text"),
        col("lang"), col("n_chars").cast("double").as("n_chars"))
    val state = graft.streaming.DocState.init(docs, statePath, 64)
    val engine = new SearchEngine
    val cmds = new Commands(engine,
      _ => (graft.streaming.Ingest.readState(spark, statePath), col("__key")))
    require(cmds.execute(Seq("FT.CREATE", "tp_idx", "SCHEMA",
      "text", "TEXT", "lang", "TAG", "n_chars", "NUMERIC")) == "OK")
    val schema = engine.schemaOf("tp_idx")
    val maintainer = new graft.streaming.IndexMaintainer(engine, "tp_idx",
      schema,
      docsSource = Some(() => graft.streaming.Ingest.readState(spark, statePath)),
      statsDir = Some(derived))
    val server = new RespServer(new RespCommands(engine, cmds))
    val port = server.start()

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
        case c => sys.error(s"bad reply '$c'")
      }
    }

    // warm one pass
    queries.foreach { q =>
      val s = new Socket("127.0.0.1", port)
      val o = new BufferedOutputStream(s.getOutputStream)
      val i = new BufferedInputStream(s.getInputStream)
      writeArgv(o, q); o.flush(); skipReply(i); s.close()
    }

    // maintainer churn thread: one batch per interval (the Ingest
    // contract: state commits first, then onBatch)
    val stopChurn = new AtomicBoolean(false)
    val batches = new AtomicLong(0)
    var seq = 0L
    val churn = new Thread(() => {
      import spark.implicits._
      while (!stopChurn.get) {
        seq += 1
        val b = (0 until 50)
          .map(i => ("upsert", s"churn${seq}_$i", s"churn dup text $i", "en",
            150.0, seq))
          .toDF("op", "__key", "text", "lang", "n_chars", "__seq")
        state.applyBatch(b)
        maintainer.onBatch(b)
        batches.incrementAndGet()
        Thread.sleep(batchMs)
      }
    }, "churn")
    churn.setDaemon(true)

    val h0 = engine.replyCacheHits.get()
    val m0 = engine.replyCacheMisses.get()
    val done = new AtomicLong(0)
    val t0 = System.nanoTime()
    churn.start()
    val workers = (0 until threads).map { tid =>
      new Thread(() => {
        val s = new Socket("127.0.0.1", port)
        s.setTcpNoDelay(true)
        val o = new BufferedOutputStream(s.getOutputStream)
        val i = new BufferedInputStream(s.getInputStream)
        var sent = 0
        while (sent < reqsPerThread) {
          val burst = math.min(pipeline, reqsPerThread - sent)
          (0 until burst).foreach { j =>
            writeArgv(o, queries((sent + j + tid) % queries.length))
          }
          o.flush()
          (0 until burst).foreach(_ => skipReply(i))
          done.addAndGet(burst)
          sent += burst
        }
        s.close()
      })
    }
    workers.foreach(_.start()); workers.foreach(_.join())
    val wall = (System.nanoTime() - t0) / 1e9
    stopChurn.set(true); churn.join()
    val hits = engine.replyCacheHits.get() - h0
    val misses = engine.replyCacheMisses.get() - m0
    println(f"PROBE churn threads=$threads pipeline=$pipeline reqs=${done.get()} " +
      f"wall=$wall%.1f s qps=${done.get() / wall}%.0f batches=${batches.get()} " +
      f"hit_rate=${hits.toDouble / math.max(1, hits + misses)}%.3f")

    // freshness over the wire: the last batch's keys must be served
    val fresh = engine.searchReply("tp_idx", "@text:churn",
      SearchOptions(limit = (0, 5), noContent = true))
    println(s"PROBE freshness last_batch_visible=${fresh.total > 0} " +
      s"total=${fresh.total}")
    server.stop()
    spark.stop()
  }
}
