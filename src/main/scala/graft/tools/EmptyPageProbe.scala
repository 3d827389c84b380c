package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import graft.engine.SearchOptions

/**
 * Minimal reproducer for the InterleaveSoak finding (r13): under
 * maintainer churn, a searchReply full-base page occasionally collects
 * EMPTY while its total counts correctly (retry heals — transient).
 * Quadrant knobs localize the faulty component:
 *   args: seed versions readers baseCache(0/1) replyCache(0/1) route(0/1)
 */
object EmptyPageProbe {
  def main(args: Array[String]): Unit = {
    val seed = args.headOption.map(_.toLong).getOrElse(7L)
    val versions = args.lift(1).map(_.toInt).getOrElse(300)
    val readers = args.lift(2).map(_.toInt).getOrElse(8)
    val useBase = args.lift(3).forall(_ == "1")
    val useReply = args.lift(4).forall(_ == "1")
    val route = args.lift(5).forall(_ == "1")
    val spark = graft.util.GraftSession.builder("24").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = new graft.engine.SearchEngine
    e.baseCacheEnabled = useBase
    e.replyCacheEnabled = useReply
    e.postingRouteMaxSelectivity = if (route) 1.0 else 0.0
    InterleaveSoak.registerVersionPublic(spark, e, 1)
    val lastStarted = new AtomicInteger(1)
    val empties = new AtomicLong
    val queries = new AtomicLong
    @volatile var done = false
    @volatile var firstDetail: Option[String] = None

    val writer = new Thread(() => {
      var v = 2
      while (v <= versions) {
        lastStarted.set(v)
        InterleaveSoak.registerVersionPublic(spark, e, v)
        v += 1
      }
      done = true
    }, "probe-writer")

    val qs = Seq(
      "@body:prew*" -> 8, // suffix-posting route
      "@body:alpha @cat:{hot}" -> 2, // AND of two term/tag postings
      "@price:[2 5]" -> 4) // scan path (numeric never routes)
    val rts = (0 until readers).map { r =>
      new Thread(() => {
        val rnd = new scala.util.Random(seed + r)
        while (!done) {
          val (q, want) = qs(rnd.nextInt(qs.length))
          val reply = e.searchReply("soak_t", q, SearchOptions(limit = (0, 24)))
          queries.incrementAndGet()
          if (reply.rows.isEmpty && reply.total > 0) {
            empties.incrementAndGet()
            if (firstDetail.isEmpty)
              firstDetail = Some(s"q='$q' want=$want total=${reply.total} " +
                s"v~${lastStarted.get()}")
          }
        }
      }, s"probe-reader-$r")
    }
    val t0 = System.nanoTime()
    writer.start(); rts.foreach(_.start())
    writer.join(); rts.foreach(_.join())
    println(f"PROBE base=$useBase reply=$useReply route=$route " +
      f"queries=${queries.get()} empties=${empties.get()} " +
      f"secs=${(System.nanoTime() - t0) / 1e9}%.1f detail=${firstDetail.getOrElse("-")}")
    spark.stop()
  }
}
