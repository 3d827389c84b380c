package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.functions._

/**
 * Engine-free reproducer candidate for the r13 InterleaveSoak finding
 * (total counted, page collected EMPTY, retry heals): N threads each
 * loop { persist a fresh DataFrame object of the SAME logical plan →
 * count → limit-collect → unpersist }. Plan-equal persists share ONE
 * CacheManager entry, so every thread's unpersist races every other
 * thread's collect through Spark's InMemoryRelation — exactly the
 * lifecycle searchReply's full-base path runs under concurrent
 * requests plus createIndex's dropCachedBases.
 */
object PersistRaceProbe {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.map(_.toInt).getOrElse(16)
    val secs = args.lift(1).map(_.toInt).getOrElse(120)
    val spark = graft.util.GraftSession.builder("24").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = (1 to 24).map(i => (s"k$i", i.toDouble)).toDF("k", "p")
    val iters = new AtomicLong; val empties = new AtomicLong
    val badCounts = new AtomicLong
    @volatile var stop = false
    val ts = (0 until threads).map { _ =>
      new Thread(() => {
        while (!stop) {
          val base = docs.filter(col("p") >= 2 && col("p") <= 9).limit(1001)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val n = base.count()
            val page = base.limit(1000).collect()
            if (n != 8) badCounts.incrementAndGet()
            if (page.isEmpty && n > 0) empties.incrementAndGet()
          } finally base.unpersist(blocking = false)
          iters.incrementAndGet()
        }
      })
    }
    ts.foreach(_.start())
    Thread.sleep(secs * 1000L)
    stop = true; ts.foreach(_.join())
    println(s"PERSIST_RACE iters=${iters.get()} empties=${empties.get()} " +
      s"badCounts=${badCounts.get()}")
    spark.stop()
  }
}
