package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.engine.{PostingStats, SearchEngine, SearchOptions}

/**
 * The routing guard's stats tiers (round-4 scale finding: planning
 * must NEVER pay a posting-slice count job — [[PostingStats]]):
 * zero Spark jobs with the hot map, pushed point-reads past it,
 * no routing (not a count) with no stats, survival across restart.
 */
class PostingStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("posting-stats-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = ()

  /** Jobs started while `f` runs (listener bus drained both sides). */
  private def jobsDuring(f: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        n.incrementAndGet(); ()
      }
    }
    org.apache.spark.GraftTestBus.drain(spark.sparkContext)
    spark.sparkContext.addSparkListener(l)
    try { f; org.apache.spark.GraftTestBus.drain(spark.sparkContext) }
    finally spark.sparkContext.removeSparkListener(l)
    n.get()
  }

  private val opts = SearchOptions(limit = (0, 300), noContent = true)

  test("planning runs ZERO Spark jobs when hot stats are registered") {
    val e = Fixtures.engine(spark, sf)
    e.buildPostings("documents",
      java.nio.file.Files.createTempDirectory("graft-stats-zero").toString)
    // warm the per-index docCount cache + codegen (one collect)
    e.search("documents", "@text:dup @source:{src1}", opts).collect()

    // planning a routed query afterwards is pure driver work: hot-map
    // estimates, no posting-slice counts, no stats point-reads
    var routed = 0
    val jobs = jobsDuring {
      e.search("documents", "@text:dup @source:{src1}", opts)
      routed = e.lastRouteEstimates.length
    }
    assert(routed >= 2, s"both conjuncts should route, got $routed")
    assert(jobs == 0, s"planning ran $jobs Spark job(s); must be zero")
  }

  test("past the hot cap: estimates come from pushed stats-relation point-reads") {
    val e = Fixtures.engine(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-stats-rel").toString
    e.buildPostings("documents", dir, fields = Seq("text"))
    // simulate a vocabulary past the cap: same persisted relation, hot
    // tier dropped — exactly what fromRelation yields at >hotCap terms
    val rel = PostingStats.load(spark, s"$dir/text__stats")
    e.registerPostingStats("documents", "text",
      PostingStats(hot = None, relation = Some(rel)))
    e.search("documents", "@text:dup", opts).collect() // warm docCount

    val routed = e.search("documents", "@text:dup", opts)
    assert(e.lastRouteEstimates.nonEmpty, "relation-tier estimate did not route")
    // the estimate equals the exact term frequency (the relation IS the
    // groupBy the hot map came from)
    val exact = rel.filter(col("term") === "dup").collect()(0).getLong(1)
    assert(e.lastRouteEstimates == Seq(exact))
    // parity with the scan path
    val plain = Fixtures.engine(spark, sf)
    assert(routed.collect().map(_.getString(0)).toSeq ==
      plain.search("documents", "@text:dup", opts)
        .collect().map(_.getString(0)).toSeq)
    // and the point-read pushes into the tiny stats file, not the posting
    val est = jobsDuring {
      e.search("documents", "@text:dup", opts); ()
    }
    assert(est >= 1, "relation tier should cost (tiny) jobs, not silence")
  }

  test("no stats in any tier: the conjunct stays on the scan path (no count job)") {
    val e = Fixtures.engine(spark, sf)
    val (schema, docs) = e.index("documents")
    // posting registered WITHOUT stats (registerPosting clears them)
    e.registerPosting("documents", "text",
      graft.text.PostingIndex.build(docs, schema, "text"))
    // warm docCount + the session's one-time plan-construction futures
    // (broadcast thread-pool first touch); a guard count job would not
    // be amortized by this — the old fallback ran per planning
    e.search("documents", "@text:dup", opts).collect()

    var routed = -1
    val jobs = jobsDuring {
      val df = e.search("documents", "@text:dup", opts)
      routed = e.lastRouteEstimates.length
      assert(!df.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    }
    assert(routed == 0, "statless posting must not route")
    assert(jobs == 0, s"guard priced a statless conjunct with $jobs job(s)")
    // correctness intact via the columnar scan
    val plain = Fixtures.engine(spark, sf)
    assert(e.search("documents", "@text:dup", opts)
      .collect().map(_.getString(0)).toSeq ==
      plain.search("documents", "@text:dup", opts)
        .collect().map(_.getString(0)).toSeq)
  }

  test("stats survive restart: loadPostings re-attaches the persisted relation, zero-job planning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stats-reload").toString
    val built = Fixtures.engine(spark, sf)
    built.buildPostings("documents", dir)
    assert(graft.util.FsIO.isDir(spark, s"$dir/text__stats"),
      "buildPostings did not persist the stats relation")

    val restarted = new SearchEngine
    val (schema, docs) = built.index("documents")
    restarted.createIndex(schema, docs)
    restarted.loadPostings("documents", dir)
    restarted.search("documents", "@text:dup @source:{src1}", opts).collect()

    var routed = 0
    val jobs = jobsDuring {
      restarted.search("documents", "@text:dup @source:{src1}", opts)
      routed = restarted.lastRouteEstimates.length
    }
    assert(routed >= 2, s"restart lost routing stats: $routed routed")
    assert(jobs == 0, s"restarted planning ran $jobs job(s); must be zero")
  }
}
