package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.engine.{Metrics, SearchEngine, SearchOptions}
import graft.model._
import graft.pipeline.{Ann, Nsw}
import graft.query.VectorParam
import graft.sources.Documents

/**
 * Pins the relationship between the library's TWO ANN planners
 * (round-8 verdict #7 — parallel implementations of the reference's
 * planner.cc:21-46 drift apart unless their overlap is spec'd):
 *
 *  - The ENGINE's hybrid rule (`SearchEngine.search`): the reference's
 *    semantics — the declared index TYPE dictates. With a graph
 *    attached, match-all KNN always beams the graph; a filtered query
 *    splits on the qualified-count ratio (pre-filter exact below the
 *    threshold, inline-filtered beam above), exactly planner.cc's
 *    rule. Corpus size does NOT enter: an HNSW index in the reference
 *    answers `*=>[KNN ...]` from the graph even on ten vectors.
 *  - `Ann.topKAuto`: the MEASURED library facade — a flop budget
 *    decides whether an exact scan is simply cheaper, then shape +
 *    available structures pick among ivf/nsw/sq/pq.
 *
 * The overlap (match-all KNN, NSW available) agrees in the
 * above-budget regime: both take the graph. Below the budget they
 * INTENTIONALLY diverge — the engine keeps reference parity (graph),
 * the facade keeps the cheaper exact scan — and the divergence is
 * semantics-safe: this spec pins that the engine's graph answer
 * equals the exact top-k on such corpora, so the two plans differ in
 * cost only. Filtered queries are engine-only surface (topKAuto has
 * no predicate input); the ratio split is pinned here via the planner
 * metrics counters.
 */
class AnnPlannerAgreementSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("ann-planner-agreement")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = ()

  private val dim = 16
  private def corpus(n: Int) = {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(3)
    (0 until n).map(i => (i.toLong,
      Array.fill(dim)(rnd.nextGaussian().toFloat))).toDF("id", "v")
  }
  private val qv: Array[Float] = {
    val rnd = new scala.util.Random(17)
    Array.fill(dim)(rnd.nextGaussian().toFloat)
  }

  test("overlap regime: above the flop budget both planners take the graph") {
    val base = corpus(800)
    val nsw = Nsw.build(base, "id", "v", metric = "L2", numPartitions = 2)
    // facade decision, with the budget scaled to the test corpus
    // (default 2e8 needs millions of rows): flops = 800·16 = 12800
    val shape = Ann.probeQueryShape(base, "v")
    val facade = Ann.chooseQueryPlan(shape, ivfAvailable = false,
      nswAvailable = true, sqAvailable = false, metric = "L2",
      exactFlopBudget = 10000)
    assert(facade == "nsw")
    // engine decision: match-all + attached graph → inline/graph path
    val e = engineWith(base, nsw)
    Metrics.knnInline.set(0); Metrics.knnPrefilter.set(0)
    val keys = e.search("pl_t", "*=>[KNN 10 @v $q EF_RUNTIME 200]",
      SearchOptions(params = Map("q" -> VectorParam(qv)), noContent = true))
      .collect().map(_.getString(0)).toSeq
    assert(Metrics.knnInline.get() == 1 && Metrics.knnPrefilter.get() == 0)
    // and the graph agrees with the facade's own nsw dispatch
    val facadeKeys = Ann.topKAuto(base, "id", "v", qv, k = 10,
      metric = "L2", plan = Some("nsw"), nsw = Some(nsw))
      .collect().map(_.get(0).toString).toSeq
    assert(keys == facadeKeys)
  }

  test("divergence regime: below the budget the facade scans, the engine keeps reference parity — same answer") {
    val base = corpus(300)
    val nsw = Nsw.build(base, "id", "v", metric = "L2", numPartitions = 2)
    val shape = Ann.probeQueryShape(base, "v")
    // facade: 300·16 flops ≪ default budget → exact scan
    assert(Ann.chooseQueryPlan(shape, ivfAvailable = false,
      nswAvailable = true, sqAvailable = false, metric = "L2") == "exact")
    // engine: index type dictates (reference semantics) → graph
    val e = engineWith(base, nsw)
    Metrics.knnInline.set(0)
    val graphKeys = e.search("pl_t", "*=>[KNN 10 @v $q EF_RUNTIME 300]",
      SearchOptions(params = Map("q" -> VectorParam(qv)), noContent = true))
      .collect().map(_.getString(0)).toSeq
    assert(Metrics.knnInline.get() == 1)
    // the divergence is cost-only: graph answer == exact top-k here
    val exactKeys = Ann.topK(base, "id", "v", qv, k = 10, metric = "L2")
      .collect().map(_.get(0).toString).toSeq
    assert(graphKeys == exactKeys)
  }

  test("filtered queries are engine-only: the qualified-ratio split (planner.cc rule)") {
    val base = corpus(400).withColumn("label", col("id") % 100)
    val nsw = Nsw.build(base, "id", "v", metric = "L2", numPartitions = 2)
    val e = engineWith(base, nsw, withLabel = true)
    e.prefilterThresholdRatio = 0.1 // threshold = 40 qualified docs
    val opts = SearchOptions(params = Map("q" -> VectorParam(qv)), noContent = true)
    // selective filter (4 of 400 qualified ≤ 40) → pre-filter exact
    Metrics.knnInline.set(0); Metrics.knnPrefilter.set(0)
    e.search("pl_t", "@label:[7 7]=>[KNN 3 @v $q]", opts).collect()
    assert(Metrics.knnPrefilter.get() == 1 && Metrics.knnInline.get() == 0)
    // broad filter (200 of 400 qualified > 40) → inline-filtered beam
    Metrics.knnInline.set(0); Metrics.knnPrefilter.set(0)
    e.search("pl_t", "@label:[0 49]=>[KNN 3 @v $q]", opts).collect()
    assert(Metrics.knnInline.get() == 1 && Metrics.knnPrefilter.get() == 0)
  }

  private def engineWith(base: org.apache.spark.sql.DataFrame,
                         nsw: Nsw.NswIndex,
                         withLabel: Boolean = false): SearchEngine = {
    val e = new SearchEngine
    val fields =
      (if (withLabel) Seq(FieldDef("label", NumericField)) else Nil) :+
        FieldDef("v", VectorField(dim = dim, metric = DistanceMetric.L2))
    val schema = IndexSchema("pl_t", fields)
    e.createIndex(schema, Documents.enrich(base, schema,
      keyExpr = Some(col("id"))))
    e.registerAnn("pl_t", "v", nsw)
    e
  }
}
