package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{SearchEngine, SearchOptions}
import graft.model.{FieldDef, IndexSchema, TextField}
import graft.streaming.{Ingest, IndexMaintainer}

/**
 * LSM-shaped doc relation under docsSource maintenance: the registered
 * relation after a batch must be base ⊖ tombs ∪ overlay — EXACTLY the
 * state's contents — while never re-scanning the state except at
 * adoption and compaction. Pins:
 *  - per-batch relation contents == the state the batches describe
 *    (upsert-new, modify, delete, and RE-UPSERT AFTER DELETE — the
 *    tombstone must not shadow the overlay row);
 *  - the post-adoption relation plan reads the maintainer-owned base
 *    files, NOT the DocState generation dirs (the O(corpus)-per-batch
 *    rescan this design removes);
 *  - compaction triggers at compactRowThreshold, rewrites the base
 *    (v1), clears the overlay (plan has no anti-join input), and
 *    preserves contents.
 */
class MaintainerDocsLsmSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var engine: SearchEngine = _
  private var maintainer: IndexMaintainer = _
  private var statePath: String = _
  private var baseDir: String = _
  private val expected = scala.collection.mutable.Map.empty[String, String]
  private var seq = 0L

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("maintainer-docs-lsm-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark; import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("docs-lsm").toString
    statePath = s"$tmp/state"
    baseDir = s"$tmp/derived"
    val init = (1 to 20).map(i => (s"d$i", s"alpha token$i text"))
    init.foreach { case (k, v) => expected(k) = v }
    Ingest.backfill(init.toDF("__key", "text"), statePath, nBuckets = 4)
    engine = new SearchEngine
    val schema = IndexSchema("lsm_idx", Seq(FieldDef("text", TextField())))
    engine.createIndex(schema,
      graft.sources.Documents.enrich(Ingest.readState(spark, statePath), schema))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(baseDir))
    maintainer = new IndexMaintainer(engine, "lsm_idx", schema,
      docsSource = Some(() => Ingest.readState(spark, statePath)),
      compactRowThreshold = 10,
      statsDir = Some(baseDir))
  }

  override def afterAll(): Unit = if (spark != null) () // shared-session policy

  /** Commit `changes` to the state then run the maintenance hook —
    * the Ingest.start contract (state first, then onBatch). */
  private def applyBatch(changes: Seq[(String, String, String)]): Unit = {
    val sp = spark; import sp.implicits._
    seq += 1
    changes.foreach {
      case (op, k, v) => if (op == "upsert") expected(k) = v else expected -= k
    }
    Ingest.backfill(expected.toSeq.toDF("__key", "text"), statePath, nBuckets = 4)
    maintainer.onBatch(changes.map { case (op, k, v) => (op, k, v, seq) }
      .toDF("op", "__key", "text", "__seq"))
  }

  private def relationContents(): Map[String, String] =
    engine.index("lsm_idx")._2.select(col("__key"), col("text"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("adoption (first batch) rebuilds the base and matches the state") {
    applyBatch(Seq(("upsert", "d21", "alpha fresh text")))
    assert(relationContents() == expected.toMap)
    assert(graft.util.FsIO.exists(spark, s"$baseDir/__docsbase/v0"))
    // the relation now reads the maintainer-owned base, not the state
    val plan = engine.index("lsm_idx")._2.queryExecution.optimizedPlan.toString
    assert(!plan.contains(statePath), "post-adoption plan re-scans the state")
  }

  test("overlay batch: modify + delete + new, contents exact, no state scan") {
    applyBatch(Seq(
      ("upsert", "d1", "alpha MODIFIED text"),
      ("delete", "d2", null),
      ("upsert", "d22", "alpha brand new")))
    assert(relationContents() == expected.toMap)
    val plan = engine.index("lsm_idx")._2.queryExecution.optimizedPlan.toString
    assert(!plan.contains(statePath), "overlay plan re-scans the state")
    assert(plan.contains("__docsbase"), "overlay plan does not read the base")
    // search routes over the composed relation
    val hit = engine.search("lsm_idx", "@text:modified",
      SearchOptions(limit = (0, 10), noContent = true))
      .collect().map(_.getString(0)).toSet
    assert(hit == Set("d1"))
  }

  test("re-upsert after delete: tombstone must not shadow the overlay row") {
    applyBatch(Seq(("delete", "d3", null)))
    assert(!relationContents().contains("d3"))
    applyBatch(Seq(("upsert", "d3", "alpha resurrected")))
    assert(relationContents().get("d3").contains("alpha resurrected"))
  }

  test("compaction at threshold rewrites the base and clears the overlay") {
    // overlay+tombs so far: ~7 rows; push past threshold 10 (the
    // overflow is detected at the START of the NEXT batch — the
    // state already includes it, so rebuilding then is exact)
    applyBatch((30 to 36).map(i => ("upsert", s"d$i", s"alpha bulk$i")))
    assert(relationContents() == expected.toMap)
    applyBatch(Seq(("upsert", "d40", "alpha after compaction")))
    assert(relationContents() == expected.toMap)
    assert(graft.util.FsIO.exists(spark, s"$baseDir/__docsbase/v1"),
      "compaction did not rewrite the base")
    // post-compaction relation is the bare base: no anti-join, no union
    val plan = engine.index("lsm_idx")._2.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"post-compaction plan still composes: $plan")
    // and the next batch overlays on the NEW base
    applyBatch(Seq(("upsert", "d41", "alpha post v1 overlay")))
    assert(relationContents() == expected.toMap)
    assert(engine.index("lsm_idx")._2.queryExecution.optimizedPlan
      .toString.contains("Join"), "post-compaction overlay did not compose")
  }

  private def contentsOf(e: SearchEngine): Map[String, String] =
    e.index("lsm_idx")._2.select(col("__key"), col("text"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("restart adoption restores base ⊖ tombs ∪ overlay with ZERO state scans") {
    // segment-borne delete + cross-segment upsert-then-delete before the
    // "crash": d4 deleted, d43 upserted then deleted in a LATER segment
    // (the fold's latest-touch-wins must tombstone it), d42 added
    applyBatch(Seq(("upsert", "d43", "alpha doomed")))
    applyBatch(Seq(("delete", "d4", null), ("upsert", "d42", "alpha survivor"),
      ("delete", "d43", null)))
    assert(relationContents() == expected.toMap)

    // full process restart: fresh engine, openIndex over the same dir.
    // The docsSource thunk COUNTS invocations — adoption and the next
    // overlay batch must never scan the state.
    val engine2 = new SearchEngine
    val schema = IndexSchema("lsm_idx", Seq(FieldDef("text", TextField())))
    engine2.createIndex(schema,
      graft.sources.Documents.enrich(Ingest.readState(spark, statePath), schema))
    var srcCalls = 0
    val m2 = IndexMaintainer.openIndex(engine2, "lsm_idx", baseDir,
      docsSource = Some(() => { srcCalls += 1; Ingest.readState(spark, statePath) }))
    assert(srcCalls == 0, "adoption scanned the state")
    assert(contentsOf(engine2) == expected.toMap)
    assert(!contentsOf(engine2).contains("d4"), "segment-borne delete lost")
    assert(!contentsOf(engine2).contains("d43"),
      "upsert-then-delete across segments resurrected")
    val plan = engine2.index("lsm_idx")._2.queryExecution.optimizedPlan.toString
    assert(!plan.contains(statePath), "adopted plan re-scans the state")
    assert(plan.contains("__docsbase"), "adopted plan does not read the base")

    // next batch folds as an overlay — still no state scan, contents exact
    val sp = spark; import sp.implicits._
    seq += 1
    expected("d50") = "alpha after restart"
    Ingest.backfill(expected.toSeq.toDF("__key", "text"), statePath, nBuckets = 4)
    m2.onBatch(Seq(("upsert", "d50", "alpha after restart", seq))
      .toDF("op", "__key", "text", "__seq"))
    assert(srcCalls == 0, "post-adoption overlay batch scanned the state")
    assert(contentsOf(engine2) == expected.toMap)
  }

  test("adoption releases the caller's pre-registration (no resident-corpus leak)") {
    // FT.CREATE MAINTAIN_OPEN shape: the restart caller registers the
    // state enrichment RESIDENT (persisted); adoption supersedes it and
    // must unpersist it, or a full-corpus cache stays pinned forever
    val engineR = new SearchEngine
    val schema = IndexSchema("lsm_idx", Seq(FieldDef("text", TextField())))
    val pre = graft.sources.Documents.enrich(Ingest.readState(spark, statePath), schema)
    engineR.createIndex(schema, pre, resident = true)
    // probe the relation the engine actually PERSISTED (the catalog's
    // stored handle) — since r16 the resident path lays the enrichment
    // out before persisting, so the caller's `pre` plan is no longer
    // the cached plan and a lookup on it is vacuously empty (the stale
    // probe made this test red at r16 HEAD; the unpersist contract it
    // pins was never broken — adoption unpersists engine.index()._2)
    val stored = engineR.index("lsm_idx")._2
    def cached = spark.sharedState.cacheManager
      .lookupCachedData(stored.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
    assert(cached.isDefined, "precondition: pre-registration is cached")
    IndexMaintainer.openIndex(engineR, "lsm_idx", baseDir,
      docsSource = Some(() => Ingest.readState(spark, statePath)))
    assert(cached.isEmpty, "adoption leaked the superseded resident relation")
    assert(contentsOf(engineR) == expected.toMap)
  }

  test("orphan segments (crash window) are GC'd at adoption") {
    val segDir = s"$baseDir/__docsbase/seg/v9999"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(segDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$segDir/junk"), "orphan")
    val engine3 = new SearchEngine
    val schema = IndexSchema("lsm_idx", Seq(FieldDef("text", TextField())))
    engine3.createIndex(schema,
      graft.sources.Documents.enrich(Ingest.readState(spark, statePath), schema))
    IndexMaintainer.openIndex(engine3, "lsm_idx", baseDir,
      docsSource = Some(() => Ingest.readState(spark, statePath)))
    assert(!graft.util.FsIO.exists(spark, segDir), "orphan segment survived")
    assert(contentsOf(engine3) == expected.toMap)
  }
}
