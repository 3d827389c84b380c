package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.Documents
import graft.text.{PostingIndex, PostingStore}

/**
 * Incremental posting maintenance vs the batch rebuild oracle: after
 * ANY sequence of applyBatch / compact / crash+open, `view` must equal
 * `PostingIndex.build` over the corpus the changes describe (the
 * reference's invariant — its radix postings always reflect the last
 * applied mutation, src/index_schema.cc:964).
 */
class PostingStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("posting-store-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = () // shared SparkContext: never stop()

  private val schema = Fixtures.documentsSchema

  private def enrich(df: DataFrame): DataFrame =
    Documents.enrich(df, schema, keyExpr = Some(col("doc_id")))

  private def posting(df: DataFrame): DataFrame =
    PostingIndex.build(enrich(df), schema, "text")

  private def asSet(df: DataFrame): Set[(String, String)] =
    df.select(col("term").cast("string"), col("__key").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  private def docs = Fixtures.table(spark, "/root/testdata/sf0.001", "documents")

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-pstore").toString

  test("applyBatch: upsert/delete/supersede — view ≡ rebuilt posting") {
    val dir = tmpDir()
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val store = PostingStore.init(spark, posting(base), dir, numPartitions = 4)

    // batch 1: upsert the held-out third (new keys)
    val add = docs.filter(col("doc_id") % 3 === 0)
    store.applyBatch(posting(add), add.select(col("doc_id").cast("string").as("__key")))
    assert(asSet(store.view) == asSet(posting(docs)), "after adds")

    // batch 2: supersede some docs with REWRITTEN text + delete others
    val rewritten = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("text", lit("freshly rewritten content"))
    val deleted = docs.filter(col("doc_id") % 7 === 0 && col("doc_id") % 10 =!= 0)
    store.applyBatch(
      posting(rewritten),
      rewritten.select(col("doc_id").cast("string").as("__key"))
        .unionByName(deleted.select(col("doc_id").cast("string").as("__key"))))

    val expectedCorpus = docs.filter(col("doc_id") % 10 =!= 0)
      .filter(col("doc_id") % 7 =!= 0)
      .unionByName(rewritten)
    assert(asSet(store.view) == asSet(posting(expectedCorpus)),
      "after supersede + delete")

    // a deleted key must have NO postings left
    val deadKeys = deleted.select(col("doc_id").cast("string"))
      .collect().map(_.getString(0)).toSet
    assert(asSet(store.view).forall { case (_, k) => !deadKeys.contains(k) })
  }

  test("compact folds segments into main; view unchanged, delta empty") {
    val dir = tmpDir()
    val base = docs.filter(col("doc_id") % 2 === 0)
    val store = PostingStore.init(spark, posting(base), dir, numPartitions = 4)
    val add = docs.filter(col("doc_id") % 2 =!= 0)
    store.applyBatch(posting(add), add.select(col("doc_id").cast("string").as("__key")))
    val before = asSet(store.view)
    assert(store.deltaSize > 0)
    store.compact(numPartitions = 4)
    assert(store.deltaSize == 0 && store.tombSize == 0)
    assert(asSet(store.view) == before, "compact must not change the relation")
    // and the store keeps working after compaction
    val del = docs.filter(col("doc_id") % 11 === 0)
    store.applyBatch(posting(docs.limit(0)),
      del.select(col("doc_id").cast("string").as("__key")))
    assert(asSet(store.view) == asSet(posting(docs.filter(col("doc_id") % 11 =!= 0))))
  }

  test("open() after a crash: uncommitted generations are ignored and GC'd") {
    val dir = tmpDir()
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val store = PostingStore.init(spark, posting(base), dir, numPartitions = 4)
    val add = docs.filter(col("doc_id") % 3 === 0)
    store.applyBatch(posting(add), add.select(col("doc_id").cast("string").as("__key")))
    val committed = asSet(store.view)

    // Simulate a crash mid-applyBatch: a NEWER segment generation is on
    // disk (tomb fully written, delta half-written — worst case) but the
    // MANIFEST was never swapped. open() must serve the committed state.
    val junkTomb = new java.io.File(s"$dir/tomb/v99"); junkTomb.mkdirs()
    posting(docs.limit(5)).write.mode("overwrite").parquet(s"$dir/tomb/v99")
    val junkDelta = new java.io.File(s"$dir/delta/v99"); junkDelta.mkdirs()
    new java.io.FileOutputStream(s"$dir/delta/v99/part-00000.parquet").close() // torn file
    // and a half-written compacted main (crash mid-compact)
    val junkMain = new java.io.File(s"$dir/main/g9"); junkMain.mkdirs()

    val reopened = PostingStore.open(spark, dir)
    assert(asSet(reopened.view) == committed, "crash garbage must not surface")
    assert(!new java.io.File(s"$dir/tomb/v99").exists(), "orphan tomb GC'd")
    assert(!new java.io.File(s"$dir/delta/v99").exists(), "orphan delta GC'd")
    assert(!new java.io.File(s"$dir/main/g9").exists(), "orphan main GC'd")

    // the reopened store continues to apply batches correctly
    val del = docs.filter(col("doc_id") % 5 === 0)
    reopened.applyBatch(
      posting(docs.limit(0)),
      del.select(col("doc_id").cast("string").as("__key")))
    assert(asSet(reopened.view) == asSet(posting(docs.filter(col("doc_id") % 5 =!= 0))))
  }

  test("lookup through the view still prunes by term (pushed filter on main)") {
    val dir = tmpDir()
    val store = PostingStore.init(spark, posting(docs), dir, numPartitions = 4)
    store.applyBatch(posting(docs.limit(0)),
      docs.limit(3).select(col("doc_id").cast("string").as("__key")))
    val plan = store.view.filter(col("term") === "merg")
      .queryExecution.executedPlan.toString
    // the main-branch parquet scan must carry the term predicate down
    assert(plan.contains("PushedFilters") && plan.contains("term"),
      s"no pushed term filter in:\n$plan")
  }

  test("deferred deletion: a pre-mutation view survives one mutation interval") {
    val dir = tmpDir()
    val base = docs.filter(col("doc_id") % 3 === 1)
    val store = PostingStore.init(spark, posting(base), dir, numPartitions = 2)
    def batch(m: Int): Unit = {
      val b = docs.filter(col("doc_id") % 3 === lit(m))
      store.applyBatch(posting(b), b.select(col("doc_id").cast("string").as("__key")))
    }
    batch(2) // creates seg v1; v0 (empty-read paths) queued
    val before = store.view // pins main/g0 + tomb/v1 + delta/v1 files
    val pinned = asSet(before)
    batch(0) // supersedes v1 → v1's files QUEUED, not deleted
    // the captured view still reads every file it resolved (grace)
    assert(asSet(before) == pinned, "pre-mutation view broke mid-grace")
    assert(new java.io.File(s"$dir/delta/v1").exists(), "v1 deleted too early")
    batch(1) // next mutation drains the queue → v1's files go
    assert(!new java.io.File(s"$dir/delta/v1").exists(), "v1 not GC'd after grace")
    assert(!new java.io.File(s"$dir/tomb/v1").exists())
    // compact QUEUES without draining: the auto-compaction policy runs
    // it immediately after an applyBatch, so draining there would
    // delete the files that applyBatch queued moments earlier — the
    // just-superseded delta must survive a back-to-back compact
    store.compact(numPartitions = 2)
    assert(new java.io.File(s"$dir/main/g0").exists(), "old main deleted at compact")
    // v2 was queued by the LAST applyBatch — a draining compact would
    // have deleted it with zero elapsed grace; v3 was live at compact
    assert(new java.io.File(s"$dir/delta/v2").exists(),
      "applyBatch-queued files drained by the same-call compact")
    assert(new java.io.File(s"$dir/delta/v3").exists())
    batch(2)
    assert(!new java.io.File(s"$dir/main/g0").exists(), "old main not GC'd")
    assert(!new java.io.File(s"$dir/delta/v2").exists())
    assert(!new java.io.File(s"$dir/delta/v3").exists())
    // and the final view is still exactly the rebuild of the full corpus
    // (every batch upserted its slice with unchanged content)
    assert(asSet(store.view) == asSet(posting(docs)))
  }
}
