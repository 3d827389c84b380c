package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{SearchEngine, SearchOptions}
import graft.model.{FieldDef, IndexSchema, TextField}
import graft.streaming.{DocState, Ingest, IndexMaintainer}

/**
 * Restart-adoption cost of the maintained doc relation, old path vs
 * new path, at a given corpus scale (default: the HundredSweep 100×
 * corpus if present, else sf0.1).
 *
 * Old path (pre-durable-LSM): openIndex restores stores/ANN only; the
 * FIRST post-restart batch re-adopts the doc base through a full state
 * scan + base parquet write + corpus enrichment (the round-11 closing
 * summary's "one corpus write per restart"). Simulated here by
 * removing the doc-LSM manifest before openIndex.
 *
 * New path: per-batch overlay segments + manifest make the LSM
 * durable; openIndex restores base ⊖ tombs ∪ overlay with zero corpus
 * work and the first post-restart batch folds as an overlay.
 *
 * Prints (open, firstBatch, firstQuery) wall seconds for both paths on
 * the SAME pre-built maintained corpus.
 */
object AdoptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = args.headOption.getOrElse {
      if (graft.util.FsIO.exists(spark, "/tmp/graft-sf10x/_DONE"))
        "/tmp/graft-sf10x"
      else "/root/testdata/sf0.1"
    }
    println(s"corpus: $corpus")

    val work = java.nio.file.Files.createTempDirectory("graft-adopt").toString
    val statePath = s"$work/state"
    val dir = s"$work/derived"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))

    val docs = spark.read.parquet(s"$corpus/documents.parquet")
      .select(col("doc_id").cast("string").as("__key"), col("text"), col("lang"))
    val nDocs = docs.count()
    val buckets = math.max(64, (nDocs / 80).toInt)
    println(s"docs=$nDocs buckets=$buckets")
    val state = DocState.init(docs, statePath, buckets)
    val schema = IndexSchema("adopt_idx", Seq(FieldDef("text", TextField())))

    def freshEngine(): SearchEngine = {
      val e = new SearchEngine
      e.createIndex(schema, graft.sources.Documents.enrich(
        Ingest.readState(spark, statePath), schema))
      e
    }
    def relation() = Ingest.readState(spark, statePath)

    // ---- build phase: 1 adopting batch + 2 overlay batches ----
    val e0 = freshEngine()
    val m0 = new IndexMaintainer(e0, "adopt_idx", schema,
      docsSource = Some(() => relation()), statsDir = Some(dir))
    var seqN = 0L
    def batch(n: Int): org.apache.spark.sql.DataFrame = {
      seqN += 1
      import spark.implicits._
      (0 until n).map(i => ("upsert", s"probe${seqN}_$i",
        s"probe dup text number$i", "en", seqN))
        .toDF("op", "__key", "text", "lang", "__seq")
    }
    def applyOne(m: IndexMaintainer): Unit = {
      val b = batch(500)
      state.applyBatch(b)
      m.onBatch(b)
    }
    applyOne(m0) // rebuild (base write)
    applyOne(m0); applyOne(m0) // overlays → durable segments

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def measure(label: String): Unit = {
      val e = freshEngine()
      val (m, tOpen) = timed(IndexMaintainer.openIndex(e, "adopt_idx", dir,
        docsSource = Some(() => relation())))
      val (_, tQ0) = timed(e.search("adopt_idx", "@text:dup",
        SearchOptions(limit = (0, 100), noContent = true)).count())
      val (_, tBatch) = timed(applyOne(m))
      val (_, tQ1) = timed(e.search("adopt_idx", "@text:dup",
        SearchOptions(limit = (0, 100), noContent = true)).count())
      println(f"PROBE $label open=$tOpen%.2f q_after_open=$tQ0%.2f " +
        f"first_batch=$tBatch%.2f q_after_batch=$tQ1%.2f " +
        f"total=${tOpen + tQ0 + tBatch + tQ1}%.2f s")
    }

    measure("adopt_durable_lsm")
    // legacy path: no manifest → first batch pays the state scan +
    // base rewrite + corpus enrichment
    graft.util.FsIO.deleteRecursive(spark, s"$dir/__docsbase/DOCLSM")
    measure("adopt_legacy_rebuild")
    spark.stop()
  }
}
