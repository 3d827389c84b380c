package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incrementally maintained posting relation — the streaming-ingest
 * counterpart of the reference's per-mutation text-index maintenance
 * (src/index_schema.cc:964 ProcessMutation: every keyspace event
 * updates the radix postings in place). A batch-built
 * [[PostingIndex]] goes stale under [[graft.streaming.Ingest]]; this
 * store keeps it fresh with LSM-style segments, never rewriting the
 * big term-sorted main per batch:
 *
 *  - `main/`  — term-sorted posting parquet ([[PostingIndex.save]]
 *    layout: PushedFilter + row-group pruning on `term`);
 *  - `delta/` — recent (term, __key) rows, small, scanned whole;
 *  - `tomb/`  — keys changed since the last compaction (their rows in
 *    main are dead).
 *
 * `view = (main ANTI-JOIN tomb ON __key) UNION delta`: the main branch
 * still prunes by term (the anti-join applies after the pruned scan;
 * tomb is small → AQE broadcasts it), delta is small by construction.
 * [[applyBatch]] costs O(|delta| + |tomb| + |batch|) — never O(main).
 * [[compact]] folds everything back into a fresh term-sorted main —
 * run it when |delta| or |tomb| stops being "small" relative to the
 * lookup budget (the LSM compaction trade every updatable store makes).
 *
 * Segment rewrites are versioned (`delta/v3`, never in-place): the new
 * version is fully written before the superseded one is deleted, so a
 * crash mid-batch leaves a readable store. Callers re-acquire [[view]]
 * after [[applyBatch]]/[[compact]] — a previously returned DataFrame
 * points at the deleted segment files.
 */
final class PostingStore private (spark: SparkSession, dir: String,
                                  private var gen: Int) {

  private def mainPath = s"$dir/main"
  private def deltaPath(g: Int) = s"$dir/delta/v$g"
  private def tombPath(g: Int) = s"$dir/tomb/v$g"

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)
  private def exists(p: String) = fs.exists(new org.apache.hadoop.fs.Path(p))
  private def rm(p: String): Unit = {
    fs.delete(new org.apache.hadoop.fs.Path(p), true); ()
  }

  private def readOr(p: String, cols: Seq[String]): DataFrame =
    if (exists(p)) spark.read.parquet(p)
    else {
      val schema = org.apache.spark.sql.types.StructType(cols.map(
        org.apache.spark.sql.types.StructField(_,
          org.apache.spark.sql.types.StringType)))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    }

  /** The current consistent posting relation (term, __key). */
  def view: DataFrame = {
    val main = spark.read.parquet(mainPath)
    val tomb = readOr(tombPath(gen), Seq("__key"))
    val delta = readOr(deltaPath(gen), Seq("term", "__key"))
    main.join(tomb, Seq("__key"), "left_anti").unionByName(delta)
  }

  /**
   * Fold one ingest micro-batch in: `upserts` carries the NEW posting
   * rows (term, __key) of every upserted document (empty term set ⇒ no
   * rows, key still tombstoned via `changedKeys`); `changedKeys` is
   * every key the batch upserted OR deleted.
   */
  def applyBatch(upserts: DataFrame, changedKeys: DataFrame): Unit = {
    val next = gen + 1
    val keys = changedKeys.select(col("__key")).distinct()
    val newTomb = readOr(tombPath(gen), Seq("__key"))
      .unionByName(keys).distinct()
    val newDelta = readOr(deltaPath(gen), Seq("term", "__key"))
      .join(keys, Seq("__key"), "left_anti") // superseded rows die
      .unionByName(upserts.select(col("term"), col("__key")))
    newTomb.write.mode("overwrite").parquet(tombPath(next))
    newDelta.write.mode("overwrite").parquet(deltaPath(next))
    val prev = gen
    gen = next
    rm(tombPath(prev)); rm(deltaPath(prev))
  }

  /** Fold delta + tombstones into a fresh term-sorted main. */
  def compact(numPartitions: Int = 32): Unit = {
    val tmp = s"$dir/main_next"
    PostingIndex.save(view, tmp, numPartitions)
    rm(mainPath)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(mainPath))
    val prev = gen
    gen = prev + 1 // empty segments (nothing written ⇒ readOr gives empty)
    rm(tombPath(prev)); rm(deltaPath(prev))
  }

  /** Rows currently in the delta segment (compaction sizing signal). */
  def deltaSize: Long =
    if (exists(deltaPath(gen))) spark.read.parquet(deltaPath(gen)).count() else 0L
}

object PostingStore {

  /** Create a store at `dir` from an initial posting relation (e.g.
    * [[PostingIndex.build]] over the backfilled corpus). */
  def init(spark: SparkSession, posting: DataFrame, dir: String,
           numPartitions: Int = 32): PostingStore = {
    PostingIndex.save(posting, s"$dir/main", numPartitions)
    new PostingStore(spark, dir, 0)
  }

  /** Re-open an existing store (e.g. after a restart): the live
    * delta/tomb version is whatever survived the last commit. */
  def open(spark: SparkSession, dir: String): PostingStore = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def liveGen(sub: String): Int = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      if (!fs.exists(p)) 0
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("v")).map(_.drop(1).toInt)
        .sorted.lastOption.getOrElse(0)
    }
    new PostingStore(spark, dir, math.max(liveGen("delta"), liveGen("tomb")))
  }
}
