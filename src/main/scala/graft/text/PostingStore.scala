package graft.text

import org.apache.hadoop.fs.{FileSystem, Path}
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
 *  - `main/g<G>/`  — term-sorted posting parquet ([[PostingIndex.save]]
 *    layout: PushedFilter + row-group pruning on `term`);
 *  - `delta/v<g>/` — recent posting rows, small, scanned whole;
 *    (row schema follows the initial posting: term/__key, plus `full`
 *    for suffix postings — the store is shape-agnostic)
 *  - `tomb/v<g>/`  — keys changed since the last compaction (their
 *    rows in main are dead).
 *
 * `view = (main ANTI-JOIN tomb ON __key) UNION delta`: the main branch
 * still prunes by term (the anti-join applies after the pruned scan;
 * tomb is small → AQE broadcasts it), delta is small by construction.
 * [[applyBatch]] costs O(|delta| + |tomb| + |batch|) — never O(main).
 * [[compact]] folds everything back into a fresh term-sorted main —
 * run it when |delta| or |tomb| stops being "small" relative to the
 * lookup budget (the LSM compaction trade every updatable store makes).
 *
 * Crash safety is manifest-based, not ordering-based: every mutation
 * writes NEW versioned directories, then commits by atomically
 * renaming a MANIFEST file naming the live (mainGen, segGen) pair.
 * A crash at any point leaves the previous MANIFEST — and therefore
 * the previous consistent state — intact; [[open]] reads the manifest
 * and garbage-collects any orphan directories a crash left behind.
 *
 * Concurrent-reader grace: a superseded generation's files are NOT
 * deleted at commit — they are queued and removed at the NEXT
 * mutation, so a query that captured the previous [[view]] keeps its
 * files for one full mutation interval (the reference's in-memory
 * structures get this from locks; a file-backed store gets it from
 * deferred deletion). Callers should still re-acquire [[view]] after
 * each [[applyBatch]]/[[compact]] — only the freshest view sees the
 * batch. [[open]] GCs everything non-live, including the deferred
 * queue a crash left behind (no queries are in flight at restart).
 */
final class PostingStore private (spark: SparkSession, dir: String,
                                  private var mainGen: Int,
                                  private var segGen: Int,
                                  val layout: String) {

  import PostingStore._

  private def fs: FileSystem =
    FileSystem.get(new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)

  // Deferred-deletion queue: superseded paths, removed at the NEXT
  // applyBatch (one micro-batch interval of reader grace; see class
  // doc). Only applyBatch DRAINS — compact() merely queues, because the
  // auto-compaction policy runs it immediately AFTER an applyBatch in
  // the same onBatch call, and draining there would delete the files
  // that applyBatch queued moments earlier (zero elapsed grace).
  private var pendingRm: Seq[String] = Nil
  private def drainThenQueue(paths: Seq[String]): Unit = {
    pendingRm.foreach(rm(fs, _))
    pendingRm = paths
  }
  private def queueOnly(paths: Seq[String]): Unit =
    pendingRm = pendingRm ++ paths

  /** Row schema of the maintained relation — whatever the initial
    * posting carried (term/__key for term and tag postings; +`full`
    * for suffix postings). Invariant across generations. */
  private lazy val rowSchema: org.apache.spark.sql.types.StructType =
    spark.read.parquet(mainPath(dir, mainGen)).schema

  /** The current consistent posting relation (rowSchema columns). */
  def view: DataFrame = {
    val main = spark.read.parquet(mainPath(dir, mainGen))
    val tomb = readOr(spark, fs, tombPath(dir, segGen), keySchema)
    val delta = readOr(spark, fs, deltaPath(dir, segGen), rowSchema)
    main.join(tomb, Seq("__key"), "left_anti").unionByName(delta)
  }

  /**
   * Fold one ingest micro-batch in: `upserts` carries the NEW posting
   * rows (rowSchema shape) of every upserted document (empty term set ⇒
   * no rows, key still tombstoned via `changedKeys`); `changedKeys` is
   * every key the batch upserted OR deleted.
   */
  def applyBatch(upserts: DataFrame, changedKeys: DataFrame): Unit = {
    val next = segGen + 1
    val keys = changedKeys.select(col("__key")).distinct()
    val newTomb = readOr(spark, fs, tombPath(dir, segGen), keySchema)
      .unionByName(keys).distinct()
    val newDelta = readOr(spark, fs, deltaPath(dir, segGen), rowSchema)
      .join(keys, Seq("__key"), "left_anti") // superseded rows die
      .unionByName(upserts.select(rowSchema.fieldNames.toSeq.map(col): _*))
    // segments are small by construction (compaction bounds them), but
    // unclustered writes still fragment them across every shuffle
    // partition — ~32-64 files a query's view must open per store.
    // Tomb is keys-only → one file; delta → a handful (same clustered-
    // write discipline as DocState.commit).
    newTomb.coalesce(1).write.mode("overwrite").parquet(tombPath(dir, next))
    writeDelta(newDelta, deltaPath(dir, next))
    commit(spark, dir, mainGen, next, layout) // atomic MANIFEST swap = commit point
    val prev = segGen
    segGen = next
    drainThenQueue(Seq(tombPath(dir, prev), deltaPath(dir, prev)))
  }

  /** Delta files keep the layout's pruning: cell-partitioned stores
    * write delta under `cell_id=` dirs too, so probes prune BOTH the
    * main and the not-yet-compacted rows at storage level. */
  private def writeDelta(df: DataFrame, path: String): Unit = layout match {
    case PostingStore.CellLayout =>
      // cluster by cell before the partitioned write: one file per
      // cell per delta instead of one per (cell × shuffle partition)
      df.repartition(col("cell_id"))
        .write.mode("overwrite").partitionBy("cell_id").parquet(path)
    case _ => df.coalesce(4).write.mode("overwrite").parquet(path)
  }

  /** Fold delta + tombstones into a fresh main in the store's layout. */
  def compact(numPartitions: Int = 32): Unit = {
    val nextMain = mainGen + 1
    val nextSeg = segGen + 1 // no files at nextSeg ⇒ empty segments
    PostingStore.writeMain(view, mainPath(dir, nextMain), layout, numPartitions)
    commit(spark, dir, nextMain, nextSeg, layout)
    val (pm, ps) = (mainGen, segGen)
    mainGen = nextMain; segGen = nextSeg
    queueOnly(Seq(mainPath(dir, pm), tombPath(dir, ps), deltaPath(dir, ps)))
  }

  /** Rows currently in the delta segment (compaction sizing signal). */
  def deltaSize: Long = {
    val p = deltaPath(dir, segGen)
    if (fs.exists(new Path(p))) spark.read.parquet(p).count() else 0L
  }

  /** Tombstoned keys since the last compaction (compaction signal). */
  def tombSize: Long = {
    val p = tombPath(dir, segGen)
    if (fs.exists(new Path(p))) spark.read.parquet(p).count() else 0L
  }
}

object PostingStore {

  /** Term-sorted layout ([[PostingIndex.save]]): pushed term filters +
    * row-group pruning. The default; what every text/tag store uses. */
  val TermLayout = "term"
  /** Cell-partitioned layout (`partitionBy("cell_id")`): rows land in
    * `cell_id=<n>/` dirs, probes prune at the partition level. Used by
    * the maintained IVF store ([[graft.pipeline.Ann.initIvfStore]]). */
  val CellLayout = "cell"

  private[text] def writeMain(df: DataFrame, path: String, layout: String,
                              numPartitions: Int): Unit = layout match {
    case TermLayout => PostingIndex.save(df, path, numPartitions)
    case CellLayout =>
      df.write.mode("overwrite").partitionBy("cell_id").parquet(path)
    case other => throw new IllegalArgumentException(s"unknown layout: $other")
  }

  private def mainPath(dir: String, g: Int) = s"$dir/main/g$g"
  private def deltaPath(dir: String, g: Int) = s"$dir/delta/v$g"
  private def tombPath(dir: String, g: Int) = s"$dir/tomb/v$g"
  private def manifestPath(dir: String) = new Path(s"$dir/MANIFEST")

  private def rm(fs: FileSystem, p: String): Unit = {
    fs.delete(new Path(p), true); ()
  }

  private val keySchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("__key",
      org.apache.spark.sql.types.StringType)))

  private def readOr(spark: SparkSession, fs: FileSystem, p: String,
                     schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (fs.exists(new Path(p))) spark.read.parquet(p)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  /** Commit point: MANIFEST names the live generations. Written to a
    * temp name then overwrite-renamed in ONE atomic step
    * ([[graft.util.FsIO.renameOverwrite]]) — a reader (or a crash at
    * any point) sees the old or the new manifest, never a torn one and
    * never a missing one. */
  private def commit(spark: SparkSession, dir: String,
                     mainGen: Int, segGen: Int,
                     layout: String = TermLayout): Unit =
    graft.util.FsIO.writeTextAtomic(spark, manifestPath(dir).toString,
      s"$mainGen $segGen $layout")

  /** (mainGen, segGen, layout); two-token manifests predate layouts —
    * they are all term stores. */
  private def readManifest(fs: FileSystem, dir: String): (Int, Int, String) = {
    val in = fs.open(manifestPath(dir))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    txt.trim.split(" ") match {
      case Array(m, s) => (m.toInt, s.toInt, TermLayout)
      case Array(m, s, l) => (m.toInt, s.toInt, l)
      case _ => throw new java.io.IOException(s"torn MANIFEST at $dir")
    }
  }

  /** Create a store at `dir` from an initial posting relation (e.g.
    * [[PostingIndex.build]] over the backfilled corpus). */
  def init(spark: SparkSession, posting: DataFrame, dir: String,
           numPartitions: Int = 32,
           layout: String = TermLayout): PostingStore = {
    writeMain(posting, mainPath(dir, 0), layout, numPartitions)
    commit(spark, dir, 0, 0, layout)
    new PostingStore(spark, dir, 0, 0, layout)
  }

  /**
   * Re-open an existing store (e.g. after a restart): the MANIFEST
   * names the last COMMITTED generations; any directory it does not
   * reference — a half-written segment or main from a crashed
   * [[PostingStore.applyBatch]]/[[PostingStore.compact]], or a
   * superseded generation whose deferred delete never ran — is
   * garbage-collected here.
   */
  def open(spark: SparkSession, dir: String): PostingStore = {
    val fs = FileSystem.get(new Path(dir).toUri,
      spark.sparkContext.hadoopConfiguration)
    val (mainGen, segGen, layout) = readManifest(fs, dir)
    def gc(sub: String, prefix: String, live: Int): Unit = {
      val p = new Path(s"$dir/$sub")
      if (fs.exists(p)) fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix) && n.drop(prefix.length).toIntOption.exists(_ != live))
          fs.delete(st.getPath, true)
      }
    }
    gc("main", "g", mainGen); gc("delta", "v", segGen); gc("tomb", "v", segGen)
    new PostingStore(spark, dir, mainGen, segGen, layout)
  }
}
