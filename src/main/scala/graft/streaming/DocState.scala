package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructType}

import graft.util.FsIO

/**
 * Snapshot-isolated bucketed document state — the [[graft.text
 * .PostingStore]] manifest pattern generalized to the ingest state
 * table (the reference gives its readers isolation from the
 * time-sliced read lock, src/query/search.cc:845; a file-backed state
 * gets it from immutable generations + deferred deletion):
 *
 *  - rows live in `g<N>/__bpart=<bucket>/` parquet dirs — every write
 *    creates a NEW generation dir, never touching files a reader may
 *    hold;
 *  - `MANIFEST` names the live generation of every non-empty bucket
 *    (plus the bucket count and the document schema); it is written
 *    tmp + atomic-rename, so a crash at any point leaves the previous
 *    complete mapping — pointing at dirs no writer has deleted yet;
 *  - superseded bucket dirs are queued and deleted at the NEXT batch
 *    ([[PostingStore]]'s deferred-deletion grace): a query planned
 *    against the previous [[DocState.read]] snapshot keeps its files
 *    for one full mutation interval instead of losing them mid-scan;
 *  - [[DocState.openWriter]] garbage-collects everything the manifest
 *    does not reference (crash orphans, never-drained deferred queues)
 *    — the restart contract, when no readers are in flight.
 *
 * Write amplification matches the old dynamic-partition-overwrite
 * layout: a batch writes ONLY its touched buckets (one job,
 * `partitionBy` on the bucket), and reads only their live dirs
 * (path-level pruning — untouched buckets are never listed).
 * `__bucket` stays a DATA column; the partition dir key `__bpart`
 * duplicates it so leaf dirs read standalone with full schema.
 */
final class DocState private (
    spark: SparkSession, dir: String,
    val docSchema: StructType, val numBuckets: Int,
    private var gens: Map[Long, Int], private var nextGen: Int) {

  import DocState._

  /** Document schema plus the `__bucket` hash column. */
  val stateSchema: StructType = docSchema.add("__bucket", LongType)

  // deferred-deletion queue: superseded bucket dirs, removed at the
  // NEXT applyBatch (one mutation interval of reader grace)
  private var pendingRm: Seq[String] = Nil
  private def drainThenQueue(paths: Seq[String]): Unit = {
    val parents = pendingRm.map(p => p.substring(0, p.lastIndexOf('/')))
    pendingRm.foreach(FsIO.deleteRecursive(spark, _))
    // a generation dir whose buckets are all gone is dead wholesale
    parents.distinct.foreach { g =>
      if (!FsIO.listSubdirs(spark, g).exists(_.startsWith(BPart)))
        FsIO.deleteRecursive(spark, g)
    }
    pendingRm = paths
  }

  private def bucketPath(b: Long, g: Int) = s"$dir/g$g/$BPart$b"

  /** The live rows of `buckets` (stateSchema columns; empty DF when
    * none of them hold data). */
  def viewBuckets(buckets: Seq[Long]): DataFrame = {
    val paths = buckets.flatMap(b => gens.get(b).map(bucketPath(b, _)))
    if (paths.isEmpty) spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
    else spark.read.schema(stateSchema).parquet(paths: _*)
  }

  /** The whole live state (stateSchema columns). */
  def view: DataFrame = viewBuckets(gens.keys.toSeq)

  /**
   * Merge one change batch (change-feed contract: op/__key/__seq +
   * document columns, `__bucket` NOT yet attached) and commit:
   * write touched buckets as new generation dirs, swap the MANIFEST,
   * defer deletion of the superseded dirs one batch. Returns false
   * (and does nothing) for an empty batch.
   */
  def applyBatch(changes: DataFrame): Boolean = {
    val bucketed = changes.withColumn("__bucket", bucketCol(numBuckets))
    val touched = bucketed.select("__bucket").distinct()
      .collect().map(_.getLong(0)).toSeq // ≤ numBuckets values
    if (touched.isEmpty) false
    else {
      val merged = Ingest.mergeBatch(viewBuckets(touched), bucketed)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try commit(merged, touched)
      finally { merged.unpersist(blocking = false); () }
      true
    }
  }

  /** Write `rows` (stateSchema shape, covering exactly the buckets in
    * `touched` — possibly minus ones the batch emptied) as generation
    * `nextGen`, then commit via MANIFEST rename. */
  private def commit(rows: DataFrame, touched: Seq[Long]): Unit = {
    val g = nextGen
    // cluster by bucket BEFORE the partitioned write: without it every
    // shuffle task holding rows of a bucket writes its own file into
    // that bucket's dir — measured 10,652 files for a 437-bucket
    // generation (~24 per bucket), and every later read/merge pays the
    // per-file open cost ~24×. One shuffle of the batch (tiny) buys
    // exactly one file per touched bucket.
    rows.withColumn("__bpart", col("__bucket"))
      .repartition(col("__bpart"))
      .write.partitionBy("__bpart").parquet(s"$dir/g$g")
    // buckets that actually produced rows; a bucket the batch emptied
    // (all keys tombstoned) simply drops out of the manifest
    val nonEmpty = FsIO.listSubdirs(spark, s"$dir/g$g")
      .filter(_.startsWith(BPart)).map(_.drop(BPart.length).toLong).toSet
    val superseded = touched.flatMap(b => gens.get(b).map(bucketPath(b, _)))
    gens = gens -- touched ++ nonEmpty.map(_ -> g)
    nextGen = g + 1
    writeManifest(spark, dir, docSchema, numBuckets, gens, nextGen) // ← commit
    drainThenQueue(superseded)
  }
}

object DocState {

  private val BPart = "__bpart="

  /** State partition column: stable key-hash bucket. */
  def bucketCol(nBuckets: Int) =
    pmod(xxhash64(col("__key")), lit(nBuckets.toLong))

  private def manifestPath(dir: String) = s"$dir/MANIFEST"

  private def writeManifest(spark: SparkSession, dir: String,
                            schema: StructType, nBuckets: Int,
                            gens: Map[Long, Int], nextGen: Int): Unit = {
    val body = gens.toSeq.sorted.map { case (b, g) => s"$b $g" }
    FsIO.writeTextAtomic(spark, manifestPath(dir),
      (s"v1 $nextGen $nBuckets" +: schema.json +: body).mkString("\n"))
  }

  private def readManifest(spark: SparkSession, dir: String)
      : Option[(StructType, Int, Map[Long, Int], Int)] =
    FsIO.readText(spark, manifestPath(dir)).map { txt =>
      val lines = txt.split("\n")
      val header = lines(0).split(" ")
      require(header.length == 3 && header(0) == "v1",
        s"torn MANIFEST at $dir")
      val schema = DataType.fromJson(lines(1)).asInstanceOf[StructType]
      val gens = lines.drop(2).filter(_.nonEmpty).map { l =>
        val Array(b, g) = l.split(" "); b.toLong -> g.toInt
      }.toMap
      (schema, header(2).toInt, gens, header(1).toInt)
    }

  /** Create (or REPLACE) the state at `dir` from an initial corpus —
    * the backfill write. `df` carries the document columns incl.
    * `__key`; the bucket column is attached here. */
  def init(df: DataFrame, dir: String, nBuckets: Int = 64): DocState = {
    val spark = df.sparkSession
    FsIO.deleteRecursive(spark, dir)
    val docSchema = df.schema
    val st = new DocState(spark, dir, docSchema, nBuckets, Map.empty, 0)
    st.commit(df.withColumn("__bucket", bucketCol(nBuckets)),
      touched = Nil)
    st
  }

  /**
   * Open the state for WRITING (the restart path — assumes no readers
   * in flight): loads the manifest and garbage-collects every dir it
   * does not reference (crash orphans, never-drained deferred-delete
   * queues). When no manifest exists yet, initializes an EMPTY state
   * with `docSchema`/`nBuckets` (the stream-before-backfill case).
   */
  def openWriter(spark: SparkSession, dir: String,
                 docSchema: => StructType,
                 nBuckets: => Int = 64): DocState =
    readManifest(spark, dir) match {
      case None =>
        val st = new DocState(spark, dir, docSchema, nBuckets, Map.empty, 0)
        writeManifest(spark, dir, st.docSchema, st.numBuckets, Map.empty, 0)
        st
      case Some((schema, nb, gens, nextGen)) =>
        val liveByGen = gens.groupBy(_._2).map { case (g, m) => g -> m.keySet }
        FsIO.listSubdirs(spark, dir)
          .filter(n => n.startsWith("g") && n.drop(1).forall(_.isDigit))
          .foreach { n =>
            liveByGen.get(n.drop(1).toInt) match {
              case None => FsIO.deleteRecursive(spark, s"$dir/$n")
              case Some(live) =>
                FsIO.listSubdirs(spark, s"$dir/$n")
                  .filter(s => s.startsWith(BPart) &&
                    !live.contains(s.drop(BPart.length).toLong))
                  .foreach(s => FsIO.deleteRecursive(spark, s"$dir/$n/$s"))
            }
          }
        new DocState(spark, dir, schema, nb, gens, nextGen)
    }

  /**
   * READ a consistent snapshot of the state (no GC, no mutation): the
   * manifest names the committed bucket dirs; the returned DataFrame
   * keeps reading exactly those files even if a concurrent
   * [[DocState.applyBatch]] commits — deferred deletion guarantees
   * them for one mutation interval. Re-call for a fresher snapshot.
   */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val (schema, _, gens, _) = readManifest(spark, dir).getOrElse(
      throw new java.io.FileNotFoundException(
        s"no document state at $dir (no MANIFEST)"))
    val stateSchema = schema.add("__bucket", LongType)
    val paths = gens.toSeq.map { case (b, g) => s"$dir/g$g/$BPart$b" }
    if (paths.isEmpty) spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
    else spark.read.schema(stateSchema).parquet(paths: _*)
  }
}
