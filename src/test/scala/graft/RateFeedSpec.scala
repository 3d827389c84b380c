package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Source-agnosticism of the ingest path (round-6 verdict "what's
 * missing #1"): [[graft.streaming.Ingest.start]] consumes ANY
 * streaming DataFrame carrying the change-feed contract — the
 * `readStream` source line (file / Kafka / rate) plus a projection is
 * the ONLY per-source delta. Kafka jars are not available offline, so
 * this drives the exact same pipeline from Spark's built-in
 * `rate-micro-batch` source — an UNBOUNDED non-file source with
 * checkpointed offsets, i.e. the Kafka shape — and proves:
 *
 *  1. continuous (non-AvailableNow) ingestion commits batches while
 *     the query runs;
 *  2. stop → restart from the SAME checkpoint resumes at the recorded
 *     offset: at most one in-flight batch is redelivered (the
 *     at-least-once window), everything older is NOT replayed;
 *  3. redelivery is harmless — the per-key LWW-by-`__seq` merge
 *     ([[graft.streaming.Ingest.mergeBatch]] semantics through
 *     [[graft.streaming.DocState.applyBatch]]) is idempotent, so the
 *     final state equals the model regardless of the overlap.
 *
 * The derived-index maintenance hook (`onBatch` → IndexMaintainer) is
 * byte-identical across sources and exercised end-to-end by
 * [[FileFeedSpec]]; this spec pins the source/offset layer.
 */
class RateFeedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("rate-feed-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = ()

  private val docSchema = StructType(Seq(
    StructField("__key", StringType),
    StructField("body", StringType)))

  private val NKeys = 6

  /** The per-source delta: source line + projection into the change
    * contract. Swap `format("rate-micro-batch")` for
    * `format("kafka").option("subscribe", …)` + a value-JSON projection
    * and NOTHING below this function changes. */
  private def rateChanges(rowsPerBatch: Int): DataFrame =
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("numPartitions", 2)
      .load()
      .select(
        lit("upsert").as("op"),
        concat(lit("rk"), pmod(col("value"), lit(NKeys.toLong))).as("__key"),
        concat(lit("doc "), col("value")).as("body"),
        col("value").as("__seq"))

  test("rate-micro-batch change feed: checkpoint resume, bounded redelivery, LWW-idempotent state") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-rate").toString
    val statePath = s"$tmp/state"; val ckpt = s"$tmp/ckpt"
    val sp = spark
    import sp.implicits._

    Ingest_backfillEmpty(statePath)

    // run until at least `minRows` change rows have been committed,
    // recording every delivered __seq (onBatch runs AFTER the state
    // commit, so `delivered` only ever contains committed work)
    def runUntil(minRows: Int, rowsPerBatch: Int): Set[Long] = {
      val delivered = scala.collection.mutable.Set.empty[Long]
      val q = graft.streaming.Ingest.start(spark, rateChanges(rowsPerBatch),
        statePath, ckpt, docSchema,
        onBatch = { b =>
          delivered.synchronized {
            delivered ++= b.select("__seq").collect().map(_.getLong(0))
          }
        },
        trigger = Trigger.ProcessingTime(0L))
      try {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (delivered.synchronized(delivered.size) < minRows &&
               System.nanoTime() < deadline) Thread.sleep(50)
      } finally q.stop()
      assert(delivered.size >= minRows,
        s"stream delivered only ${delivered.size}/$minRows rows in 120s")
      delivered.toSet
    }

    // ---- run 1: continuous ingestion from an unbounded source ----
    val run1 = runUntil(minRows = 12, rowsPerBatch = 4)
    assert(run1.min == 0L, "offsets must start at the source origin")
    assert((run1.max - run1.min + 1) == run1.size.toLong,
      s"run 1 delivered a gapped offset range: ${run1.toSeq.sorted}")

    // ---- run 2: SAME checkpoint — resume, don't replay ----
    val run2 = runUntil(minRows = 8, rowsPerBatch = 4)
    val overlap = run1.intersect(run2)
    assert(overlap.size <= 4, // ≤ one in-flight batch (rowsPerBatch)
      s"checkpoint replayed ${overlap.size} already-committed rows")
    assert(run2.max > run1.max, "run 2 never advanced past run 1")
    val union = run1.union(run2)
    assert((union.max - union.min + 1) == union.size.toLong,
      s"offset coverage has gaps after restart")

    // ---- LWW idempotence: state == model over ALL delivered seqs ----
    val expect = union.groupBy(v => s"rk${v % NKeys}")
      .map { case (k, vs) => (k, s"doc ${vs.max}") }
    val got = graft.streaming.Ingest.readState(spark, statePath)
      .select("__key", "body").as[(String, String)].collect().toMap
    assert(got == expect,
      s"state diverged from LWW model: got=$got expect=$expect")
  }

  /** Backfill with an empty frame of the doc schema — the rate feed
    * starts from nothing, like a fresh Kafka topic. */
  private def Ingest_backfillEmpty(statePath: String): Unit = {
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), docSchema)
    graft.streaming.Ingest.backfill(empty, statePath)
  }
}
