package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model._

/**
 * Continuous ingestion — the Spark-native form of the reference's
 * keyspace-notification write path (SURVEY §2.1 S1/S2;
 * src/index_schema.cc:560,591,855,964): a change feed of per-key
 * upserts/deletes drives incremental maintenance of the document
 * table; a backfill batch load covers pre-existing data.
 *
 * Semantics preserved from the reference:
 *  - per-key last-write-wins, ordered by a monotonic sequence column
 *    (the reference dedupes queued mutations per key and applies the
 *    latest state, index_schema.cc ScheduleMutation);
 *  - deletes are tombstones — the key disappears from the table
 *    (keyspace DEL/expire/evict notifications);
 *  - a key whose content is INVALID for the schema (e.g. non-numeric
 *    bytes in a NUMERIC field) is dropped wholesale, surfaced via
 *    [[validate]]'s side output (index_base.h:43-47 Redisearch-compat).
 *
 * Change-feed contract: `op` ∈ {upsert, delete}, `__key`, `__seq`
 * (monotonic), plus the document columns.
 *
 * Scale: the state table is [[DocState]] — parquet bucketed by
 * `pmod(xxhash64(__key), nBuckets)`, one immutable generation dir per
 * bucket write, committed by atomic MANIFEST rename. A micro-batch
 * reads and rewrites ONLY the buckets its keys hash into (path-level
 * pruning; write amplification O(touched buckets / nBuckets) of the
 * state), and readers get SNAPSHOT ISOLATION: [[readState]] captures
 * the manifest's committed dirs, and a concurrent batch defers
 * deleting the superseded files one full mutation interval — a
 * long-running query never loses files mid-scan (the reference's
 * readers get the same from its time-sliced read lock,
 * src/query/search.cc:845; the posting stores from the same deferred
 * deletion, [[graft.text.PostingStore]]).
 */
object Ingest {

  /** Backfill (S2): write an initial document table in the bucketed
    * state layout [[start]] maintains incrementally. */
  def backfill(df: DataFrame, statePath: String, nBuckets: Int = 64): Unit = {
    DocState.init(df, statePath, nBuckets); ()
  }

  /** A consistent snapshot of the maintained state as a plain document
    * table — survives concurrent [[start]] batches for one mutation
    * interval; re-call for a fresher snapshot. */
  def readState(spark: SparkSession, statePath: String): DataFrame =
    DocState.read(spark, statePath).drop("__bucket")

  /** Split a raw document batch into (valid, dropped) per the schema's
    * typed fields — the ingest-time validation side output. */
  def validate(df: DataFrame, schema: IndexSchema): (DataFrame, DataFrame) = {
    val numericChecks = schema.fields.collect {
      case FieldDef(id, _, NumericField) =>
        // invalid = present but not convertible (strtod-fail ⇒ drop key);
        // try_cast: ANSI-safe NULL-on-failure
        col(id).isNotNull && col(id).try_cast("double").isNull
    }
    if (numericChecks.isEmpty) (df, df.limit(0))
    else {
      val invalid = numericChecks.reduce(_ || _)
      (df.filter(!coalesce(invalid, lit(false))), df.filter(coalesce(invalid, lit(false))))
    }
  }

  /**
   * Merge one change batch into the current state: per-key
   * last-write-wins by (__seq), tombstones removed. Pure DataFrame →
   * DataFrame so it is unit-testable without a stream.
   */
  def mergeBatch(state: DataFrame, changes: DataFrame): DataFrame = {
    val cols = state.columns.filter(c => c != "op" && c != "__seq")
    // newest change per key wins (max __seq; arbitrary-but-stable
    // tiebreak on op to keep the merge deterministic)
    val latest = dedupePerKey(changes)
    val survivors = state.join(latest.select("__key"), Seq("__key"), "left_anti")
    val upserts = latest.filter(col("op") === "upsert")
      .select(cols.map(col).toIndexedSeq: _*)
    survivors.select(cols.map(col).toIndexedSeq: _*).unionByName(upserts)
  }

  /**
   * Run the continuous pipeline: change feed → foreachBatch incremental
   * merge through [[DocState.applyBatch]] ([[backfill]] writes the
   * initial layout; S2 semantics: same merge path, batch source).
   *
   * Per micro-batch: read ONLY the touched buckets' live generation
   * dirs, merge, write them as NEW generation dirs, commit via atomic
   * MANIFEST swap, defer deleting the superseded dirs one batch —
   * untouched buckets' files are never rewritten, and in-flight
   * readers keep their snapshot (see [[DocState]]).
   */
  def start(spark: SparkSession, changes: DataFrame, statePath: String,
            checkpointPath: String,
            docSchema: org.apache.spark.sql.types.StructType,
            nBuckets: Int = 64,
            onBatch: DataFrame => Unit = _ => (),
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // GC of crash leftovers happens here, at stream (re)start — the
    // writer-open contract (no readers in flight); per-batch deletes
    // are all deferred
    val state = DocState.openWriter(spark, statePath, docSchema, nBuckets)
    changes.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (state.applyBatch(batch)) {
          // Derived-index maintenance (reference per-mutation path,
          // index_schema.cc:964): hand the deduped change batch —
          // latest op per key, original change-feed columns — to the
          // caller so posting stores ([[graft.text.PostingStore]]) and
          // ANN graphs ([[graft.pipeline.Nsw.upsert]]) stay fresh
          // without a rebuild. Runs AFTER the state commit so an
          // index-maintenance failure never loses document data.
          onBatch(dedupePerKey(batch))
        }
        ()
      }
      .start()
  }

  /** Latest change per key (the same LWW rule [[mergeBatch]] applies). */
  def dedupePerKey(changes: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__key").orderBy(col("__seq").desc, col("op").asc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
