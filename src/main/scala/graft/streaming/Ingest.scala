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
 * Scale: the state table is parquet PARTITIONED BY a key-hash bucket
 * (`__bucket = pmod(xxhash64(__key), nBuckets)`). A micro-batch only
 * reads and rewrites the buckets its keys hash into (dynamic partition
 * overwrite) — write amplification is O(touched buckets / nBuckets) of
 * the state instead of O(state) per batch, and the per-bucket merge
 * shuffles only the touched slice. In production the same dataflow
 * targets a MERGE-capable table format — also for READER ISOLATION:
 * dynamic partition overwrite replaces files in touched buckets in
 * place, so a long-running query over the state can lose files
 * mid-scan, where an ACID table format serves it a consistent
 * snapshot. Hash-bucketed parquet is the simplest durable store
 * available in this container. (The derived-index stores don't share
 * the caveat — [[graft.text.PostingStore]] defers deletions a full
 * mutation interval.)
 */
object Ingest {

  /** State partition column: stable key-hash bucket. */
  private def bucketOf(nBuckets: Int) =
    pmod(xxhash64(col("__key")), lit(nBuckets.toLong))

  /** Backfill (S2): write an initial document table in the bucketed
    * state layout [[start]] maintains incrementally. */
  def backfill(df: DataFrame, statePath: String, nBuckets: Int = 64): Unit =
    df.withColumn("__bucket", bucketOf(nBuckets))
      .write.mode("overwrite").partitionBy("__bucket").parquet(statePath)

  /** Read the maintained state back as a plain document table. */
  def readState(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(statePath).drop("__bucket")

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
   * merge into the bucketed parquet state dir ([[backfill]] writes the
   * initial layout; S2 semantics: same merge path, batch source).
   *
   * Per micro-batch: bucket the batch keys, read ONLY the touched
   * bucket partitions (directory pruning on `__bucket`), merge, and
   * dynamically overwrite ONLY those partitions — untouched buckets'
   * files are never rewritten.
   */
  def start(spark: SparkSession, changes: DataFrame, statePath: String,
            checkpointPath: String,
            docSchema: org.apache.spark.sql.types.StructType,
            nBuckets: Int = 64,
            onBatch: DataFrame => Unit = _ => ()): StreamingQuery = {
    val stateSchema = docSchema.add("__bucket", org.apache.spark.sql.types.LongType)
    changes.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bucketed = batch.withColumn("__bucket", bucketOf(nBuckets))
        val touched = bucketed.select("__bucket").distinct()
          .collect().map(_.getLong(0)) // ≤ nBuckets values
        if (touched.nonEmpty) {
          val current =
            try spark.read.schema(stateSchema).parquet(statePath)
              .filter(col("__bucket").isin(touched.toIndexedSeq: _*))
            catch { case _: Exception => spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema) }
          val merged = mergeBatch(current, bucketed) // keeps __bucket
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            // dynamic overwrite only rewrites partitions PRESENT in the
            // output — a bucket fully emptied by tombstones must be
            // cleared explicitly or its old file would survive
            val nonEmpty = merged.select("__bucket").distinct()
              .collect().map(_.getLong(0)).toSet
            if (nonEmpty.nonEmpty)
              merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__bucket")
                .parquet(statePath)
            val fs = org.apache.hadoop.fs.FileSystem.get(
              spark.sparkContext.hadoopConfiguration)
            touched.filterNot(nonEmpty).foreach { b =>
              fs.delete(new org.apache.hadoop.fs.Path(
                s"$statePath/__bucket=$b"), true)
            }
          } finally { merged.unpersist(blocking = false); () }
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
