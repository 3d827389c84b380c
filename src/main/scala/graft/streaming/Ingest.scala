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
 * Scale: each micro-batch merge shuffles only on `__key`; with the
 * state table bucketed/partitioned by key the merge is co-located. In
 * production the state store would be a table format with MERGE
 * support; here it is hash-partitioned parquet, rewritten per batch —
 * same dataflow, simplest durable store available in this container.
 */
object Ingest {

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
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__key").orderBy(col("__seq").desc, col("op").asc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val survivors = state.join(latest.select("__key"), Seq("__key"), "left_anti")
    val upserts = latest.filter(col("op") === "upsert")
      .select(cols.map(col).toIndexedSeq: _*)
    survivors.select(cols.map(col).toIndexedSeq: _*).unionByName(upserts)
  }

  /**
   * Run the continuous pipeline: change feed → foreachBatch merge into
   * a parquet state dir. Backfill = writing the initial table to
   * `statePath` before starting (S2 semantics: same merge path, batch
   * source).
   */
  def start(spark: SparkSession, changes: DataFrame, statePath: String,
            checkpointPath: String, docSchema: org.apache.spark.sql.types.StructType): StreamingQuery = {
    changes.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val current =
          try spark.read.schema(docSchema).parquet(statePath)
          catch { case _: Exception => spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), docSchema) }
        val merged = mergeBatch(current, batch)
        // rewrite via temp dir: parquet has no transactional MERGE here
        val tmp = statePath + "__next"
        merged.write.mode("overwrite").parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val dst = new org.apache.hadoop.fs.Path(statePath)
        fs.delete(dst, true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
        ()
      }
      .start()
  }
}
