package graft.util

import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Scale-adaptive compute parallelism (optimization guide §2: "make
 * partitioning scale-adaptive — derive from input size — rather than a
 * constant tuned for either local mode or the cluster").
 *
 * Spark's scan parallelism is BYTE-derived (splits of
 * `maxPartitionBytes`, additionally floored by row-group boundaries),
 * and AQE's post-shuffle coalescing is byte-derived too — so a stage
 * whose cost is dominated by per-row COMPUTE (n-gram md5 hashing,
 * simhash, media decode, APPLY expression pipelines) inherits however
 * few partitions the bytes suggested. On a byte-small input that is
 * often ONE partition: the expensive map runs on one core while the
 * rest of the cluster idles.
 *
 * [[ensure]] widens such a plan to the session's default parallelism
 * IFF the optimizer's size estimate says byte-splitting could not have
 * filled the cores (estimate < maxPartitionBytes × defaultParallelism
 * ⟺ estimated partitions < cores). The condition makes it
 * scale-adaptive rather than local-mode tuning:
 *  - at 100 TB the estimate is far past the threshold, so the check is
 *    false and NO exchange is added;
 *  - under the threshold the added exchange moves less than one
 *    default split per core — trivial next to the compute stage it
 *    parallelizes.
 *
 * The probe reads `optimizedPlan.stats.sizeInBytes` — pure planning,
 * never executes anything (unlike an `rdd.getNumPartitions` probe,
 * which under AQE can materialize query stages). Estimates inflated by
 * joins fail SAFE: the plan is left exactly as it was.
 *
 * Round-robin repartition keeps Spark's sort-before-repartition
 * determinism (SPARK-23207): retried tasks reproduce the same
 * row-to-partition assignment, so downstream results are stable.
 */
object Parallelism {

  /** Widen `df` to the session default parallelism when its estimated
    * size says the scan cannot have filled the cores; no-op otherwise.
    * Row-preserving and order-free: place it below per-row compute
    * stages, never between an ORDER BY and a LIMIT. The inserted node
    * sits ABOVE existing filters, so Catalyst still pushes them into
    * the scan (PushedFilters unaffected). */
  def ensure(df: DataFrame): DataFrame = ensureDs(df)

  /** [[ensure]] for typed Datasets (media rows etc.). */
  def ensureDs[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val plan = ds.queryExecution.optimizedPlan
    // idempotence + caller override: a lineage that already carries an
    // EXPLICIT repartition/coalesce (a gate that widened before a
    // compute-heavy map, or deliberately narrowed a trivial planted
    // fixture) keeps the caller's layout — no second exchange
    val callerLaidOut = plan.collectFirst {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
    }.isDefined
    if (callerLaidOut) return ds
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val est = plan.stats.sizeInBytes
    if (est < BigInt(maxSplit) * target) ds.repartition(target) else ds
  }
}
