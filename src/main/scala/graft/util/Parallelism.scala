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
 * [[ensureBytes]] is the SIZE-PROPORTIONAL variant for relations that
 * are laid out once and then served many times (the resident text
 * cache): instead of jumping straight to `defaultParallelism` — which
 * taxes every subsequent sub-100 ms point query with cores× task
 * launches — the target partition count is derived from the size
 * estimate itself (⌈estimate / bytesPerPartition⌉, capped at cores).
 * A byte-small cache then gets a handful of partitions: enough that
 * per-row-heavy predicates (proximity/SLOP) still run multi-core off
 * the cache, without per-task scheduling overhead owning the cheap
 * term lookups (measured in r16: the straight-to-cores layout cost
 * ~30-60 ms/query on ~16 point-lookup gates while winning 2-3× on the
 * three proximity gates; the size-derived target keeps the win and
 * drops the tax). Same 100 TB behaviour as [[ensure]]: past the
 * byte-splitting threshold it is a no-op.
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
  def ensureDs[T](ds: Dataset[T]): Dataset[T] = widen(ds, None)

  /** Size-proportional layout for serve-many relations: repartition to
    * ⌈estimate / bytesPerPartition⌉ (at least 1, at most the default
    * parallelism) when the estimate says byte-splitting could not have
    * filled the cores; no-op otherwise (and at any real scale). */
  def ensureBytes[T](ds: Dataset[T], bytesPerPartition: Long): Dataset[T] =
    widen(ds, Some(bytesPerPartition))

  private def widen[T](ds: Dataset[T], bytesPerPartition: Option[Long]): Dataset[T] = {
    val spark = ds.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val plan = ds.queryExecution.optimizedPlan
    // idempotence + caller override: a lineage that already carries an
    // EXPLICIT layout node — repartition(n)/coalesce, repartition(col)
    // (RepartitionByExpression), or a REBALANCE hint — keeps the
    // caller's layout: a second round-robin exchange would both pay an
    // extra shuffle and destroy a deliberate keyed layout.
    import org.apache.spark.sql.catalyst.plans.logical.{
      Repartition, RepartitionByExpression, RebalancePartitions}
    val callerLaidOut = plan.collectFirst {
      case r: Repartition => r
      case r: RepartitionByExpression => r
      case r: RebalancePartitions => r
    }.isDefined
    if (callerLaidOut) return ds
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val est = plan.stats.sizeInBytes
    if (est >= BigInt(maxSplit) * cores) return ds
    val target = bytesPerPartition match {
      case None => cores
      case Some(b) =>
        val n = ((est + b - 1) / b).min(BigInt(cores)).max(BigInt(1))
        n.toInt
    }
    ds.repartition(target)
  }
}
