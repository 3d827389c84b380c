package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.FsIO

/**
 * Physical layout of the canonical document relation for 100-TB
 * corpora — the piece the reference gets from its keyspace model and
 * Spark gets from Hive-style partitioned parquet:
 *
 *  - **Key-prefix partitioning** (`saveKeyPrefixPartitioned`): the
 *    reference subscribes an index to key PREFIXes
 *    (index_schema.cc prefix subscription; FT.CREATE PREFIX n p1…) —
 *    under Spark the same prefix is a free partition key. A
 *    `__kp=<prefix>` directory layout means an index over prefix
 *    `user:` LISTS only its own files; `keyPrefixPredicate` turns any
 *    key-prefix restriction into a PartitionFilter plus the exact
 *    startsWith.
 *  - **Tag partitioning** (`saveTagPartitioned`): a single-valued hot
 *    TAG column (language, source, tenant) written as the partition
 *    column needs NO query-side cooperation: the engine's compiled
 *    TAG predicate (`array_contains(split(tagcol,sep), v)`) references
 *    only the partition column, so Catalyst evaluates it per-PARTITION
 *    and prunes files before any scan task launches.
 *  - **Numeric bucketing** (`saveNumericBucketed`): NUMERIC range
 *    predicates reference the data column, which a directory layout
 *    cannot see — so ranges prune via a derived
 *    `__nb = floor(col/step)` partition column plus the engine-side
 *    [[graft.engine.NumericBucketLayout]] hint, which ANDs the
 *    implied `__nb BETWEEN floor(lo/step) AND floor(hi/step)` under
 *    the filter (a superset by construction — the compiled range
 *    predicate still owns exact semantics). Rows inside each bucket
 *    are additionally sorted by the column so parquet min/max stats
 *    skip row groups within surviving files.
 *
 * The layout is self-describing: `save*` writes a `_graft_layout`
 * descriptor next to the data and [[Layout.describe]] reads it back,
 * so a reader (or [[Layout.registerHints]]) can derive the pruning
 * rules without out-of-band knowledge. Correctness never depends on
 * the layout — every prune predicate is implied by the exact
 * predicate it rides under.
 */
object Layout {

  /** Self-describing layout descriptor persisted as `_graft_layout`. */
  final case class TableLayout(kind: String, sourceCol: String,
                               partitionCol: String, step: Double,
                               prefixLen: Int) extends Serializable

  private def writeDesc(df: DataFrame, path: String, d: TableLayout): Unit =
    FsIO.writeObjAtomic(df.sparkSession, s"$path/_graft_layout", d)

  /** Read a layout descriptor written by the `save*` methods. */
  def describe(spark: SparkSession, path: String): Option[TableLayout] =
    FsIO.readObj[TableLayout](spark, s"$path/_graft_layout")

  /** Write `df` partitioned by the first `prefixLen` characters of
    * `keyCol` (directory column `__kp`). Partition count is bounded by
    * the key alphabet^prefixLen — choose a prefix length that yields
    * hundreds-to-thousands of partitions at the target scale. */
  def saveKeyPrefixPartitioned(df: DataFrame, keyCol: String, path: String,
                               prefixLen: Int = 2): DataFrame = {
    df.withColumn("__kp", substring(col(keyCol).cast("string"), 1, prefixLen))
      .write.mode("overwrite").partitionBy("__kp").parquet(path)
    writeDesc(df, path, TableLayout("keyPrefix", keyCol, "__kp", 0.0, prefixLen))
    df.sparkSession.read.parquet(path)
  }

  /** The pruning predicate for a key-prefix restriction over a
    * [[saveKeyPrefixPartitioned]] layout: a PartitionFilter on `__kp`
    * (startsWith when the query prefix is shorter than the layout
    * prefix, equality otherwise) ANDed with the exact startsWith. */
  def keyPrefixPredicate(keyCol: Column, prefix: String, prefixLen: Int,
                         partitionCol: String = "__kp"): Column = {
    val kpCond =
      if (prefix.length >= prefixLen) col(partitionCol) === prefix.take(prefixLen)
      else col(partitionCol).startsWith(prefix)
    kpCond && keyCol.cast("string").startsWith(prefix)
  }

  /** Write `df` partitioned by a SINGLE-VALUED tag column. The
    * engine's compiled TAG predicate then prunes partitions with no
    * query-side cooperation (its only column reference IS the
    * partition column). Multi-valued tag fields cannot use a
    * directory layout — a row lives in exactly one directory. */
  def saveTagPartitioned(df: DataFrame, tagCol: String, path: String): DataFrame = {
    df.write.mode("overwrite").partitionBy(tagCol).parquet(path)
    writeDesc(df, path, TableLayout("tag", tagCol, tagCol, 0.0, 0))
    df.sparkSession.read.parquet(path)
  }

  /** Write `df` partitioned by `floor(numCol/step)` (directory column
    * `__nb`), rows sorted by `numCol` inside each bucket so parquet
    * min/max stats also skip row groups within surviving files.
    * Query-side: register a [[graft.engine.NumericBucketLayout]] hint
    * (or use [[registerHints]]) so NUMERIC ranges prune buckets. */
  def saveNumericBucketed(df: DataFrame, numCol: String, step: Double,
                          path: String): DataFrame = {
    require(step > 0, "step must be positive")
    df.withColumn("__nb", floor(col(numCol).cast("double") / step).cast("long"))
      .sortWithinPartitions(col(numCol))
      .write.mode("overwrite").partitionBy("__nb").parquet(path)
    writeDesc(df, path, TableLayout("numericBucket", numCol, "__nb", step, 0))
    df.sparkSession.read.parquet(path)
  }

  /** Register the engine-side pruning hint a saved layout implies (a
    * no-op for layouts that prune natively). Call AFTER createIndex —
    * like all derived registrations. `field` is the schema field name
    * whose alias reads from the layout's source column (unused by the
    * keyPrefix layout, which keys off the index's PREFIX
    * subscriptions). */
  def registerHints(engine: graft.engine.SearchEngine, indexName: String,
                    spark: SparkSession, path: String, field: String): Unit =
    describe(spark, path).foreach {
      case TableLayout("numericBucket", _, pc, step, _) =>
        engine.registerLayout(indexName, field,
          graft.engine.NumericBucketLayout(pc, step))
      case TableLayout("keyPrefix", _, pc, _, plen) =>
        engine.registerKeyPrefixLayout(indexName,
          graft.engine.KeyPrefixLayout(pc, plen))
      case _ => () // tag partitioning prunes natively
    }
}
