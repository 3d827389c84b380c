package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Planner metadata for one posting relation: per-term counts — the
 * analogue of the reference's O(1) posting-list sizes on its radix
 * nodes, which its planner reads for min-child / cardinality decisions
 * WITHOUT touching the lists (src/query/search.cc:336-347).
 *
 * Two tiers, so the routing guard NEVER runs a count of a posting
 * slice at planning time (the round-4 scale finding: past the
 * vocabulary cap the old fallback was a blocking `keys.count()` job
 * per conjunct, which at 100-TB vocabularies would serialize plan
 * construction):
 *
 *  - `hot` — a full per-term map on the driver, when the vocabulary
 *    fits [[PostingStats.hotCap]]. Lookups are O(1), planning runs
 *    ZERO Spark jobs. The normal case.
 *  - `relation` — the SAME counts as data: a tiny term-sorted parquet
 *    relation `(term, cnt)` persisted beside the posting. Past the
 *    cap, a lookup is one pushed point-read of the stats file (footer
 *    + one row group — O(1) in corpus size, never proportional to a
 *    hot term's posting slice). `overlay` adds counts of terms
 *    changed since the relation was last persisted (maintained
 *    stores; additive upper bound, same soundness as the hot map's
 *    between-compaction adds: over-estimates only over-reject into
 *    the always-correct scan).
 *
 * A posting with NEITHER tier simply does not route — the guard
 * declines rather than paying a data-proportional job.
 */
final class PostingStats(
    val hot: Option[Map[String, Long]],
    val relation: Option[DataFrame],
    overlay: () => Map[String, Long]) {

  private def sumOf(df: DataFrame): Long = {
    val r = df.agg(sum(col("cnt"))).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Count for one term (0 for unseen); None when untracked. */
  def lookup(term: String): Option[Long] =
    hot.map(_.getOrElse(term, 0L)).orElse(relation.map { rel =>
      sumOf(rel.filter(col("term") === term)) + overlay().getOrElse(term, 0L)
    })

  /** The tracked distinct-term universe: the hot key set when resident
    * (the maintained merge is additive, so keys cover every term seen
    * since the last exact refresh), else the stats relation's `term`
    * column unioned with any overlay terms added since it was
    * persisted. Serves FT.INFO `num_terms` in O(vocabulary) — never a
    * corpus-proportional job (the reference answers from counters it
    * maintains per mutation; the stats relation IS that counter store
    * here). Between compactions a maintained store may retain terms
    * whose last document was deleted — the same additive upper-bound
    * semantics the routing guard already documents. */
  def termUniverse: Either[Set[String], DataFrame] = hot match {
    case Some(m) => Left(m.keySet ++ overlay().keys)
    case None =>
      val rel = relation.get.select(col("term"))
      val ov = overlay().keys.toSeq
      Right(
        if (ov.isEmpty) rel
        else rel.union(rel.sparkSession
          .createDataset(ov)(org.apache.spark.sql.Encoders.STRING)
          .toDF("term")))
  }

  /** The (term, cnt) counts as data — the persistence form: the hot
    * map when resident (it already folds maintenance adds), else the
    * stats relation (an un-persisted overlay re-derives on the next
    * maintained publish; both tiers keep the same additive
    * upper-bound contract the routing guard documents). */
  def countsRelation(spark: SparkSession): DataFrame = hot match {
    case Some(m) =>
      import org.apache.spark.sql.Encoders
      spark.createDataset(m.toSeq)(
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong)).toDF("term", "cnt")
    case None => relation.get
  }

  /** Sum of counts over matching terms; `dataPred` must be the same
    * predicate expressed over the `term` column (pushed into the tiny
    * stats scan on the data path). */
  def matchSum(p: String => Boolean, dataPred: Column): Option[Long] =
    hot.map(_.iterator.collect { case (t, c) if p(t) => c }.sum)
      .orElse(relation.map { rel =>
        sumOf(rel.filter(dataPred)) +
          overlay().iterator.collect { case (t, c) if p(t) => c }.sum
      })
}

object PostingStats {

  /** Driver hot-cache bound (entries per posting field). */
  val hotCap = 1000000

  def hotOnly(m: Map[String, Long]): PostingStats =
    new PostingStats(Some(m), None, () => Map.empty)

  def apply(hot: Option[Map[String, Long]], relation: Option[DataFrame],
            overlay: () => Map[String, Long] = () => Map.empty): PostingStats =
    new PostingStats(hot, relation, overlay)

  /** The (term, cnt) stats relation of a posting (one row per term). */
  def compute(statRows: DataFrame): DataFrame =
    statRows.groupBy(col("term")).agg(count(lit(1)).as("cnt"))

  /** Persist a stats relation term-sorted in one file: a point lookup
    * reads the footer plus one row group, independent of corpus size. */
  def save(stats: DataFrame, path: String): Unit =
    stats.coalesce(1).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Stats over a persisted relation, with the hot cache populated
    * when the vocabulary fits the cap. */
  def fromRelation(rel: DataFrame): PostingStats = {
    val rows = rel.limit(hotCap + 1).collect()
    val hot =
      if (rows.length <= hotCap)
        Some(rows.map(r => r.getString(0) -> r.getLong(1)).toMap)
      else None
    new PostingStats(hot, Some(rel), () => Map.empty)
  }

  /** Compute + persist + register-ready in one step (buildPostings /
    * loadPostings upgrade path). */
  def persist(statRows: DataFrame, path: String): PostingStats = {
    save(compute(statRows), path)
    fromRelation(load(statRows.sparkSession, path))
  }
}
