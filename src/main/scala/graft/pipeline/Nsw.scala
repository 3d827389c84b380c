package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Batch ANN via partition-local navigable-small-world graphs — the
 * Spark-native counterpart of the reference's HNSW path (SURVEY §2.3
 * X6/X9, src/indexes/vector_hnsw.cc via hnswlib; graph algorithm from
 * the public Malkov-Yashunin NSW/HNSW papers, re-implemented).
 *
 * Architecture (SURVEY §7.2 M5 "partition-local graphs + top-k
 * merge"): vectors are hash-partitioned; each partition builds ONE
 * greedy-insertion proximity graph, stored as a single row
 * (keys / vectors / adjacency). A query runs one beam search per
 * partition (mapPartitions — touches ~ef·M nodes, not the whole
 * partition) and the per-partition top-k merge is the same
 * TakeOrderedAndProject the exact path uses. This is exactly the
 * reference's cluster fanout C1/C2 with graphs in place of shards.
 *
 * The persisted graph Dataset plays the role of the in-memory HNSW:
 * build once, query many. Exact [[Ann.topK]] remains the correctness
 * oracle; recall is tunable via `ef` (reference EF_RUNTIME,
 * COMMANDS.md:64-66).
 */
object Nsw {

  /** One partition's graph: parallel arrays + flattened adjacency. */
  final case class PartGraph(
      keys: Array[String],
      vecs: Array[Array[Float]],
      adj: Array[Array[Int]])

  final case class Hit(__key: String, distance: Double)

  private def dist(metric: String)(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    metric match {
      case "L2" =>
        var s = 0.0; var i = 0
        while (i < n) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
        s
      case "IP" =>
        var s = 0.0; var i = 0
        while (i < n) { s += a(i).toDouble * b(i); i += 1 }
        1.0 - s
      case "COSINE" =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val den = math.sqrt(na) * math.sqrt(nb)
        if (den == 0.0) 1.0 else 1.0 - dot / den
    }
  }

  /**
   * Greedy NSW construction for one partition's vectors: each node is
   * inserted by beam-searching the current graph for its
   * `efConstruction` nearest, keeping the best `m` as bidirectional
   * edges, pruning lists back to `maxM`. O(n · ef · M) distance evals.
   */
  private[graft] def buildLocal(keys: Array[String], vecs: Array[Array[Float]],
                                   m: Int, efConstruction: Int,
                                   metric: String): PartGraph = {
    val d = dist(metric) _
    val n = vecs.length
    val adj = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val maxM = 2 * m
    var i = 1
    while (i < n) {
      val found = searchLocal(vecs, adj, vecs(i), efConstruction, i, metric)
      val nearest = found.take(m)
      nearest.foreach { case (_, j) =>
        adj(i) += j
        adj(j) += i
        if (adj(j).length > maxM) {
          // prune j's list to its maxM closest (simple distance prune)
          val pruned = adj(j).map(x => (d(vecs(j), vecs(x)), x))
            .sortBy(t => (t._1, t._2)).take(maxM).map(_._2)
          adj(j).clear(); adj(j) ++= pruned
        }
      }
      i += 1
    }
    PartGraph(keys, vecs, adj.map(_.toArray))
  }

  /** Mutable cell for beam instrumentation (distance evals ≈ hops·M). */
  final class SearchStats { var distEvals: Long = 0L }

  /** Beam (best-first) search over the local graph: returns up to `ef`
    * (distance, nodeIdx) sorted ascending. `limitIdx` restricts to
    * nodes < limitIdx (used during incremental construction).
    *
    * Entry is node 0 BY MEASUREMENT, not omission: greedy-insertion
    * NSW gives early nodes long-range links (Malkov et al. §4), so the
    * node-0 descent costs a near-constant ~200 distance evals from
    * n=20k to n=100k. √n-pivot entry selection and (by the same
    * arithmetic) hnswlib-style multi-layer descent were measured to
    * ADD 7-119% evals at every (n, ef) operating point — see
    * NswEntryExperiment and STATUS.md "entry selection". */
  private[graft] def searchLocal(vecs: Array[Array[Float]],
                                    adj: IndexedSeq[scala.collection.Seq[Int]],
                                    q: Array[Float], ef: Int, limitIdx: Int,
                                    metric: String,
                                    admit: Option[Int => Boolean] = None,
                                    stats: SearchStats = null): Array[(Double, Int)] = {
    val d = dist(metric) _
    val bound = if (limitIdx <= 0) vecs.length else math.min(limitIdx, vecs.length)
    if (bound == 0) return Array.empty
    val admits: Int => Boolean = admit.getOrElse(_ => true)
    val visited = new java.util.BitSet(bound)
    // candidates: min-heap by distance (traversal frontier — unrestricted
    // by the filter, like hnswlib's functor); results: max-heap bounded
    // at ef, admitting only filter-passing nodes.
    val cand = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by[(Double, Int), Double](_._1).reverse)
    val res = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by[(Double, Int), Double](_._1))
    val entry = 0
    val d0 = d(q, vecs(entry))
    if (stats != null) stats.distEvals += 1
    cand.enqueue((d0, entry)); visited.set(entry)
    if (admits(entry)) res.enqueue((d0, entry))
    while (cand.nonEmpty) {
      val (dc, c) = cand.dequeue()
      if (res.size >= ef && dc > res.head._1) {
        cand.clear() // beam exhausted
      } else {
        adj(c).foreach { nb =>
          if (nb < bound && !visited.get(nb)) {
            visited.set(nb)
            val dn = d(q, vecs(nb))
            if (stats != null) stats.distEvals += 1
            if (res.size < ef || dn < res.head._1) {
              cand.enqueue((dn, nb))
              if (admits(nb)) {
                res.enqueue((dn, nb))
                if (res.size > ef) res.dequeue()
              }
            }
          }
        }
      }
    }
    res.dequeueAll.toArray.sortBy(t => (t._1, t._2))
  }

  /** A built, persisted index: one PartGraph row per partition. */
  final case class NswIndex(graphs: Dataset[PartGraph], metric: String,
                            m: Int) {

    /** ANN top-k: one beam search per partition graph, global merge via
      * orderBy+limit (distributed bounded heaps). `ef` ≈ EF_RUNTIME. */
    def search(query: Array[Float], k: Int, ef: Int = 50): DataFrame =
      searchFiltered(query, k, ef, keyFilter = None)

    /**
     * Inline-filtered ANN (reference X9: hnswlib BaseFilterFunctor,
     * vector_hnsw.h:71): the beam TRAVERSES the whole graph but only
     * admits keys passing `keyFilter` to the result heap — so a
     * selective filter doesn't starve the beam the way post-filtering
     * an unfiltered top-k does. The intended functor at scale is a
     * Bloom filter of qualified keys (built distributed via
     * `df.stat.bloomFilter`, broadcast with the closure); false
     * positives are removed by the caller's exact join-back.
     */
    def searchFiltered(query: Array[Float], k: Int, ef: Int,
                       keyFilter: Option[String => Boolean]): DataFrame = {
      val spark = graphs.sparkSession
      import spark.implicits._
      val metricL = metric
      val effEf = math.max(ef, k)
      val hits = graphs.flatMap { g =>
        if (g.keys.isEmpty) Iterator.empty
        else Nsw.searchLocal(g.vecs, g.adj.map(_.toIndexedSeq), query,
            effEf, limitIdx = -1, metricL,
            admit = keyFilter.map(f => (i: Int) => f(g.keys(i))))
          .iterator.take(effEf).map { case (dd, idx) => Hit(g.keys(idx), dd) }
      }
      hits.toDF()
        .orderBy(col("distance").asc, col("__key").asc)
        .limit(k)
    }

    def unpersistIndex(): Unit = { graphs.unpersist(); () }
  }

  /**
   * Persist a built index (reference S5: the RDB chunked HNSW dump,
   * src/rdb_serialization.cc — here the graph Dataset checkpoints as
   * parquet with the search params alongside). Load restores a
   * query-ready index without re-running construction.
   */
  def save(index: NswIndex, path: String): Unit = {
    index.graphs.write.mode("overwrite").parquet(s"$path/graphs")
    val oos = new java.io.ObjectOutputStream(
      new java.io.FileOutputStream(s"$path/meta.bin"))
    try { oos.writeObject((index.metric, index.m)) } finally oos.close()
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): NswIndex = {
    import spark.implicits._
    val ois = new java.io.ObjectInputStream(
      new java.io.FileInputStream(s"$path/meta.bin"))
    val (metric, m) = try ois.readObject().asInstanceOf[(String, Int)]
      finally ois.close()
    val graphs = spark.read.parquet(s"$path/graphs").as[PartGraph]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    NswIndex(graphs, metric, m)
  }

  /**
   * Build: hash-repartition vectors, construct one graph per partition,
   * persist the graph Dataset (build once / query many — the batch
   * stand-in for the reference's resident HNSW).
   *
   * `maxGraphSize` bounds vectors per partition graph: a PartGraph is
   * ONE row, and Spark rows cap at 2 GiB — at the default 250k × 64-dim
   * float32 a graph row stays ~100 MB (vectors + adjacency), so
   * partition count scales automatically with data instead of hitting
   * the row bound. One count() per build (builds are one-time).
   */
  def build(df: DataFrame, keyCol: String, vecCol: String,
            metric: String = "COSINE", numPartitions: Int = 8,
            m: Int = 16, efConstruction: Int = 200,
            maxGraphSize: Int = 250000): NswIndex = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = math.max(numPartitions,
      math.ceil(df.count().toDouble / maxGraphSize).toInt)
    val graphs = df
      .select(col(keyCol).cast("string"), col(vecCol).cast("array<float>"))
      .as[(String, Array[Float])]
      .repartition(parts, col(keyCol))
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else Iterator.single(
          buildLocal(rows.map(_._1), rows.map(_._2), m, efConstruction, metric))
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    NswIndex(graphs, metric, m)
  }
}
