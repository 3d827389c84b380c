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

  /** One partition's graph: parallel arrays + flattened adjacency.
    * `pid` is the hash-partition this graph owns (routing key for
    * incremental upserts); `removed` are dead node INDICES (a deleted
    * or superseded key's node stays in the arrays for navigation,
    * hnswlib-style mark-delete, but is never admitted to results). */
  final case class PartGraph(
      pid: Int,
      keys: Array[String],
      vecs: Array[Array[Float]],
      adj: Array[Array[Int]],
      removed: Array[Int])

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

  /** Insert node `i` (vecs(i)/adj(i) already allocated) into the graph
    * of nodes < i: beam-search its `efConstruction` nearest, keep the
    * best `m` as bidirectional edges, prune lists back to 2m. Shared
    * by full construction and incremental [[upsert]]. */
  private def insertNode(vecs: Array[Array[Float]],
                         adj: Array[scala.collection.mutable.ArrayBuffer[Int]],
                         i: Int, m: Int, efConstruction: Int,
                         metric: String): Unit = {
    if (i == 0) return // first node of an empty graph: no neighbors yet
    val d = dist(metric) _
    val maxM = 2 * m
    val found = searchLocal(vecs, adj, vecs(i), efConstruction, i, metric)
    found.take(m).foreach { case (_, j) =>
      adj(i) += j
      adj(j) += i
      if (adj(j).length > maxM) {
        // prune j's list to its maxM closest (simple distance prune)
        val pruned = adj(j).map(x => (d(vecs(j), vecs(x)), x))
          .sortBy(t => (t._1, t._2)).take(maxM).map(_._2)
        adj(j).clear(); adj(j) ++= pruned
      }
    }
  }

  /**
   * Greedy NSW construction for one partition's vectors: repeated
   * [[insertNode]]. O(n · ef · M) distance evals.
   */
  private[graft] def buildLocal(keys: Array[String], vecs: Array[Array[Float]],
                                   m: Int, efConstruction: Int,
                                   metric: String): PartGraph = {
    val n = vecs.length
    val adj = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    var i = 1
    while (i < n) {
      insertNode(vecs, adj, i, m, efConstruction, metric)
      i += 1
    }
    PartGraph(0, keys, vecs, adj.map(_.toArray), Array.empty)
  }

  /**
   * Apply one routed change slice to one partition graph. Upsert =
   * mark the key's current node removed + insert a fresh node via the
   * construction path; delete = mark removed (the node keeps serving
   * as a navigation waypoint, hnswlib mark-delete). Deterministic:
   * changes apply in key order. Callers dedupe per key first
   * (last-write-wins — [[graft.streaming.Ingest.mergeBatch]] shape).
   */
  private[graft] def applyLocal(g: PartGraph,
                                changes: Array[(String, String, Array[Float])],
                                m: Int, efConstruction: Int,
                                metric: String,
                                rebuildFraction: Double = 0.5): PartGraph = {
    val nOld = g.keys.length
    val nUp = changes.count(_._1 == "upsert")
    val cap = nOld + nUp
    val keys = java.util.Arrays.copyOf(g.keys.asInstanceOf[Array[AnyRef]], cap)
      .asInstanceOf[Array[String]]
    val vecs = java.util.Arrays.copyOf(g.vecs.asInstanceOf[Array[AnyRef]], cap)
      .asInstanceOf[Array[Array[Float]]]
    val adj = Array.fill(cap)(scala.collection.mutable.ArrayBuffer.empty[Int])
    var i = 0
    while (i < nOld) { adj(i) ++= g.adj(i); i += 1 }
    val removed = new java.util.BitSet(cap)
    g.removed.foreach(removed.set)
    val liveIdx = scala.collection.mutable.HashMap.empty[String, Int]
    i = 0
    while (i < nOld) { if (!removed.get(i)) liveIdx(g.keys(i)) = i; i += 1 }
    var n = nOld
    changes.sortBy(_._2).foreach { case (op, key, vec) =>
      // Unchanged-vector upserts are a no-op (reference
      // VectorBase::ModifyRecord returns kMissing when the new vector
      // equals the tracked one, vector_base.cc:236-241): skipping the
      // tombstone + reinsert keeps no-op document updates from
      // churning the graph (dead-node growth → premature rebuilds).
      val unchanged = op == "upsert" && vec != null &&
        liveIdx.get(key).exists(oldI => java.util.Arrays.equals(vecs(oldI), vec))
      if (!unchanged) {
        liveIdx.remove(key).foreach(removed.set) // supersede / delete
        if (op == "upsert") {
          keys(n) = key; vecs(n) = vec
          insertNode(vecs, adj, n, m, efConstruction, metric)
          liveIdx(key) = n
          n += 1
        }
      }
    }
    val deadCount = removed.cardinality()
    // Dead-node compaction (the trade hnswlib makes with resizeIndex /
    // the reference makes by mutating in place): mark-removed waypoints
    // keep navigation cheap until they dominate the arrays — past the
    // threshold, rebuild this partition's graph from its LIVE nodes so
    // beam cost tracks the live count, not the churn history.
    if (n > 0 && deadCount.toDouble / n > rebuildFraction) {
      val live = (0 until n).filterNot(removed.get)
      buildLocal(live.map(keys).toArray, live.map(vecs).toArray,
        m, efConstruction, metric).copy(pid = g.pid)
    } else
      PartGraph(g.pid, keys.take(n), vecs.take(n), adj.take(n).map(_.toArray),
        (0 until n).filter(removed.get).toArray)
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

  /** A built, persisted index: one PartGraph row per partition.
    * `nParts` is the hash-partitioning modulus vectors were routed
    * with at build time — [[upsert]] must route changes identically
    * (0 marks a legacy save whose routing is unknown). */
  final case class NswIndex(graphs: Dataset[PartGraph], metric: String,
                            m: Int, nParts: Int) {

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
        else {
          // removed nodes stay navigable but are never admitted
          val admit: Option[Int => Boolean] =
            if (g.removed.isEmpty) keyFilter.map(f => (i: Int) => f(g.keys(i)))
            else {
              val dead = new java.util.BitSet(g.keys.length)
              g.removed.foreach(dead.set)
              keyFilter match {
                case Some(f) => Some((i: Int) => !dead.get(i) && f(g.keys(i)))
                case None => Some((i: Int) => !dead.get(i))
              }
            }
          Nsw.searchLocal(g.vecs, g.adj.map(_.toIndexedSeq), query,
              effEf, limitIdx = -1, metricL, admit = admit)
            .iterator.take(effEf).map { case (dd, idx) => Hit(g.keys(idx), dd) }
        }
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
    graft.util.FsIO.writeObjAtomic(index.graphs.sparkSession,
      s"$path/meta.bin", (index.metric, index.m, index.nParts))
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): NswIndex = {
    import spark.implicits._
    val (metric, m, nParts) = graft.util.FsIO
      .readObj[Any](spark, s"$path/meta.bin")
      .getOrElse(throw new java.io.FileNotFoundException(
        s"no NSW checkpoint at $path (missing meta.bin)")) match {
      case (a: String, b: Int, c: Int) => (a, b, c)
      case (a: String, b: Int) => (a, b, 0) // legacy save: no routing info
    }
    val raw = spark.read.parquet(s"$path/graphs")
    // legacy saves predate pid/removed — searchable, not upsertable
    val filled = Seq("pid" -> "0", "removed" -> "array()")
      .foldLeft(raw) { case (df, (c, default)) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, org.apache.spark.sql.functions.expr(default)
          .cast(if (c == "pid") "int" else "array<int>"))
      }
    val graphs = filled.as[PartGraph]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    NswIndex(graphs, metric, m, nParts)
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
          buildLocal(rows.map(_._1), rows.map(_._2), m, efConstruction, metric)
            .copy(pid = org.apache.spark.TaskContext.getPartitionId()))
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    NswIndex(graphs, metric, m, parts)
  }

  /**
   * Incremental maintenance (reference per-mutation path,
   * src/index_schema.cc:964 ProcessMutation → vector index add/remove):
   * apply one deduped change batch (`op` ∈ upsert|delete, `__key`,
   * vector column named `vec`) WITHOUT rebuilding untouched partition
   * graphs — changes route to their build-time hash partition
   * (`pmod(hash(key), nParts)`, identical to the `repartition` the
   * build used, which deletes depend on), cogroup against the graph
   * rows, and only cogroups that received changes run [[applyLocal]];
   * every other graph row passes through by reference. Upserted keys'
   * old nodes and deleted keys become mark-removed waypoints; when a
   * partition's dead fraction exceeds `rebuildFraction` the cogroup
   * rebuilds THAT partition from its live nodes (automatic compaction,
   * the same trade the posting delta makes) — so beam cost tracks the
   * live count under sustained churn, never the churn history. When
   * GROWTH pushes a partition's live count past `maxGraphSize`, nParts
   * doubles and every graph splits locally (see the split block below) —
   * so per-partition build/search budgets hold under unbounded adds.
   *
   * Returns a NEW materialized index; the input index's cache is
   * released (its `graphs` handle must not be reused).
   */
  /** JVM-side mirror of the routing column `pmod(hash(__key), n)` —
    * Murmur3 seed 42 over the key's UTF-8 bytes, exactly Spark's
    * `hash()` expression. [[upsert]]'s split path asserts the two
    * agree on every node it moves. */
  private[graft] def routePid(key: String, n: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      .hash(org.apache.spark.unsafe.types.UTF8String.fromString(key),
        org.apache.spark.sql.types.StringType, 42L).toInt
    val r = h % n
    if (r < 0) r + n else r
  }

  def upsert(idx: NswIndex, changes: DataFrame,
             efConstruction: Int = 200,
             rebuildFraction: Double = 0.5,
             maxGraphSize: Int = 250000): NswIndex = {
    require(idx.nParts > 0,
      "legacy NSW save has no routing info; rebuild required before upsert")
    val spark = idx.graphs.sparkSession
    import spark.implicits._
    val metricL = idx.metric
    val mL = idx.m
    val efL = efConstruction
    val rebuildF = rebuildFraction
    val routed = changes
      .select(col("op").cast("string").as("op"),
        col("__key").cast("string").as("__key"),
        col("vec").cast("array<float>").as("vec"))
      .withColumn("pid",
        pmod(hash(col("__key")), lit(idx.nParts)).cast("int"))
      .as[(String, String, Array[Float], Int)]
    val newGraphs = idx.graphs.groupByKey(_.pid)
      .cogroup(routed.groupByKey(_._4)) { (pid, gs, cs) =>
        val slice = cs.map(t => (t._1, t._2, t._3)).toArray
        if (slice.isEmpty) gs // untouched partition: row passes through
        else {
          val g = if (gs.hasNext) gs.next()
            else PartGraph(pid, Array.empty, Array.empty, Array.empty, Array.empty)
          Iterator.single(applyLocal(g, slice, mL, efL, metricL, rebuildF))
        }
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize before releasing the old generation; a FAILED batch
    // releases the new one instead (the old index stays valid, and the
    // maintainer's retry must not accumulate stranded generations)
    try newGraphs.count()
    catch { case t: Throwable =>
      newGraphs.unpersist(blocking = false); throw t
    }
    idx.graphs.unpersist(blocking = false)

    // Growth bound: sustained adds would otherwise grow partition
    // graphs past the memory/build budget the build sized for. When a
    // partition's LIVE count exceeds maxGraphSize, DOUBLE nParts:
    // pmod(h, 2n) = pmod(h, n) + n·bit, so every graph splits LOCALLY
    // into pids {i, i+n} from its own live nodes — no data crosses
    // partitions, no shuffle, and future routing stays pure
    // pmod(hash(key), nParts). Doublings amortize: log2(growth) splits
    // over the life of the stream, each a parallel local rebuild.
    var out = NswIndex(newGraphs, idx.metric, idx.m, idx.nParts)
    var liveMax = out.graphs
      .map(g => g.keys.length - g.removed.length).collect()
      .foldLeft(0)(math.max)
    while (liveMax > maxGraphSize) {
      val n = out.nParts
      val twoN = n * 2
      val prev = out.graphs
      val split = prev.flatMap { g =>
        val dead = g.removed.toSet
        val live = g.keys.indices.filterNot(dead)
        live.groupBy(i => routePid(g.keys(i), twoN)).iterator.map {
          case (pid2, is) =>
            require(pid2 == g.pid || pid2 == g.pid + n,
              s"split routing diverged: node of p${g.pid} hashed to p$pid2")
            buildLocal(is.map(g.keys).toArray, is.map(g.vecs).toArray,
              mL, efL, metricL).copy(pid = pid2)
        }
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try split.count()
      catch { case t: Throwable =>
        // release BOTH this-call generations: `split` (the failed
        // materialization) and `prev` (newGraphs or a prior split —
        // always created by this call here, idx.graphs is already
        // gone), which would otherwise strand persisted with no holder
        // since the exception prevents `out` from being returned
        split.unpersist(blocking = false)
        prev.unpersist(blocking = false)
        throw t
      }
      prev.unpersist(blocking = false)
      out = NswIndex(split, out.metric, out.m, twoN)
      liveMax = out.graphs
        .map(g => g.keys.length - g.removed.length).collect()
        .foldLeft(0)(math.max)
    }
    out
  }
}
