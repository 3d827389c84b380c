package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.pipeline.{Ann, Nsw}

/**
 * Incremental NSW maintenance vs the rebuild oracle (the reference's
 * per-mutation vector path, src/index_schema.cc:964 ProcessMutation →
 * hnswlib add/markDelete): after any change stream, search must agree
 * with exact KNN over the corpus the changes describe, untouched
 * partition graphs must pass through unmodified, and sustained churn
 * must not degrade beam cost (automatic dead-node compaction).
 */
class NswUpsertSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("nsw-upsert-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = () // shared SparkContext: never stop()

  private def embs = Fixtures.table(spark, "/root/testdata/sf0.001", "embeddings")

  private def changesDf(rows: Seq[(String, String, Array[Float])]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("op", "__key", "vec")
  }

  test("upsert/delete/supersede ≡ rebuild: search agrees with exact KNN on the merged corpus") {
    val base = embs.filter(col("vec_id") % 3 =!= 0)
    val idx = Nsw.build(base, "vec_id", "embedding", metric = "L2",
      numPartitions = 4, m = 12, efConstruction = 100)

    // adds: the held-out third; updates: vec_id%10==1 docs get a SHIFTED
    // vector; deletes: vec_id%7==2
    val adds = embs.filter(col("vec_id") % 3 === 0)
      .select(lit("upsert").as("op"), col("vec_id").cast("string").as("__key"),
        col("embedding").cast("array<float>").as("vec"))
    val updates = embs.filter(col("vec_id") % 10 === 1 && col("vec_id") % 3 =!= 0)
      .select(lit("upsert").as("op"), col("vec_id").cast("string").as("__key"),
        expr("transform(embedding, x -> cast(x + 10.0 as float))").as("vec"))
    val deletes = embs.filter(col("vec_id") % 7 === 2 && col("vec_id") % 10 =!= 1)
      .select(lit("delete").as("op"), col("vec_id").cast("string").as("__key"),
        lit(null).cast("array<float>").as("vec"))

    val idx2 = Nsw.upsert(idx, adds.unionByName(updates).unionByName(deletes))
    try {
      // the corpus those changes describe
      val merged = embs.filter(col("vec_id") % 7 =!= 2 || col("vec_id") % 10 === 1)
        .withColumn("embedding", when(col("vec_id") % 10 === 1,
          expr("transform(embedding, x -> cast(x + 10.0 as float))"))
          .otherwise(col("embedding").cast("array<float>")))
      val exact = Ann.topK(merged, "vec_id", "embedding", Queries.queryVec,
        k = 10, metric = "L2").collect().map(r => (r.getString(0), r.getDouble(1)))
      // ef large enough to make each partition beam exact at this scale
      val got = idx2.search(Queries.queryVec, k = 10, ef = 2000)
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      assert(got.toSeq == exact.toSeq,
        s"incremental != rebuild:\n got ${got.toSeq}\n exp ${exact.toSeq}")
    } finally idx2.unpersistIndex()
  }

  test("deleted keys are never returned, even as near-perfect matches") {
    val idx = Nsw.build(embs, "vec_id", "embedding", metric = "L2",
      numPartitions = 4, m = 12, efConstruction = 100)
    // delete the exact top-5 for the query vector — the beam WILL walk
    // over them (mark-removed waypoints); they must not be admitted
    val top5 = Ann.topK(embs, "vec_id", "embedding", Queries.queryVec,
      k = 5, metric = "L2").collect().map(_.getString(0))
    val idx2 = Nsw.upsert(idx,
      changesDf(top5.toSeq.map(k => ("delete", k, null: Array[Float]))))
    try {
      val got = idx2.search(Queries.queryVec, k = 10, ef = 2000)
        .collect().map(_.getString(0))
      assert(got.intersect(top5).isEmpty, s"deleted keys surfaced: ${got.toSeq}")
      val exact = Ann.topK(
        embs.filter(!col("vec_id").cast("string").isin(top5.toIndexedSeq: _*)),
        "vec_id", "embedding", Queries.queryVec, k = 10, metric = "L2")
        .collect().map(_.getString(0))
      assert(got.toSeq == exact.toSeq)
    } finally idx2.unpersistIndex()
  }

  test("untouched partition graphs pass through bit-identical") {
    val idx = Nsw.build(embs, "vec_id", "embedding", metric = "L2",
      numPartitions = 4, m = 12, efConstruction = 100)
    val before = idx.graphs.collect().map(g => g.pid -> g).toMap
    // one single-key change → exactly ONE partition is touched
    val oneKey = embs.limit(1).select(col("vec_id").cast("string")).collect()(0).getString(0)
    val touchedPid = Math.floorMod(
      embs.sparkSession.sql(s"SELECT hash('$oneKey')").collect()(0).getInt(0),
      idx.nParts)
    val idx2 = Nsw.upsert(idx,
      changesDf(Seq(("delete", oneKey, null: Array[Float]))))
    try {
      val after = idx2.graphs.collect().map(g => g.pid -> g).toMap
      assert(after.keySet == before.keySet)
      before.foreach { case (pid, g) =>
        val g2 = after(pid)
        if (pid == touchedPid) {
          assert(g2.removed.nonEmpty, "touched partition must mark the delete")
        } else {
          assert(g2.keys.sameElements(g.keys) &&
            g2.removed.sameElements(g.removed) &&
            g2.adj.length == g.adj.length &&
            g2.adj.indices.forall(i => g2.adj(i).sameElements(g.adj(i))),
            s"untouched partition $pid was modified")
        }
      }
    } finally idx2.unpersistIndex()
  }

  test("routing parity: build placement == pmod(hash(key), nParts) forever") {
    // upsert routes with pmod(hash(__key), nParts); build routes with
    // repartition(parts, col(key)) — Spark's HashPartitioning on the
    // same murmur3 hash. If this ever diverges, deletes route to the
    // wrong graph and silently no-op. Pin the equivalence on real data.
    val idx = Nsw.build(embs, "vec_id", "embedding", metric = "L2",
      numPartitions = 4, m = 8, efConstruction = 50)
    try {
      val placed = idx.graphs.collect().flatMap(g => g.keys.map(_ -> g.pid)).toMap
      val sp = spark
      import sp.implicits._
      val expected = placed.keys.toSeq.toDF("__key")
        .withColumn("pid", pmod(hash(col("__key")), lit(idx.nParts)).cast("int"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(placed == expected,
        "repartition placement diverged from pmod(hash(key), nParts)")
    } finally idx.unpersistIndex()
  }

  test("recall after churn stays at build-level (ef 200) on testdata") {
    val base = embs.filter(col("vec_id") % 4 =!= 0)
    val idx = Nsw.build(base, "vec_id", "embedding", metric = "COSINE",
      numPartitions = 4, m = 12, efConstruction = 100)
    val adds = embs.filter(col("vec_id") % 4 === 0)
      .select(lit("upsert").as("op"), col("vec_id").cast("string").as("__key"),
        col("embedding").cast("array<float>").as("vec"))
    val idx2 = Nsw.upsert(idx, adds)
    try {
      val exact = Ann.topK(embs, "vec_id", "embedding", Queries.queryVec,
        k = 10, metric = "COSINE").collect().map(_.getString(0)).toSet
      val got = idx2.search(Queries.queryVec, k = 10, ef = 200)
        .collect().map(_.getString(0)).toSet
      val recall = got.intersect(exact).size / 10.0
      assert(recall >= 0.9, s"recall after churn $recall < 0.9")
    } finally idx2.unpersistIndex()
  }

  test("growth: nParts doubles when a partition exceeds maxGraphSize (local pmod split)") {
    val sp = spark; import sp.implicits._
    def vec(i: Int): Array[Float] =
      Array.tabulate(8)(j => math.sin(i * 31.0 + j * 7.0).toFloat)
    val base = (1 to 40).map(i => (s"k$i", vec(i))).toDF("__key", "vec")
    val idx = Nsw.build(base, "__key", "vec", metric = "L2",
      numPartitions = 2, m = 6, efConstruction = 40)
    assert(idx.nParts == 2)

    // 120 adds → ~80 live per partition; cap 32 forces doubling until
    // every partition is back under budget (2 → 4 → 8)
    val adds = (41 to 160).map(i => ("upsert", s"k$i", vec(i)))
    val grown = Nsw.upsert(idx, changesDf(adds), efConstruction = 40,
      maxGraphSize = 32)
    try {
      assert(grown.nParts >= 4 && (grown.nParts & (grown.nParts - 1)) == 0,
        s"expected a power-of-two doubling, got ${grown.nParts}")
      val sizes = grown.graphs.collect().map(g => (g.pid, g.keys.length - g.removed.length))
      assert(sizes.forall(_._2 <= 32),
        s"partition over budget after split: ${sizes.mkString(",")}")
      assert(sizes.map(_._2).sum == 160, "nodes lost or duplicated in the split")
      // routing stays pure pmod(hash, nParts): every node sits where a
      // fresh route would send it — future deletes depend on this
      sizes.foreach { case (pid, _) => assert(pid >= 0 && pid < grown.nParts) }
      val misrouted = grown.graphs.collect().flatMap { g =>
        val dead = g.removed.toSet
        g.keys.indices.filterNot(dead)
          .filter(i => Nsw.routePid(g.keys(i), grown.nParts) != g.pid)
          .map(i => g.keys(i) -> g.pid)
      }
      assert(misrouted.isEmpty, s"misrouted after split: ${misrouted.take(5).toSeq}")
      // the split graphs still answer: exact match returns its own key,
      // and a routed delete through the NEW nParts takes effect
      val hit = grown.search(vec(150), k = 1, ef = 100).collect().head
      assert(hit.getAs[String]("__key") == "k150")
      val afterDel = Nsw.upsert(grown,
        changesDf(Seq(("delete", "k150", null))), efConstruction = 40,
        maxGraphSize = 32)
      try {
        val top = afterDel.search(vec(150), k = 1, ef = 100).collect().head
        assert(top.getAs[String]("__key") != "k150", "deleted key served after split")
      } finally afterDel.graphs.unpersist(blocking = false)
    } finally ()
  }

  test("sustained churn: dead-node compaction keeps graphs near live size") {
    // Local-level pin (fast): churn one graph through many
    // delete+reinsert rounds; the automatic rebuild (dead fraction >
    // 0.5) must keep the array length bounded by ~2× the live count,
    // so beam cost tracks live data, not churn history.
    val rnd = new scala.util.Random(7)
    val n = 400
    val vecs = Array.fill(n)(Array.fill(8)(rnd.nextGaussian().toFloat))
    var g = Nsw.buildLocal(vecs.indices.map(_.toString).toArray, vecs,
      m = 6, efConstruction = 40, metric = "L2")
    (1 to 10).foreach { round =>
      // re-upsert every key with a fresh vector (100% supersede)
      val changes = vecs.indices.map { i =>
        ("upsert", i.toString, Array.fill(8)(rnd.nextGaussian().toFloat))
      }.toArray
      g = Nsw.applyLocal(g, changes, m = 6, efConstruction = 40,
        metric = "L2", rebuildFraction = 0.5)
      assert(g.keys.length - g.removed.length == n, s"live count drifted round $round")
      assert(g.keys.length <= 2 * n + 1,
        s"round $round: graph grew to ${g.keys.length} nodes (${g.removed.length} dead) — compaction broken")
    }
    // and the churned graph still answers correctly
    val q = Array.fill(8)(rnd.nextGaussian().toFloat)
    val live = (0 until g.keys.length).filterNot(g.removed.toSet)
    val got = Nsw.searchLocal(g.vecs, g.adj.map(_.toIndexedSeq), q, ef = 500,
      limitIdx = -1, "L2",
      admit = Some(i => !g.removed.contains(i))).take(5).map(_._2)
    val exact = live.map(i =>
      (g.vecs(i).zip(q).map { case (a, b) => (a - b).toDouble * (a - b) }.sum, i))
      .sortBy(t => (t._1, t._2)).take(5).map(_._2)
    assert(got.toSeq == exact.toSeq)
  }

  test("unchanged-vector upsert is a no-op (ModifyRecord kMissing, vector_base.cc:236-241)") {
    val rnd = new scala.util.Random(11)
    val n = 50
    val vecs = Array.fill(n)(Array.fill(8)(rnd.nextGaussian().toFloat))
    val g0 = Nsw.buildLocal(vecs.indices.map(_.toString).toArray, vecs,
      m = 6, efConstruction = 40, metric = "L2")

    // re-upsert every key with its IDENTICAL vector: zero churn
    val same = vecs.indices.map(i => ("upsert", i.toString, vecs(i).clone())).toArray
    val g1 = Nsw.applyLocal(g0, same, m = 6, efConstruction = 40,
      metric = "L2", rebuildFraction = 0.5)
    assert(g1.keys.length == n && g1.removed.isEmpty,
      s"no-op upserts churned the graph: ${g1.keys.length} nodes, ${g1.removed.length} dead")

    // a genuinely-changed vector still re-indexes (supersede + insert)
    val changed = Array(("upsert", "0", Array.fill(8)(rnd.nextGaussian().toFloat)))
    val g2 = Nsw.applyLocal(g1, changed, m = 6, efConstruction = 40,
      metric = "L2", rebuildFraction = 0.5)
    assert(g2.keys.length == n + 1 && g2.removed.length == 1)
    // and the old vector for key "0" no longer answers
    val idxOfNew = g2.keys.length - 1
    assert(g2.keys(idxOfNew) == "0" && !g2.removed.contains(idxOfNew))
  }
}
