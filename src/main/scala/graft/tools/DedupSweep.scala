package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/**
 * Scale rehearsal for the round-6 dedup-resolution operators (the
 * gate pair graph has ~50 edges; these runs are 20k-80k× that):
 *
 * 1. `dupClusters` on synthetic pair graphs of 1M and 4M edges —
 *    cliques (dup families) + 20-node chains (worst diameter) +
 *    random noise edges — timing BOTH physical paths on the 1M graph
 *    (driver union-find vs forced distributed star rounds; the
 *    crossover evidence behind the 2M-edge threshold) and the
 *    distributed path alone at 4M, with output equality checked.
 * 2. `semanticDedup` end-to-end on 200k clustered 32-dim embeddings
 *    with 5% planted identical copies: detection must be exact
 *    (identical vectors share a cell by construction), so the
 *    survivor count is a correctness check, not a property bound.
 *
 * Results recorded in STATUS ("dedup resolution at scale").
 */
object DedupSweep {
  private def pairGraph(spark: SparkSession, nEdges: Long): DataFrame = {
    // deterministic mix: 60% 5-cliques, 20% chains of 20, 20% noise
    val cliq = (nEdges * 6 / 10) / 10 // 10 edges per 5-clique
    val chains = (nEdges * 2 / 10) / 19
    val noise = nEdges * 2 / 10
    val cliques = spark.range(cliq).select(col("id")).as("c")
      .select(col("id"), explode(expr(
        "flatten(transform(sequence(0,3), i -> transform(sequence(i+1,4), j -> struct(i as a, j as b))))")).as("e"))
      .select(concat(lit("q"), col("id"), lit("_"), col("e.a")).as("key_a"),
        concat(lit("q"), col("id"), lit("_"), col("e.b")).as("key_b"))
    val chainE = spark.range(chains).select(col("id"), explode(sequence(lit(0), lit(18))).as("i"))
      .select(concat(lit("c"), col("id"), lit("_"), col("i")).as("key_a"),
        concat(lit("c"), col("id"), lit("_"), col("i") + 1).as("key_b"))
    val noiseE = spark.range(noise)
      .select(concat(lit("r"), pmod(hash(col("id"), lit(1)), lit(2000000))).as("key_a"),
        concat(lit("r"), pmod(hash(col("id"), lit(2)), lit(2000000))).as("key_b"))
    cliques.unionByName(chainE).unionByName(noiseE)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"OP $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($rows rows)")
    }

    for (m <- Seq(1, 4)) {
      val g = pairGraph(spark, m * 1000000L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"pair graph ${m}M: ${g.count()} edges")
      var local: DataFrame = null
      if (m == 1) {
        t(s"dupClusters ${m}M local union-find") {
          local = Dedup.dupClusters(g).persist(); local.count()
        }
      }
      var dist: DataFrame = null
      t(s"dupClusters ${m}M distributed stars") {
        dist = Dedup.dupClusters(g, localEdgeThreshold = 0).persist(); dist.count()
      }
      if (local != null) {
        // both directions — union-distinct minus one side only counts
        // rows MISSING from that side, not extras it has
        val diff = dist.except(local).unionByName(local.except(dist)).count()
        println(s"  path equality: symdiff $diff (expect 0)")
        local.unpersist()
      }
      dist.unpersist(); g.unpersist()
    }

    // semanticDedup scale rows: 2000 natural clusters, 5% identical
    // copies; 200k with explicit 512 cells (the round-6 row) and 1M
    // with the auto-cells default (√n ≈ 1024 — the 100 TB-shaped
    // configuration a naive caller now gets for free)
    val off = 10000000L
    val vec = expr(
      """transform(sequence(0, 31), j -> cast(
        |  (pmod(hash(pmod(id, 2000), j), 1000) / 50.0) +
        |  (pmod(hash(pmod(id, 10000000), j, 7), 100) / 25.0) as float))"""
        .stripMargin)
    for ((n, cellsArg, label) <- Seq(
        (200000L, 512, "200k nCells=512"),
        (1000000L, 0, "1M auto-cells"))) {
      val base = spark.range(n).select(col("id"), vec.as("v"))
      val copies = spark.range(n).filter(col("id") % 20 === 0)
        .select((col("id") + off).as("id"), vec.as("v"))
      val corpus = base.unionByName(copies)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val total = corpus.count()
      val effCells = if (cellsArg > 0) cellsArg
        else graft.pipeline.Ann.autoCells(total)
      println(s"semdedup corpus: $total rows (planted ${total - n}, " +
        s"cells $effCells)")
      t(s"semanticNearDups $label") {
        Dedup.semanticNearDups(corpus, "id", "v",
          minCosine = 0.999, nCells = cellsArg).count()
      }
      t(s"semanticDedup $label end-to-end") {
        val survivors = Dedup.semanticDedup(corpus, "id", "v",
          minCosine = 0.999, nCells = cellsArg).count()
        println(s"  survivors: $survivors (expect ${n} if only planted pairs fire)")
        survivors
      }
      corpus.unpersist()
    }

    // Degenerate-hash guard sweep (round 9): half the corpus is ONE
    // identical boilerplate text — the modal class real crawls are full
    // of — and half dispersed random-vocab docs. The guarded
    // simhashNearDups routes the modal class through the hamming=0
    // star tier, so 10× rows must cost ~10× (the unguarded band
    // self-join was O(modal²): 2.5e9 pair-checks in one task at the
    // 100k row already).
    for (n <- Seq(100000L, 1000000L)) {
      val modal = spark.range(n / 2).select(col("id").as("doc_id"),
        lit("the same boilerplate page body repeated across the whole crawl")
          .as("text"))
      val dispersed = spark.range(n / 2).select((col("id") + off).as("doc_id"),
        expr("array_join(transform(sequence(0, 9), " +
          "j -> concat('w', pmod(hash(id, j), 1000000))), ' ')").as("text"))
      val corpus = modal.unionByName(dispersed)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"degenerate corpus: ${corpus.count()} rows (${n / 2} modal)")
      t(s"simhashNearDups degenerate ${n / 1000}k (50% modal)") {
        Dedup.simhashNearDups(corpus, "doc_id", "text").count()
      }
      corpus.unpersist()
    }

    // Video repeated-frame degeneracy (round 9): half the videos are
    // 50 copies of ONE black frame (title-card/black-frame mode — all
    // share one hash class), half distinct content. The (video, hash,
    // multiplicity) collapse must keep pair work at the HASH level:
    // the modal half's output is all-pairs BY SEMANTICS (they are
    // mutual near-dups), but no frame-level product (50 k frames at
    // n=1000 would be ~1.25e9 frame pairs unguarded).
    {
      import spark.implicits._
      def frame(seed: Int): java.awt.image.BufferedImage = {
        val rnd = new scala.util.Random(seed)
        val bits = Array.fill(48)(rnd.nextBoolean())
        val img = new java.awt.image.BufferedImage(32, 24,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < 24) {
          var x = 0
          while (x < 32) {
            val b = (y / 4) * 8 + (x / 4)
            img.setRGB(x, y, (if (bits(b)) 180 else 70) * 0x010101)
            x += 1
          }
          y += 1
        }
        img
      }
      for (n <- Seq(100, 1000)) {
        val media = spark.range(n).map { id =>
          val frames =
            if (id % 2 == 0) Seq.fill(50)(frame(0))
            else (0 until 50).map(f => frame((id * 50 + f).toInt))
          graft.pipeline.Multimodal.MediaRow(id, "video",
            graft.pipeline.Multimodal.VideoCodec.encodeMjpegAvi(frames, fps = 4),
            32, 24, 3, 0, 12500, "avi")
        }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"video degenerate corpus: ${media.count()} videos × 50 frames" +
          s" (${n / 2} modal)")
        t(s"videoNearDups degenerate $n videos (50% modal)") {
          graft.pipeline.Multimodal.videoNearDups(media,
            maxHamming = 3, minSharedFrac = 0.5).count()
        }
        media.unpersist()
      }
    }
    spark.stop()
  }
}
