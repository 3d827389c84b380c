package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{SearchEngine, SearchOptions}
import graft.model._
import graft.sources.Documents

/**
 * Scale rehearsal for the three tuned constants (round-4 verdict #6):
 * each was plausible-but-unmeasured; this main sweeps them on corpora
 * ~10-40× the gate scale with CONTROLLED selectivity/churn and prints
 * one table per constant. Results land in STATUS.md; the constants'
 * defaults move only if the measured crossover says so.
 *
 *  1. `postingRouteMaxSelectivity` (0.25): marker terms planted at
 *     exact selectivities 0.5%..50% over a 100k-doc corpus; routed
 *     (posting semi-join) vs columnar scan latency per selectivity →
 *     the crossover IS the right cap.
 *  2. `compactRowThreshold` (100k): 30 churn batches over a ~2.5M-row
 *     posting store at thresholds 25k..∞; total maintenance + lookup
 *     time and final segment size per threshold.
 *  3. NSW `rebuildFraction` (0.5): delete-heavy churn over a 60k-vector
 *     index at fractions 0.25/0.5/0.75/never; upsert cost, post-churn
 *     search latency, beam evals, recall.
 */
object ConstantSweep {

  private def timeIt[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }
  private def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

  /** 100k synthetic docs with marker terms at exact selectivities:
    * `sel_<pct>` appears in pmod(doc)<pct% of docs; ~40 filler tokens
    * from a 5k-word vocabulary make the text column realistic. */
  private def corpus(spark: SparkSession, n: Long): DataFrame = {
    val sels = Seq(5, 10, 20, 50, 100, 150, 200, 250, 300, 400, 500) // ‰×10
    val markers = sels.map(s =>
      s"case when pmod(id, 1000) < $s then ' sel_$s' else '' end")
    spark.range(n).selectExpr(
      "cast(id as string) as __key",
      ("concat(array_join(transform(sequence(1, 40), k -> " +
        "concat('w', pmod(id * 2654435761 + k * 40503, 5000))), ' ')" +
        markers.mkString(", ", ", ", ")") + " as text"),
      "cast(pmod(id, 97) as double) as n_chars")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val which = if (args.isEmpty) Set("route", "compact", "nsw") else args.toSet

    if (which("route")) sweepRouteSelectivity(spark)
    if (which("compact")) sweepCompactThreshold(spark)
    if (which("nsw")) sweepRebuildFraction(spark)
    if (which("prox")) profileProximity(spark)
    spark.stop()
  }

  // ------------- 1. postingRouteMaxSelectivity crossover ------------- //

  private def sweepRouteSelectivity(spark: SparkSession): Unit = {
    val n = 100000L
    val schema = IndexSchema("sweep", Seq(
      FieldDef("n_chars", NumericField),
      FieldDef("text", TextField())))
    // the corpus lives as PARQUET (the 100-TB shape): the scan side
    // must read + tokenize it per query unless resident
    val docsPath = java.nio.file.Files.createTempDirectory("graft-sweep-docs").toString
    corpus(spark, n).write.mode("overwrite").parquet(docsPath)
    val docs = spark.read.parquet(docsPath)
    val dir = java.nio.file.Files.createTempDirectory("graft-sweep-route").toString

    val opts = SearchOptions(limit = (0, 10), noContent = true)
    Seq(true, false).foreach { resident =>
      val enriched = Documents.enrich(docs, schema)
      val routedEng = new SearchEngine
      routedEng.createIndex(schema, enriched, resident = resident)
      if (resident) routedEng.buildPostings("sweep", dir, numPartitions = 16)
      else routedEng.loadPostings("sweep", dir)
      routedEng.postingRouteMaxSelectivity = 1.0 // always route: measure both sides
      val scanEng = new SearchEngine
      scanEng.createIndex(schema, enriched, resident = resident)

      println(s"== postingRouteMaxSelectivity sweep (100k docs, resident=$resident) ==")
      println("selectivity | routed_s | scan_s | routed/scan")
      Seq(5, 10, 20, 50, 100, 150, 200, 250, 300, 400, 500).foreach { s =>
        val q = s"@text:sel_$s @n_chars:[10 +inf]"
        def run(e: SearchEngine): Double =
          med((1 to 3).map(_ => timeIt(e.search("sweep", q, opts).count())._2))
        run(routedEng); run(scanEng) // warm both plans
        val r = run(routedEng); val sc = run(scanEng)
        println(f"${s / 1000.0}%11.3f | $r%8.3f | $sc%6.3f | ${r / sc}%11.2f")
      }
    }
  }

  // ------------------ 2. compactRowThreshold sweep ------------------- //

  private def sweepCompactThreshold(spark: SparkSession): Unit = {
    val schema = IndexSchema("churn", Seq(FieldDef("text", TextField())))
    val base = Documents.enrich(corpus(spark, 100000), schema)
    val posting = graft.text.PostingIndex.build(base, schema, "text")
    println("== compactRowThreshold sweep (100k docs ≈ 2.5M posting rows, 30×2k-doc churn batches) ==")
    println("threshold | maint_s | lookup_s | compactions | final_seg_rows")
    Seq(25000L, 50000L, 100000L, 200000L, Long.MaxValue).foreach { thr =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-sweep-cmp").toString
      val store = graft.text.PostingStore.init(spark, posting, dir,
        numPartitions = 16)
      var maint = 0.0; var lookup = 0.0; var compactions = 0
      (0 until 30).foreach { b =>
        // 2000 superseded docs per batch: shifted filler vocab
        val batch = Documents.enrich(
          corpus(spark, 100000).filter(pmod(col("__key").cast("long"), lit(50)) === b % 50)
            .withColumn("text", concat(col("text"), lit(s" churn_$b"))),
          schema)
        val rows = graft.text.PostingIndex.build(batch, schema, "text")
        val keys = batch.select(col("__key"))
        val (_, tM) = timeIt {
          store.applyBatch(rows, keys)
          if (store.deltaSize + store.tombSize >= thr) {
            store.compact(16); compactions += 1
          }
        }
        maint += tM
        val (_, tL) = timeIt {
          store.view.filter(col("term") === "sel_50").count()
        }
        lookup += tL
      }
      val segRows = store.deltaSize + store.tombSize
      val thrS = if (thr == Long.MaxValue) "never" else (thr / 1000) + "k"
      println(f"$thrS%9s | $maint%7.1f | $lookup%8.1f | $compactions%11d | $segRows%14d")
    }
  }

  // ------- 4. proximity-verify share (verdict #8 parked item) ------- //

  /** How much of a SLOP query's latency is the columnar proximity
    * verify itself? Measured as (AND-of-terms + SLOP) minus the same
    * AND without SLOP — the delta IS the verify, since candidates and
    * scan are identical. Decides whether posting-side SLOP
    * verification (stem-keyed positional rows) is worth building. */
  private def profileProximity(spark: SparkSession): Unit = {
    val n = 100000L
    val schema = IndexSchema("prox", Seq(FieldDef("text", TextField())))
    val docsPath = java.nio.file.Files.createTempDirectory("graft-prox-docs").toString
    corpus(spark, n).write.mode("overwrite").parquet(docsPath)
    val docs = spark.read.parquet(docsPath)
    println("== proximity-verify share (100k docs, AND of two markers, joint sel 5%) ==")
    println("resident | and_s | slop_s | verify share")
    Seq(true, false).foreach { resident =>
      val e = new SearchEngine
      e.createIndex(schema, Documents.enrich(docs, schema), resident = resident)
      val opts = SearchOptions(limit = (0, 10), noContent = true)
      val optsSlop = opts.copy(slop = Some(2))
      val q = "@text:sel_50 @text:sel_100"
      def run(o: SearchOptions): Double =
        med((1 to 3).map(_ => timeIt(e.search("prox", q, o).count())._2))
      run(opts); run(optsSlop) // warm
      val andS = run(opts); val slopS = run(optsSlop)
      println(f"$resident%8s | $andS%5.3f | $slopS%6.3f | ${(slopS - andS) / slopS}%11.2f")
    }
  }

  // ------------------- 3. NSW rebuildFraction sweep ------------------ //

  private def sweepRebuildFraction(spark: SparkSession): Unit = {
    import spark.implicits._
    val n = 60000
    val dim = 32
    // deterministic synthetic vectors: clustered + hash jitter
    // fine-grained jitter (prime modulus ≫ corpus) so no two vectors
    // tie — distance ties would make the exact top-10 arbitrary and
    // the recall comparison meaningless
    def vecs(offset: Int, count: Int): DataFrame =
      spark.range(offset, offset + count).selectExpr(
        "cast(id as string) as __key",
        s"transform(sequence(1, $dim), k -> " +
          "cast(pmod(id * 2654435761 + k * 40503, 100003) / 50001.5 - 1.0 " +
          "+ pmod(id, 16) * 0.4 as float)) as vec")
    val baseDf = vecs(0, n)
    println(s"== NSW rebuildFraction sweep ($n vectors dim $dim, 8 delete-heavy churn rounds) ==")
    println("fraction | upsert_s | search_ms | recall@10")
    Seq(0.25, 0.5, 0.75, 2.0).foreach { frac =>
      val idx0 = graft.pipeline.Nsw.build(baseDf, "__key", "vec",
        metric = "L2", numPartitions = 8, m = 16, efConstruction = 100)
      var idx = idx0
      var upsertS = 0.0
      // 8 rounds: delete 20% of live keys, re-add half of them moved —
      // sustained dead-fraction pressure on every partition
      (0 until 8).foreach { r =>
        val dels = spark.range(n).filter(pmod(col("id"), lit(5)) === r % 5)
          .selectExpr("'delete' as op", "cast(id as string) as __key",
            "cast(null as array<float>) as vec")
        val adds = vecs(0, n).filter(pmod(col("__key").cast("long"), lit(10)) === r % 10)
          .selectExpr("'upsert' as op", "__key", "vec")
        val (next, t) = timeIt(graft.pipeline.Nsw.upsert(idx,
          dels.unionByName(adds), efConstruction = 100, rebuildFraction = frac))
        upsertS += t
        if (idx ne idx0) idx.unpersistIndex()
        idx = next
      }
      // post-churn search health over 20 queries
      val queries = (0 until 20).map { qi =>
        baseDf.filter(col("__key") === (qi * 997 % n).toString)
          .select("vec").collect()(0).getSeq[Float](0).toArray
      }
      val live = idx.graphs.flatMap { g =>
        val dead = g.removed.toSet
        g.keys.indices.collect {
          case i if !dead.contains(i) => (g.keys(i), g.vecs(i))
        }
      }.toDF("__key", "vec")
      var searchMs = 0.0; var recall = 0.0
      queries.foreach { qv =>
        val exact = graft.pipeline.Ann.topK(live, "__key", "vec", qv, 10, "L2")
          .collect().map(_.getString(0)).toSet
        val (got, t) = timeIt(idx.search(qv, 10, ef = 100)
          .collect().map(_.getString(0)).toSet)
        searchMs += t * 1000
        recall += got.intersect(exact).size / 10.0
      }
      val fracS = if (frac > 1.0) "never" else frac.toString
      println(f"$fracS%8s | $upsertS%8.1f | ${searchMs / queries.length}%9.1f | " +
        f"${recall / queries.length}%9.2f")
      idx.unpersistIndex()
    }
  }
}
