package graft

/**
 * Driver benchmark entrypoint: one JSON line with the per-query MEDIAN
 * of `reps` timed runs (after one untimed warm-up run per query), so
 * round-over-round deltas measure the engine, not JVM/codegen/
 * file-listing first-touch noise.
 *
 * Harness-hygiene rules (each one was a measured artifact in round 2):
 *  - session confs (ANSI-safe parquet nanos) are set in the builder,
 *    BEFORE the table warm-up touches `events.parquet` — otherwise the
 *    very first job of every bench run aborts and poisons the log;
 *  - a failed rep is NEVER averaged into the median: its elapsed time
 *    is discarded and the failure is surfaced per-query in `errors`;
 *  - every rep's result handle is unpersisted after counting, so
 *    `localCheckpoint` blocks from dedup-family queries cannot
 *    accumulate across the session and slow later queries;
 *  - per-rep wall times are published (`reps_detail`) so a suspicious
 *    median can be adjudicated from the artifact alone — together with
 *    per-rep GC time (`gc_ms_detail`) and post-rep storage-memory
 *    footprint (`storage_mb_detail`): a slow rep with a matching GC
 *    spike is a session stall, not a plan regression.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // median of 5: up to two session stalls (GC, broadcast cleanup)
    // cannot own a query's reported number
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    // SPARK_GRAFT_MASTER=local-cluster[4,8,4096] benches the same
    // query set multi-JVM (see graft.util.GraftSession)
    val spark = graft.util.GraftSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: touch every table once so file listing / footer reads are
    // out of the timings, then build every index the query set uses
    // (Fixtures.engine registers all of them; one cheap search per index
    // family populates resident caches and codegen).
    Seq("lineitem", "orders", "customer", "part", "documents",
      "embeddings", "events").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up read of $t FAILED: ${e.getMessage}")
      }
    }

    /** Sum of JVM GC wall time (all collectors), monotonic. */
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    /** Bytes of persisted blocks currently in storage memory — the
      * accumulated-fixture-cache signal for stall adjudication. */
    def storageBytes(): Long =
      spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum

    /** One timed run. Returns (elapsed sec, GC ms spent DURING the rep,
      * storage bytes after, error). A failed rep's time is reported but
      * never enters the median. The result handle is unpersisted so
      * localCheckpoint blocks are released before the next rep. */
    def timeOnce(fn: Queries.Q): (Double, Long, Long, Option[String]) = {
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      val err =
        try { val df = fn(spark, sfDir); df.count(); df.unpersist(blocking = false); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
      ((System.nanoTime() - t0) / 1e9, gcMillis() - gc0, storageBytes(), err)
    }

    case class QResult(median: Double, repTimes: Seq[Double],
                       gcMs: Seq[Long], storageMb: Seq[Long], err: Option[String])

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      timeOnce(fn) // untimed warm-up: caches, codegen, broadcast reuse
      val runs = Seq.fill(reps)(timeOnce(fn))
      val ok = runs.collect { case (t, _, _, None) => t }.sorted
      val firstErr = runs.collectFirst { case (_, _, _, Some(e)) => e }
      val median = if (ok.nonEmpty) ok(ok.length / 2) else -1.0
      name -> QResult(median, runs.map(_._1), runs.map(_._2),
        runs.map(_._3 >> 20), firstErr)
    }

    def fmt(d: Double): String = f"$d%.4f"
    val qs = results.map { case (k, r) => "\"" + k + "\":" + fmt(r.median) }
      .mkString("{", ",", "}")
    val repsDetail = results.map { case (k, r) =>
      "\"" + k + "\":" + r.repTimes.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // stall adjudication from the artifact alone: a slow rep with a
    // matching gc_ms spike is a session stall, not a plan change; a
    // storage_mb ramp across queries is fixture-cache accumulation
    val gcDetail = results.map { case (k, r) =>
      "\"" + k + "\":" + r.gcMs.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val storageDetail = results.map { case (k, r) =>
      "\"" + k + "\":" + r.storageMb.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, QResult(_, _, _, _, Some(e))) =>
      "\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2.median).filter(_ >= 0).sum

    // NSW recall report (SURVEY X6/X9): partition-local graph ANN vs
    // exact top-10, averaged over 20 query vectors drawn from the
    // corpus, across the EF_RUNTIME range. The engine's documented
    // operating point is ef=200 (recall ≥ 0.95 there).
    val recallJson = try {
      val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val ann = graft.pipeline.Nsw.build(embs, "vec_id", "embedding",
        metric = "L2", numPartitions = 8)
      val queries = embs.orderBy("vec_id").limit(20)
        .select("embedding").collect()
        .map(_.getSeq[Float](0).toArray)
      val recalls = Seq(10, 50, 200).map { ef =>
        val r = queries.map { qv =>
          val exact = graft.pipeline.Ann.topK(embs, "vec_id", "embedding",
            qv, k = 10, metric = "L2").collect().map(_.getString(0)).toSet
          val got = ann.search(qv, k = 10, ef = ef)
            .collect().map(_.getString(0)).toSet
          got.intersect(exact).size / 10.0
        }.sum / queries.length
        s""""ef$ef":$r"""
      }
      ann.unpersistIndex()
      recalls.mkString("{", ",", "}")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] recall report FAILED: ${e.getMessage}")
      "{}"
    }

    // Beam-cost report: distance evals per query on ONE local graph of
    // the whole corpus (node-0 entry — kept after measuring pivot /
    // multi-layer entry selection as a net loss; NswEntryExperiment).
    // ~ef·M and flat in n is the healthy shape; partition-proportional
    // cost would mean the graph degenerated to a scan.
    val evalsJson = try {
      // bounded driver collect: a deterministic ≤50k sample (the graph
      // shape/beam cost report needs a single local graph, not the
      // table — a full collect would OOM the driver at larger sf)
      val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .selectExpr("cast(vec_id as string)", "cast(embedding as array<float>)")
        .orderBy("vec_id").limit(50000)
        .collect()
      val keys = rows.map(_.getString(0))
      val vecs = rows.map(_.getSeq[Float](1).toArray)
      val g = graft.pipeline.Nsw.buildLocal(keys, vecs, m = 16,
        efConstruction = 200, metric = "L2")
      val queries = vecs.take(20)
      Seq(10, 50, 200).map { ef =>
        var evals = 0L
        queries.foreach { qv =>
          val st = new graft.pipeline.Nsw.SearchStats
          graft.pipeline.Nsw.searchLocal(g.vecs, g.adj.map(_.toIndexedSeq),
            qv, ef, -1, "L2", stats = st)
          evals += st.distEvals
        }
        s""""ef$ef":${evals / queries.length}"""
      }.mkString("{", ",", s""","n":${keys.length}}""")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] beam-cost report FAILED: ${e.getMessage}")
      "{}"
    }

    val detailLine = s"""{"metric":"total_detail","value":${fmt(total)},"unit":"sec","reps":$reps,"stat":"median","queries":$qs,"reps_detail":$repsDetail,"gc_ms_detail":$gcDetail,"storage_mb_detail":$storageDetail,"errors":$errs,"nsw_recall_at_10":$recallJson,"nsw_beam_evals_per_query":$evalsJson,"sf":"$sfDir"}"""
    println(detailLine)
    def fmt3(d: Double): String = f"$d%.3f"
    val qsMs = results.map { case (k, r) =>
      "\"" + k + "\":" + math.round(r.median * 1000) }
      .mkString("{", ",", "}")
    // Second-to-last: per-query integer-millisecond medians. At 120
    // gates this line is ~2.6 KB — it CANNOT fit inside the driver's
    // ~2 KB output-tail window (120 query names alone sum to 1.8 KB),
    // which is why BENCH_r01…r16 all record `parsed: null`: the tail
    // always starts mid-line. It stays for human/judge reconstruction
    // (the tail still shows its last ~60 entries) and the full copy
    // goes to the file artifact below.
    println(s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","reps":$reps,"stat":"median","ms":$qsMs,"errors":$errs,"sf":"$sfDir"}""")
    // Full per-query report as a FILE artifact (driver tail-proof):
    // the detail line verbatim, newline, the ms map line. Written next
    // to the build (untracked) so every bench invocation leaves the
    // complete evidence regardless of how much stdout the caller keeps.
    try {
      val out = java.nio.file.Paths.get("BENCH_LAST.json")
      java.nio.file.Files.write(out,
        (detailLine + "\n" +
          s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","reps":$reps,"stat":"median","ms":$qsMs,"errors":$errs,"sf":"$sfDir"}""" + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_LAST.json write failed: ${e.getMessage}")
    }
    // FINAL line (printed LAST on purpose), guaranteed < 200 bytes: the
    // driver keeps only the last ~2,000 chars of output and parses JSON
    // from that window — sbt's own trailing "[success] …" line costs
    // ~80 of them, so the one line the driver must always be able to
    // parse whole is this compact summary (total seconds, gate count,
    // error count, sf, cpus). Per-query data: `ms` line above + the
    // BENCH_LAST.json artifact.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nErrs = results.count(_._2.err.isDefined)
    println(s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","n_queries":${results.size},"n_errors":$nErrs,"reps":$reps,"stat":"median","cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
