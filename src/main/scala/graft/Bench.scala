package graft
import org.apache.spark.sql.SparkSession

/**
 * Driver benchmark entrypoint: one JSON line with the per-query MEDIAN
 * of `reps` timed runs (after one untimed warm-up run per query), so
 * round-over-round deltas measure the engine, not JVM/codegen/
 * file-listing first-touch noise.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: touch every table once so file listing / footer reads are
    // out of the timings, then build every index the query set uses
    // (Fixtures.engine registers all of them; one cheap search per index
    // family populates resident caches and codegen).
    Seq("lineitem", "orders", "customer", "part", "documents",
      "embeddings", "events").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }

    def timeOnce(fn: Queries.Q): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      timeOnce(fn) // untimed warm-up: caches, codegen, broadcast reuse
      val times = Seq.fill(reps)(timeOnce(fn)).sorted
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

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
    } catch { case _: Throwable => "{}" }

    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"stat":"median","queries":$qs,"nsw_recall_at_10":$recallJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
