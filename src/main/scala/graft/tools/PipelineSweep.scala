package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Pipeline-gate scale rehearsal (round-6 verdict #6: SearchSweep
 * covered the 57 q_/a_ gates; this closes the p_ family): same 10×
 * synthetic corpus as [[SearchSweep]] (documents / embeddings / events
 * replicated with shifted keys — near-dup families and cell
 * populations grow 10×, exactly the stress dedup/ANN-join/curation
 * must absorb), every p_ gate run once-warmed with timed reps,
 * per-query medians printed next to the same session's sf0.1 numbers.
 *
 * Fixture note: the per-dir oracle fixtures (exact-pair yardsticks,
 * memoized planted baselines) are computed during the WARMUP pass and
 * memoized, so — like the driver's BENCH protocol — the medians time
 * the operators, not the harnesses. Correctness is not compared at 10×
 * (shifted keys change the mod-class fixtures); the DuckDB gates at
 * sf0.01 remain the correctness story.
 */
object PipelineSweep {

  def main(args: Array[String]): Unit = {
    val reps = sys.env.getOrElse("SWEEP_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SearchSweep.ensureTenX(spark)

    // Args select specific gates (resume after a crash); default = all p_.
    val gates = graft.Queries.all.toSeq
      .filter { case (n, _) =>
        if (args.nonEmpty) args.contains(n) else n.startsWith("p_") }
      .sortBy(_._1)

    def time(fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().count()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"${"query"}%-28s ${"sf0.1"}%8s ${"10x"}%8s ratio")
    gates.foreach { case (name, q) =>
      try {
        time(() => q(spark, "/root/testdata/sf0.1"))
        time(() => q(spark, SearchSweep.TenX))
        def med(dir: String): Double = {
          val ts = (1 to reps).map(_ => time(() => q(spark, dir))).sorted
          ts(ts.length / 2)
        }
        val base = med("/root/testdata/sf0.1")
        val big = med(SearchSweep.TenX)
        println(f"$name%-28s $base%8.3f $big%8.3f ${big / math.max(base, 1e-9)}%5.1f")
      } catch {
        case e: Throwable =>
          println(f"$name%-28s ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
