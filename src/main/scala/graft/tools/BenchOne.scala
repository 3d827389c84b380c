package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a single named query from SparkEntry.queries. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same session recipe as graft.Bench so isolated pairs measure the
    // engine under the bench's exact confs
    val spark = graft.util.GraftSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_REPS>1 → one warmup + reps timed runs, median reported
    // (the driver's BENCH protocol) so isolated re-measures are
    // apples-to-apples with BENCH_r{N}.json medians.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (reps > 1) fn(spark, sfDir).count() // warmup, untimed
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val n = fn(spark, sfDir).count()
      val med = times(times.length / 2)
      println(f"BENCH_ONE $name rows=$n sec=$med%.2f reps=$reps " +
        times.map(t => f"$t%.2f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
