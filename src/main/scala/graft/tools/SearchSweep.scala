package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Search-path scale rehearsal (round-5 verdict #7: the 100k-doc sweep
 * covered pipeline operators only): synthesizes a 10× corpus from
 * sf0.1 — documents / embeddings / events replicated with shifted keys
 * (identical content per replica: posting lists and near-dup families
 * grow 10×, the stress we want), TPC-H tables carried over — and runs
 * every q_ and a_ gate once-warmed with timed reps, printing per-query
 * medians next to the same session's sf0.1 numbers so super-linear
 * growth is visible directly. Correctness is NOT compared here (the
 * shifted keys change the mod-class fixtures); this tool measures
 * runtime shape only — the DuckDB gates stay the correctness story.
 */
object SearchSweep {
  private[tools] val TenX = "/tmp/graft-sf1syn"

  /** Build (once) the shared 10× corpus — also used by [[PipelineSweep]]. */
  private[tools] def ensureTenX(spark: SparkSession): Unit = synth(spark)

  private def synth(spark: SparkSession): Unit = {
    if (graft.util.FsIO.exists(spark, s"$TenX/_DONE")) return
    val src = "/root/testdata/sf0.1"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(TenX))
    def rep(table: String, keyCol: String): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val out = (0 until 10).map(i =>
        base.withColumn(keyCol, col(keyCol) + lit(i * 10000000L)))
        .reduce(_.unionByName(_))
      out.write.mode("overwrite").parquet(s"$TenX/$table.parquet")
    }
    rep("documents", "doc_id")
    rep("embeddings", "vec_id")
    rep("events", "event_id")
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
        .parquet(s"$TenX/$t.parquet")
    }
    graft.util.FsIO.writeTextAtomic(spark, s"$TenX/_DONE", "ok")
  }

  def main(args: Array[String]): Unit = {
    val reps = sys.env.getOrElse("SWEEP_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    synth(spark)

    val families = graft.Queries.all.toSeq
      .filter { case (n, _) => n.startsWith("q_") || n.startsWith("a_") }
      .sortBy(_._1)

    def time(fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      val df = fn()
      df.count()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"${"query"}%-28s ${"sf0.1"}%8s ${"10x"}%8s ratio")
    families.foreach { case (name, q) =>
      try {
        // warm both dirs once (index/posting builds), then median reps
        time(() => q(spark, "/root/testdata/sf0.1"))
        time(() => q(spark, TenX))
        def med(dir: String): Double = {
          val ts = (1 to reps).map(_ => time(() => q(spark, dir))).sorted
          ts(ts.length / 2)
        }
        val base = med("/root/testdata/sf0.1")
        val big = med(TenX)
        println(f"$name%-28s $base%8.3f $big%8.3f ${big / math.max(base, 1e-9)}%5.1f")
      } catch {
        case e: Throwable =>
          println(f"$name%-28s ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
