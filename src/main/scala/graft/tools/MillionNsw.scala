package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * 1M+-vector NSW probe (round-10 verdict #6's scale point): unions the
 * 100× corpus embeddings 5× with shifted ids and per-copy perturbation
 * (same construction HundredSweep uses for replicas) to 1,000,000
 * vectors, then times graph build and beam search so the one plausibly
 * super-linear ANN term has a ≥1M-row measurement, not a 200k one.
 */
object MillionNsw {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.Nsw

    val base = spark.read.parquet("/tmp/graft-sf10x/embeddings.parquet")
    val copies = (0 until 5).map { i =>
      base.withColumn("vec_id", col("vec_id") + lit(i * 1000000000L))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else transform(col("embedding"), (x, j) => (x * (lit(1.0f) +
            (pmod(xxhash64(col("vec_id"), j, lit(i)), lit(1000L)).cast("float") -
              lit(500f)) / lit(100000f))).cast("float")))
    }.reduce(_.unionByName(_))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = copies.count()
    println(s"PROBE vectors=$n")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val idx = time("build_1m") {
      val i = Nsw.build(copies, "vec_id", "embedding",
        metric = "L2", numPartitions = 8, m = 16, efConstruction = 100)
      i.graphs.count(); i
    }
    println(s"PROBE partitions=${idx.nParts}")
    time("query_10x") {
      (0 until 10).foreach { j =>
        val q = graft.Queries.queryVec.clone()
        q(j % q.length) += 0.01f * (j + 1)
        idx.search(q, 10, ef = 100).count()
      }
    }
    spark.stop()
  }
}
