package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Ann, Nsw}

/**
 * Scale rehearsal for the k-NN join family (the gate tables top out at
 * 2k vectors, so this generates its own corpus): ~100k dim-32 vectors
 * in 256 soft clusters (deterministic hash noise — the shape real
 * embedding spaces have, and the regime IVF cell pruning is FOR;
 * uniform-random is the known worst case). Sweeps the query-batch
 * size across the three plans — exact broadcast, IVF-celled partial
 * probe, NSW batch — reporting wall seconds, queries/sec and recall
 * vs exact. Results recorded in STATUS.md ("k-NN join plan
 * selection").
 */
object KnnJoinSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val dim = 32

    // deterministic clustered corpus: center = id % 256, vector =
    // center offsets + small hash noise, all from Catalyst hash()
    def unit(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (pmod(c.cast("long"), lit(100000L)).cast("double") / 1e5)
    val vec = array(Seq.tabulate(dim) { j =>
      (unit(hash(pmod(col("id"), lit(256)), lit(j))) +
        unit(hash(col("id"), lit(j), lit("n"))) * 0.15).cast("float")
    }: _*)
    val corpus = spark.range(n.toLong)
      .select(col("id").as("vec_id"), vec.as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"corpus rows: ${corpus.count()} dim $dim")

    val base = corpus.filter(col("vec_id") % 13 =!= 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"base rows: ${base.count()}")
    var t0 = System.nanoTime()
    val nsw = Nsw.build(base, "vec_id", "embedding", metric = "L2",
      numPartitions = 8)
    nsw.graphs.count()
    println(f"nsw build: ${(System.nanoTime() - t0) / 1e9}%.1fs")

    def pairs(df: DataFrame): Set[(String, String)] =
      df.select("__key", "neighbor").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    def t(f: => DataFrame): (Double, DataFrame) = {
      val s = System.nanoTime()
      val df = f
      df.count()
      ((System.nanoTime() - s) / 1e9, df)
    }

    // nested query batches: every 13th id, thinned by m
    Seq(64L, 8L, 1L).foreach { m =>
      val queries = corpus
        .filter(col("vec_id") % 13 === 0 && (col("vec_id") / 13) % m === 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nq = queries.count()
      val (tEx, ex) = t(Ann.knnJoinExact(queries, "vec_id", "embedding",
        base, "vec_id", "embedding", k = 10, metric = "L2"))
      val exact = pairs(ex)
      val (tIvf, ivf) = t(Ann.knnJoinIvf(queries, "vec_id", "embedding",
        base, "vec_id", "embedding", k = 10, nCells = 256, nProbe = 16,
        metric = "L2"))
      val rIvf = pairs(ivf).intersect(exact).size.toDouble / exact.size
      val nswLine = Seq(100, 400).map { ef =>
        val (tNsw, nswDf) = t(Ann.knnJoinNsw(nsw, queries, "vec_id", "embedding",
          k = 10, ef = ef))
        val rNsw = pairs(nswDf).intersect(exact).size.toDouble / exact.size
        f"nsw$ef=$tNsw%7.2fs (${nq / tNsw}%8.1f q/s, r=$rNsw%.3f)"
      }.mkString(" ")
      println(f"SWEEP nq=$nq%6d exact=$tEx%7.2fs (${nq / tEx}%8.1f q/s) " +
        f"ivf16/256=$tIvf%7.2fs (${nq / tIvf}%8.1f q/s, r=$rIvf%.3f) " + nswLine)
      queries.unpersist()
    }
    spark.stop()
  }
}
