package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Ann

/**
 * Round-8 stretch (round-7 verdict #7): raw-codebook vs residual
 * IVFADC, measured. IVFADC literature (Jégou/Douze/Schmid TPAMI'11
 * §III-E) encodes the RESIDUAL r = v − centroid(cell(v)) — residuals
 * concentrate around 0 with lower per-subspace variance than raw
 * vectors, so the same m bytes quantize finer. The repo's standing
 * choice is raw codebooks so ONE persisted `__pq` column serves
 * topKPq / knnJoinPq / knnJoinIvfPq; residual encoding would need a
 * per-cell `__pqr` column (unusable by the flat plans) and per
 * (query, cell) LUTs. This experiment quantifies what that buys:
 * ADC-stage candidate recall@k (the quantity re-rank can recover —
 * after exact re-rank, final recall IS candidate recall) on the same
 * sf0.1 embeddings, same centroids, same m, across probe budgets.
 */
object ResidualPqExperiment {

  private def l2(a: Array[Float], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  private def l2ff(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i); acc += d * d; i += 1 }
    acc
  }

  /** Nearest-centroid encode against a PqModel (JVM mirror of PqEncode). */
  private def encode(model: Ann.PqModel, v: Array[Float]): Array[Byte] = {
    val dsub = model.dsub
    Array.tabulate(model.m) { j =>
      val book = model.books(j)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        var acc = 0.0; var i = 0
        while (i < dsub) {
          val d = v(j * dsub + i).toDouble - book(c)(i); acc += d * d; i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      best.toByte
    }
  }

  private def adc(lut: Array[Float], offsets: Array[Int], addConst: Double,
      code: Array[Byte]): Double = {
    var acc = addConst; var j = 0
    while (j < offsets.length && j < code.length) {
      acc += lut(offsets(j) + (code(j) & 0xFF)); j += 1
    }
    acc
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val m = 8
    val nCells = 64
    val k = 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val df = spark.read.parquet(s"$dir/embeddings.parquet")
    val vecs = df.select(col("vec_id").cast("string"),
        col("embedding").cast("array<float>"))
      .as[(String, Array[Float])].collect()
    println(s"corpus: ${vecs.length} vectors, dim ${vecs(0)._2.length}")

    val centroids = Ann.kmeansCentroids(df, "embedding", nCells)
    val cellOf = vecs.map { case (_, v) =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val d = l2(v, centroids(c)); if (d < bestD) { bestD = d; best = c }; c += 1
      }
      best
    }

    // raw model: the production path (Ann.trainPq on the float column)
    val rawModel = Ann.trainPq(df, "embedding", m = m)
    // residual model: same trainer, fed v − centroid(cell(v))
    val residRows = vecs.zip(cellOf).map { case ((id, v), c) =>
      (id, v.indices.map(i => v(i) - centroids(c)(i).toFloat).toArray)
    }
    val residDf = spark.createDataset(residRows.toSeq).toDF("vec_id", "resid")
    val residModel = Ann.trainPq(residDf, "resid", m = m)

    val rawCodes = vecs.map { case (_, v) => encode(rawModel, v) }
    val residCodes = vecs.zip(cellOf).map { case ((_, v), c) =>
      encode(residModel,
        v.indices.map(i => v(i) - centroids(c)(i).toFloat).toArray)
    }

    // queries: every 20th corpus vector (deterministic, spread)
    val qIdx = vecs.indices.by(20).toArray
    val exact = qIdx.map { qi =>
      val q = vecs(qi)._2
      vecs.indices.sortBy(bi => (l2ff(q, vecs(bi)._2), vecs(bi)._1))
        .take(k).map(vecs(_)._1).toSet
    }

    println(f"${"variant"}%-10s ${"nProbe"}%6s ${"rerank"}%6s recall@$k")
    for (nProbe <- Seq(4, 8, 16, nCells); rerank <- Seq(4, 8)) {
      val kCand = k * rerank
      def recall(codes: Array[Array[Byte]], residual: Boolean): Double = {
        val hits = qIdx.zip(exact).map { case (qi, truth) =>
          val q = vecs(qi)._2
          val probed = centroids.indices
            .sortBy(c => (l2(q, centroids(c)), c)).take(nProbe).toSet
          // per probed cell: LUT on q (raw) or q − centroid_c (residual)
          val cands = scala.collection.mutable.ArrayBuffer.empty[(Double, Int)]
          probed.foreach { c =>
            val qq = if (!residual) q
              else q.indices.map(i => q(i) - centroids(c)(i).toFloat).toArray
            val (lut, off, add) = Ann.pqLut(
              if (residual) residModel else rawModel, qq, "L2")
            vecs.indices.foreach { bi =>
              if (cellOf(bi) == c) cands += ((adc(lut, off, add, codes(bi)), bi))
            }
          }
          val kept = cands.sortBy { case (d, bi) => (d, vecs(bi)._1) }
            .take(kCand).map(_._2).map(vecs(_)._1).toSet
          truth.count(kept).toDouble / k
        }
        hits.sum / hits.length
      }
      println(f"${"raw"}%-10s $nProbe%6d $rerank%6d ${recall(rawCodes, residual = false)}%.4f")
      println(f"${"residual"}%-10s $nProbe%6d $rerank%6d ${recall(residCodes, residual = true)}%.4f")
    }
    spark.stop()
  }
}
