package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Fixtures, PipelineQueries, Queries}
import graft.pipeline.{Ann, Dedup, TextMetrics}

/**
 * Measures the deterministic property values behind the property-
 * oracle gates (p_ann_ivf recall, p_embed_neardup_lsh precision/
 * recall, p_dedup_simhash planted coverage, p_fingerprint digest
 * consistency + planted-near-dup Jaccard) at every SF, so the bounds
 * pinned in PipelineQueries are measurements, not guesses.
 */
object PropertyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val e = Fixtures.table(spark, dir, "embeddings")
      val d = Fixtures.table(spark, dir, "documents")
      println(s"== $sf  embeddings=${e.count()} documents=${d.count()}")

      // p_ann_ivf: 4/16-probe recall vs exact cosine top-20
      val ivfGot = PipelineQueries.ivfIdx(spark, dir)
        .search(Queries.queryVec, k = 20, nProbe = 4, metric = "COSINE")
        .select("__key").collect().map(_.getString(0))
      val top20 = PipelineQueries.exactCosTop20(spark, dir)
      println(f"ivf4of16: n=${ivfGot.length} recall=${ivfGot.count(top20.contains).toDouble / top20.size}%.3f")

      // p_embed_neardup_lsh: precision + recall vs exact pairs (0.3)
      val lsh = Dedup.embeddingNearDupsLsh(e, "vec_id", "embedding",
          minCosine = 0.3, numPlanes = 16, bands = 4)
        .select("key_a", "key_b").collect()
        .map(r => (r.getString(0), r.getString(1)))
      val exactPairs = PipelineQueries.exactCosPairs(spark, dir)
      println(f"lsh: n=${lsh.length} exact=${exactPairs.size} " +
        f"precisionExact=${lsh.forall(exactPairs.contains)} " +
        f"recall=${lsh.count(exactPairs.contains).toDouble / math.max(1, exactPairs.size)}%.3f")

      // p_dedup_simhash: exact copies all found; edited iff hamming<=3
      val dd = d.select(col("doc_id"), col("text"))
      val base = dd.filter(col("doc_id") % 7 === 0)
      val off = PipelineQueries.PlantOffset
      val exactCopies = base
        .select((col("doc_id") + lit(off)).as("doc_id"), col("text"))
      val editedCopies = base
        .select((col("doc_id") + lit(2 * off)).as("doc_id"),
          concat(col("text"), lit(" plantedtail")).as("text"))
      val pairs = Dedup.simhashNearDups(
        dd.unionByName(exactCopies).unionByName(editedCopies),
        "doc_id", "text", maxHamming = 3)
        .select(col("key_a").cast("long").as("a"), col("key_b").cast("long").as("b"))
        .persist()
      val foundExact = pairs
        .filter(col("b") - col("a") === off && col("a") % 7 === 0).count()
      val foundEdited = pairs
        .filter(col("b") - col("a") === 2 * off && col("a") % 7 === 0).count()
      val total = pairs.count()
      pairs.unpersist()
      val directNear = Dedup.withSimhash64(
        Dedup.withSimhash64(
          base.withColumn("text2", concat(col("text"), lit(" plantedtail"))),
          "text", "sa"),
        "text2", "sb")
        .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3).count()
      val nPlanted = base.count()
      println(s"simhash: planted=$nPlanted foundExact=$foundExact " +
        s"foundEdited=$foundEdited directNear=$directNear totalPairs=$total")

      // p_fingerprint: digest consistency + planted near-dup Jaccard
      val consistent = d
        .select(md5(col("text")).as("h"),
          TextMetrics.fingerprintDigest("text").as("fp"))
        .groupBy("h").agg(countDistinct("fp").as("n"))
        .agg(max("n")).collect()(0).getLong(0) == 1L
      val minJac = d.filter(col("doc_id") % 7 === 0)
        .withColumn("text2", concat(col("text"), lit(" plantedtail")))
        .select((size(array_intersect(TextMetrics.fingerprint("text"),
            TextMetrics.fingerprint("text2"))).cast("double") /
          size(array_union(TextMetrics.fingerprint("text"),
            TextMetrics.fingerprint("text2")))).as("j"))
        .agg(min("j")).collect()(0).getDouble(0)
      println(f"fingerprint: digestConsistent=$consistent minPlantedJaccard=$minJac%.3f")
    }
    spark.stop()
  }
}
