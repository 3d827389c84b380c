package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Diagnose the sharp-banding (4 rows/band, τ=0.5) candidate volume on
 * the 100× corpus: band-bucket histogram, implied pair count, and the
 * heavy buckets — the numbers that decide how the LSH candidate join
 * must be planned at scale.
 */
object SharpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf10x")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = docs.select(col("doc_id").as("k"),
      Dedup.hashedShingles(col("text"), 2).as("sh"))
    val sigs = base.select(col("k"),
      Dedup.minhashSignature(col("sh"), 128, 42L).as("sig"))
    val banded = sigs.select(col("k"),
        explode(Dedup.bandKeys(col("sig"), 32, 4)).as("bk"))
      .select(col("k"), col("bk.band"), col("bk.bh"))
    val hist = banded.groupBy("band", "bh").count()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = hist.agg(
      count(lit(1)).as("buckets"),
      max("count").as("max_bucket"),
      sum(col("count") * (col("count") - 1) / 2).as("banded_pairs")).collect()(0)
    println(s"PROBE buckets=${stats.get(0)} maxBucket=${stats.get(1)} " +
      s"bandedPairRows=${stats.get(2)}")
    println("PROBE top buckets by size:")
    hist.orderBy(col("count").desc).limit(20).collect()
      .foreach(r => println(s"  band=${r.get(0)} bh=${r.get(1)} n=${r.get(2)}"))
    // signature-class structure: if hot buckets are identical-signature
    // cliques, banding over distinct signatures collapses them exactly
    val classes = sigs.groupBy(col("sig")).count()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cstats = classes.agg(count(lit(1)).as("classes"),
      max("count").as("max_class"),
      sum(col("count") * (col("count") - 1) / 2).as("intra_pairs")).collect()(0)
    println(s"PROBE sigClasses=${cstats.get(0)} maxClass=${cstats.get(1)} " +
      s"intraClassPairs=${cstats.get(2)}")
    val bandedC = classes.select(col("sig"),
        explode(Dedup.bandKeys(col("sig"), 32, 4)).as("bk"))
      .select(col("bk.band"), col("bk.bh"))
    val histC = bandedC.groupBy("band", "bh").count()
    val sC = histC.agg(max("count").as("max_bucket"),
      sum(col("count") * (col("count") - 1) / 2).as("pairs")).collect()(0)
    println(s"PROBE classBanded maxBucket=${sC.get(0)} classPairRows=${sC.get(1)}")
    classes.unpersist()
    // bucket-size distribution: how much of the pair mass is clique-driven
    hist.groupBy(
        when(col("count") <= 2, lit("2"))
          .when(col("count") <= 10, lit("<=10"))
          .when(col("count") <= 100, lit("<=100"))
          .when(col("count") <= 1000, lit("<=1k"))
          .otherwise(lit(">1k")).as("sz"))
      .agg(count(lit(1)).as("buckets"),
        sum(col("count") * (col("count") - 1) / 2).as("pairs"))
      .orderBy("sz").collect()
      .foreach(r => println(s"PROBE size=${r.get(0)} buckets=${r.get(1)} pairs=${r.get(2)}"))
    spark.stop()
  }
}
