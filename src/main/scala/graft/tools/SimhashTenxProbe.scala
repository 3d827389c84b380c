package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adjudicates the PipelineSweep simhash ratios: counts the PAIR
  * OUTPUT at sf0.1 vs the synthetic 10× corpus. The 10× builder
  * replicates documents with identical text, so every identical-hash
  * class grows 10× and its exact clique grows ~100× — if the pair
  * count grows like the runtime, the ratio is output semantics
  * (all-pairs among identical replicas), not a plan regression. */
object SimhashTenxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SearchSweep.ensureTenX(spark)
    for ((label, dir) <- Seq(("sf0.1", "/root/testdata/sf0.1"),
                             ("10x", SearchSweep.TenX))) {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val t0 = System.nanoTime()
      val pairs = graft.pipeline.Dedup
        .simhashNearDups(d, "doc_id", "text").count()
      println(f"PROBE $label%-6s docs=${d.count()}%8d pairs=$pairs%10d " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%6.2f")
    }
    spark.stop()
  }
}
