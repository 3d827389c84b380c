package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{Commands, SearchEngine, SearchOptions}

/**
 * Text predicates over a NON-RESIDENT parquet relation — the 100 TB
 * shape, where every query re-reads the scan and the filter's codegen
 * fusion (TokenMatch/ProximityMatch/AnyPrefixMatch vs CodegenFallback)
 * is paid per row per query instead of once at cache fill. The gate
 * suite keeps TEXT engines resident, so this is the probe that shows
 * the fusion's value. Run at two commits for an isolated pair.
 */
object ColdScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse {
      if (graft.util.FsIO.exists(spark, "/tmp/graft-sf10x/_DONE"))
        "/tmp/graft-sf10x"
      else "/root/testdata/sf0.1"
    }
    println(s"corpus: $dir (non-resident)")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val engine = new SearchEngine
    engine.replyCacheEnabled = false // measure compute, not the cache
    engine.baseCacheEnabled = false // the filtered-base cache would serve reps 2+ too
    val cmds = new Commands(engine, _ => (docs, col("doc_id")))
    require(cmds.execute(Seq("FT.CREATE", "cold_idx", "SCHEMA",
      "text", "TEXT", "lang", "TAG", "source", "TAG")) == "OK")

    def med(label: String, q: String): Unit = {
      def run() = engine.searchReply("cold_idx", q,
        SearchOptions(limit = (0, 10), noContent = true)).total
      run() // warm (page cache + JIT)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROBE $label p50=${ts(2)}%.2f s ${ts.map(t => f"$t%.2f").mkString("[", ",", "]")}")
    }
    med("prefix", "@text:sca*")
    med("fuzzy", "@text:%merg%")
    med("slop", "\"data merge\"~2")
    med("tag_prefix", "@source:{src1*}")
    spark.stop()
  }
}
