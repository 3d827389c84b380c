package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{Commands, SearchEngine, SearchOptions}

/**
 * The filtered-base cache's scale contract, measured: a client walking
 * result pages pays the corpus scan ONCE (the base miss materializes at
 * most cap+1 rows), and every further page is a job over that bounded
 * base — so page latency is flat in corpus size while only the cold
 * page grows. Runs the same paging sequence against sf0.1 documents
 * (5k docs) and a 100× replica (500k docs), NOCONTENT (narrow
 * LocalRelation base) and RETURN (persisted full base) both.
 */
object ServeScaleProbe {
  private val HX = "/tmp/graft-serve100x"
  private val Shift = 100000000L

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    if (!graft.util.FsIO.exists(spark, s"$HX/_DONE")) {
      val base = spark.read.parquet(s"$sf/documents.parquet")
      (0 until 100).map(i => base.withColumn("doc_id", col("doc_id") + lit(i * Shift)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$HX/documents.parquet")
      graft.util.FsIO.writeTextAtomic(spark, s"$HX/_DONE", "ok")
      println("synth documents x100 done")
    }

    def ms(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    Seq(("sf0.1", sf), ("100x", HX)).foreach { case (label, dir) =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val engine = new SearchEngine
      val cmds = new Commands(engine, _ => (docs, col("doc_id")))
      require(cmds.execute(Seq("FT.CREATE", "ss_idx", "SCHEMA",
        "text", "TEXT", "lang", "TAG", "n_chars", "NUMERIC")) == "OK")
      val q = "@text:dup @lang:{en}"
      def page(off: Int, content: Boolean) = engine.searchReply("ss_idx", q,
        if (content) SearchOptions(limit = (off, 10), returnFields = Seq(("lang", None)))
        else SearchOptions(limit = (off, 10), noContent = true))
      // JIT/page-cache warm on an unrelated query, then drop its base
      engine.searchReply("ss_idx", "@lang:{de}", SearchOptions(noContent = true))
      val e0 = engine // keep caches; each shape below is its own base
      def sweep(content: Boolean, tag: String): Unit = {
        val cold = ms(page(0, content))
        val pages = (1 to 20).map(i => ms(page(i * 10, content))).sorted
        println(f"PROBE $label $tag cold_page=$cold%.0f ms " +
          f"cached_page_p50=${pages(10)}%.1f ms max=${pages.last}%.1f " +
          f"(hits=${e0.baseCacheHits.get})")
      }
      sweep(content = false, "nocontent")
      sweep(content = true, "content")
    }
    spark.stop()
  }
}
