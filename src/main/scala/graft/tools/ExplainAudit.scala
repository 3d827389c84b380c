package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for headline queries so the
  * scan pushdown / codegen / join strategy can be audited. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_numeric_range", "a_groupby_reducers", "q_knn_l2",
        "p_dedup_minhash_lsh", "q_phrase_posting", "q_or_posting")
    names.foreach { n =>
      println(s"===================== $n =====================")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
