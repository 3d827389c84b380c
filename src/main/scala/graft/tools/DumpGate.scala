package graft.tools

/** Dev tool: print a named gate's collected rows (sorted, stringified)
  * — the cheap engine-vs-engine equivalence check for gates whose SF
  * the oracle does not cover (byte-compare the output across a stash
  * pair before trusting a restructured operator). */
object DumpGate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.util.GraftSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val rows = df.collect().map(_.toString).sorted
      println(s"GATE $name n=${rows.length}")
      rows.foreach(r => println(s"  $r"))
    }
    spark.stop()
  }
}
