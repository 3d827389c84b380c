package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke tool: runs SparkEntry.entry exactly as the driver does
  * (sf0.001, rows>0 check) and prints the result. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"ENTRY_ROWS=${rows.length}")
    rows.take(5).foreach(r => println(s"ENTRY_ROW $r"))
    spark.stop()
  }
}
