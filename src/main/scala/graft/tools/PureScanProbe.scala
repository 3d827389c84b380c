package graft.tools

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong, AtomicReference}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.sources.Documents

/**
 * Minimal reproduction attempt for the churn flicker WITHOUT the
 * engine: a writer thread swaps freshly-enriched corpus DataFrames
 * (and runs posting-build-like jobs on them, as register() does) while
 * a reader filters the CURRENT DataFrame with the same phrase-contains
 * predicate the scan path compiles to. If rows still go missing, the
 * race is below the engine (enrich/UDF/Spark); if not, it is in the
 * engine's serving path.
 */
object PureScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        sys.env.getOrElse("PROBE_EXCLUDE", ""))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark; import sp.implicits._
    val cycles = sys.env.getOrElse("PROBE_CYCLES", "800").toInt

    val schema = IndexSchema("ps_t", Seq(
      FieldDef("body", TextField(withSuffixTrie = true)),
      FieldDef("cat", TagField()),
      FieldDef("price", NumericField)))
    def corpus(extra: Int) = ((1 to 12).map { i =>
      (s"k$i", s"stable anchor phrase token$i", "keep", i.toDouble)
    } ++ (1 to extra).map { i =>
      (s"x$i", s"churn extra document word$i", "churn", 100.0 + i)
    }).toDF("__key", "body", "cat", "price")

    val variant = sys.env.getOrElse("PROBE_VARIANT", "enrich")
    val tok = udf((s: String) => if (s == null) null else s.split(" "))
    def build(extra: Int): DataFrame = variant match {
      case "raw" => corpus(extra)
      case "udf" => corpus(extra).withColumn("joined",
        concat(lit(" "), array_join(tok(col("body")), " "), lit(" ")))
      case "hof" => corpus(extra).withColumn("joined",
        concat(lit(" "),
          array_join(transform(split(col("body"), " "), t => t), " "), lit(" ")))
      case _ => Documents.enrich(corpus(extra), schema)
    }
    val filterCol = variant match {
      case "raw" => col("body").contains("stable anchor phrase")
      case "udf" | "hof" => col("joined").contains(" stable anchor phrase ")
      case _ => col("__body__joined").contains(" stable anchor phrase ")
    }
    def writerJob(docs: DataFrame): Unit = variant match {
      case "raw" => docs.groupBy("cat").count().collect(); ()
      case "hof" => docs.select(explode(split(col("body"), " ")).as("term"))
        .groupBy("term").count().collect(); ()
      case "udf" => docs.select(explode(tok(col("body"))).as("term"))
        .groupBy("term").count().collect(); ()
      case _ => docs.select(explode(col("__body__terms")).as("term"))
        .groupBy("term").count().collect(); ()
    }
    val current = new AtomicReference[DataFrame](build(0))
    val wrong = new AtomicInteger(0)
    val total = new AtomicLong(0)
    val errs = new AtomicInteger(0)
    val done = new AtomicBoolean(false)
    val readers = (1 to sys.env.getOrElse("PROBE_READERS", "1").toInt).map { _ =>
      new Thread(() => {
        while (!done.get) {
          try {
            val keys = current.get()
              .filter(filterCol)
              .select(col("__key")).orderBy(col("__key"))
              .collect().map(_.getString(0)).toSeq
            total.incrementAndGet()
            if (keys.count(_.startsWith("k")) != 12) {
              wrong.incrementAndGet()
              println(s"WRONG -> ${keys.mkString(",")}")
            }
          } catch { case _: Throwable => errs.incrementAndGet() }
        }
      })
    }
    readers.foreach(_.start())
    (1 to cycles).foreach { i =>
      val docs = build(i % 7)
      // ENGINE ordering: publish first (createIndex), THEN run the
      // posting-build jobs over the SAME instance readers now query
      current.set(docs)
      writerJob(docs)
    }
    done.set(true)
    readers.foreach(_.join(30000))
    println(s"PROBE pure_scan variant=$variant cycles=$cycles queries=${total.get} " +
      s"wrong=${wrong.get} errs=${errs.get}")
    spark.stop()
  }
}
