package graft.tools

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.engine.{SearchEngine, SearchOptions}
import graft.model._
import graft.sources.Documents
import graft.text.PostingIndex

/**
 * Bisection probe for the MaintainStressSpec phrase flicker (a
 * transient reply missing stable docs mid-churn, ~1 in 8 suite runs):
 * loops register cycles while phrase readers hammer, in three modes —
 * raw search().collect() (no serving caches in the path), searchReply
 * with both caches disabled, and searchReply with caches on — counting
 * wrong results per mode. Whichever modes flicker localizes the race.
 */
object PhraseChurnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark; import sp.implicits._
    val cycles = sys.env.getOrElse("PROBE_CYCLES", "60").toInt

    val schema = IndexSchema("pc_t", Seq(
      FieldDef("body", TextField(withSuffixTrie = true)),
      FieldDef("cat", TagField()),
      FieldDef("price", NumericField)))
    def corpus(extra: Int) = ((1 to 12).map { i =>
      (s"k$i", s"stable anchor phrase token$i", "keep", i.toDouble)
    } ++ (1 to extra).map { i =>
      (s"x$i", s"churn extra document word$i", "churn", 100.0 + i)
    }).toDF("__key", "body", "cat", "price")
    def counts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.groupBy("term").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

    val modes = sys.env.get("PROBE_MODES").map(_.split(",").toSeq)
      .getOrElse(Seq("raw_search", "reply_nocache", "reply_cached"))
    modes.foreach { mode =>
      val e = new SearchEngine
      e.postingRouteMaxSelectivity = 1.0
      if (mode != "reply_cached") {
        e.replyCacheEnabled = false
        e.baseCacheEnabled = false
      }
      def register(extra: Int): Unit = {
        val docs = Documents.enrich(corpus(extra), schema)
        e.createIndex(schema, docs)
        val p = PostingIndex.build(docs, schema, "body")
        e.registerPosting("pc_t", "body", p)
        e.registerPostingStats("pc_t", "body", counts(p))
        val pos = PostingIndex.buildPositions(docs, schema, "body")
        e.registerPositionalPosting("pc_t", "body", pos)
        e.registerPositionalStats("pc_t", "body", counts(pos))
      }
      register(0)
      val wrong = new AtomicInteger(0)
      val total = new AtomicLong(0)
      val errs = new AtomicInteger(0)
      val done = new AtomicBoolean(false)
      val q = "@body:\"stable anchor phrase\""
      val nReaders = sys.env.getOrElse("PROBE_READERS", "4").toInt
      val readers = (1 to nReaders).map { _ =>
        new Thread(() => {
          while (!done.get) {
            try {
              val keys: Seq[String] = mode match {
                case "raw_search" =>
                  e.search("pc_t", q, SearchOptions(limit = (0, 20), noContent = true))
                    .collect().map(_.getString(0)).toSeq
                case _ =>
                  e.searchReply("pc_t", q,
                    SearchOptions(limit = (0, 20), noContent = true))
                    .rows.map(_.getString(0)).toSeq
              }
              total.incrementAndGet()
              val stable = keys.count(_.startsWith("k"))
              if (stable != 12) {
                wrong.incrementAndGet()
                val route = e.lastRouteEstimates.mkString("/")
                val again = e.search("pc_t", q,
                  SearchOptions(limit = (0, 20), noContent = true))
                  .collect().map(_.getString(0)).toSeq
                println(s"WRONG[$mode] route=$route -> ${keys.mkString(",")} " +
                  s"| rerun route=${e.lastRouteEstimates.mkString("/")} -> " +
                  s"${again.mkString(",")}")
              }
            } catch { case t: Throwable => errs.incrementAndGet() }
          }
        })
      }
      readers.foreach(_.start())
      (1 to cycles).foreach(i => register(i % 7))
      done.set(true)
      readers.foreach(_.join(30000))
      println(s"PROBE mode=$mode cycles=$cycles queries=${total.get} " +
        s"wrong=${wrong.get} errs=${errs.get}")
    }
    spark.stop()
  }
}
