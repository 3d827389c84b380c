package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.pipeline.Dedup

/**
 * BandFreqAuto (r12 verdict item 4): minhashNearDups' default
 * `maxBandFreq` derives from the corpus' own band-bucket histogram —
 * the largest cap whose surviving banded pair mass stays within
 * BandFreqBudgetPerDoc x nDocs, floored at BandFreqFloor (so the gate
 * corpora, whose buckets sit under the floor, run exactly as uncapped).
 * Reference analogue: the planner's data-driven crossover
 * (src/query/planner.cc:21-46).
 */
class BandFreqAutoSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("bandfreq-auto-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = ()

  // ---- deriveBandFreq is a pure prefix walk over (size -> buckets) ----

  test("small buckets only: cap settles at the floor") {
    // 1000 buckets of size 2 at 32 bands -> nDocs=62, budget=3968,
    // mass 1000 fits; nothing above the floor to admit
    val cap = Dedup.deriveBandFreq(Array((2L, 1000L)), bands = 32)
    assert(cap == Dedup.BandFreqFloor)
  }

  test("an O(corpus) hot bucket is excluded, floor-sized buckets stay") {
    // the 30k bucket implies ~9e8 pairs against a ~124k budget
    val cap = Dedup.deriveBandFreq(Array((2L, 1000L), (30000L, 2L)), bands = 32)
    assert(cap == Dedup.BandFreqFloor)
  }

  test("a mid-size bucket within budget raises the cap above the floor") {
    // rows = 2*100000 + 100 -> nDocs ~ 6253, budget ~ 400k;
    // size-2 mass 100k fits, size-100 mass 4950 still fits -> cap 100
    val cap = Dedup.deriveBandFreq(Array((2L, 100000L), (100L, 1L)), bands = 32)
    assert(cap == 100)
  }

  test("the prefix walk stops at the first budget-busting size") {
    // size-300 busts the budget; the larger-but-lighter 400 bucket must
    // NOT re-open admission (a single cap admits ALL sizes below it)
    val sizes = Array((2L, 1000L), (300L, 50L), (400L, 1L))
    val cap = Dedup.deriveBandFreq(sizes, bands = 32)
    assert(cap == Dedup.BandFreqFloor)
  }

  // ---- end-to-end semantics of the auto default ----

  private def corpus(nUnique: Int, nClique: Int) = {
    val sp = spark; import sp.implicits._
    val unique = (1 to nUnique).map(i =>
      (s"u$i", s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h"))
    val clique = (1 to nClique).map(i =>
      (s"c$i", "the same exact duplicated text block repeated verbatim"))
    (unique ++ clique).toDF("doc_id", "text")
  }

  test("auto cap never binds on a natural corpus: output equals uncapped") {
    val df = corpus(nUnique = 300, nClique = 0)
      // plant real near-dups so the equality is non-vacuous
      .unionByName {
        val sp = spark; import sp.implicits._
        (1 to 10).map(i =>
          (s"p$i", s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}x"))
          .toDF("doc_id", "text")
      }
    assert(Dedup.autoBandFreq(df, "doc_id", "text") == Dedup.BandFreqFloor)
    def pairs(cap: Option[Int]) =
      Dedup.minhashNearDups(df, "doc_id", "text", threshold = 0.5,
          maxBandFreq = cap)
        .select("key_a", "key_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    val auto = pairs(Dedup.BandFreqAuto)
    val uncapped = pairs(None)
    assert(auto == uncapped)
    assert(auto.nonEmpty, "planted near-dups must be found")
  }

  test("auto cap drops an O(corpus) identical-text clique's buckets") {
    // 150 identical docs share every band bucket (size 150 > floor);
    // their C(150,2) pair mass busts the budget, so auto drops those
    // buckets — the documented hot-bucket recall trade, now data-driven
    val df = corpus(nUnique = 200, nClique = 150)
    val auto = Dedup.minhashNearDups(df, "doc_id", "text", threshold = 0.5,
        maxBandFreq = Dedup.BandFreqAuto)
      .select("key_a", "key_b").collect()
    assert(!auto.exists(r => r.getString(0).startsWith("c") &&
      r.getString(1).startsWith("c")),
      "clique pairs ride only capped buckets and must be dropped")
  }
}
