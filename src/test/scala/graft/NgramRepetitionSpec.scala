package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.pipeline.TextMetrics

/** Gopher duplicate word-n-gram stats (Rae et al. 2021 table A1):
  * hand-computed coverage fractions, tie-breaking, overlap-no-double-
  * counting, and the threshold filter. */
class NgramRepetitionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("ngram-repetition")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = ()

  private def statsOf(text: String) = {
    val sp = spark; import sp.implicits._
    Seq(text).toDF("t")
      .select(TextMetrics.ngramRepetitionStats(col("t")).as("s"))
      .select("s.*").collect()(0)
  }

  test("top n-gram coverage marks positions — overlaps never double-count") {
    // words a,b,a,b,a,b: top 2-gram "a b" (3 occurrences) covers all 6
    val r = statsOf("a b a b a b")
    assert(r.getAs[Double]("top_2gram_char_frac") == 1.0)
    // 3-grams tie at count 2; equal length → lexicographic "a b a" wins,
    // occurrences at 0 and 2 cover positions 0..4 → 5 of 6 chars
    assert(math.abs(r.getAs[Double]("top_3gram_char_frac") - 5.0 / 6) < 1e-12)
    // no duplicated 5-gram
    assert(r.getAs[Double]("dup_5gram_char_frac") == 0.0)
  }

  test("dup n-gram coverage unions all duplicated occurrences") {
    // xx yy zz xx yy zz xx yy (8 words × 2 chars = 16)
    val r = statsOf("xx yy zz xx yy zz xx yy")
    // top 2-gram "xx yy" ×3 covers positions {0,1,3,4,6,7} → 12/16
    assert(r.getAs[Double]("top_2gram_char_frac") == 0.75)
    // 5-gram "xx yy zz xx yy" repeats (i=0, i=3) → covers 0..7 → all
    assert(r.getAs[Double]("dup_5gram_char_frac") == 1.0)
    // no 6-gram repeats
    assert(r.getAs[Double]("dup_6gram_char_frac") == 0.0)
  }

  test("edges: empty text, fewer words than n, single-occurrence top gram") {
    val e = statsOf("")
    assert(e.getAs[Double]("top_2gram_char_frac") == 0.0)
    assert(e.getAs[Double]("dup_10gram_char_frac") == 0.0)
    val two = statsOf("one two")
    // the single 2-gram IS the top gram — covers everything
    assert(two.getAs[Double]("top_2gram_char_frac") == 1.0)
    assert(two.getAs[Double]("top_3gram_char_frac") == 0.0) // < n words
    assert(two.getAs[Double]("dup_5gram_char_frac") == 0.0)
  }

  test("threshold filter: repetitive fails, varied passes") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      ("rep", "a b a b a b a b a b a b"),
      ("var", "the quick brown fox jumps over the lazy dog while birds sing " +
        "and rivers flow through quiet valleys under bright morning skies " +
        "as children play near old stone bridges watching boats drift past"))
      .toDF("k", "t")
    val kept = df.filter(TextMetrics.ngramRepetitionPass(col("t")))
      .select("k").collect().map(_.getString(0)).toSeq
    assert(kept == Seq("var"))
  }
}
