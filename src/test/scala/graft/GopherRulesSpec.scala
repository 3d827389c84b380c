package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.pipeline.TextMetrics

/** Gopher rule filter (Rae et al. 2021 A1.1): hand-computed rule
  * measurements, per-rule rejection, empty edge. */
class GopherRulesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("gopher-rules")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = ()

  private def rulesOf(text: String, minWords: Int = 2) = {
    val sp = spark; import sp.implicits._
    Seq(text).toDF("t")
      .select(TextMetrics.gopherRules(col("t"), minWords = minWords).as("g"))
      .select("g.*").collect()(0)
  }

  test("hand-computed measurements on a known document") {
    // 8 words: the(3) cat(3) sat(3) with(4) the(3) hat(3) and(3) ten(3) = 25 chars
    val r = rulesOf("the cat sat with the hat and ten")
    assert(r.getAs[Long]("word_count") == 8L)
    assert(r.getAs[Double]("mean_word_len") == 25.0 / 8)
    assert(r.getAs[Double]("symbol_word_ratio") == 0.0)
    assert(r.getAs[Double]("alpha_word_frac") == 1.0)
    // distinct stop hits: the, with, and = 3
    assert(r.getAs[Long]("stop_word_hits") == 3L)
    assert(r.getAs[Boolean]("pass"))
  }

  test("each rule rejects independently") {
    // symbol ratio: 1 '#' over 4 words = 0.25 > 0.1
    assert(!rulesOf("the cat # with").getAs[Boolean]("pass"))
    // mean word length < 3
    assert(!rulesOf("a an to of it be").getAs[Boolean]("pass"))
    // ellipsis: 2 of 2 lines end '...' > 0.3
    assert(!rulesOf("the cat sits here...\nwith the dog too...").getAs[Boolean]("pass"))
    // bullets allowed up to 90%: 1 of 2 lines is fine
    assert(rulesOf("- the cat with hat\nthe dog and bird sit").getAs[Boolean]("pass"))
    // no alphabetic words: alpha frac 0 and stopword misses
    assert(!rulesOf("12 34 56 78").getAs[Boolean]("pass"))
    // under min word count
    assert(!rulesOf("the with", minWords = 3).getAs[Boolean]("pass"))
  }

  test("empty text: zero counts, no pass, no NULL poisoning") {
    val r = rulesOf("")
    assert(r.getAs[Long]("word_count") == 0L)
    assert(r.getAs[Double]("mean_word_len") == 0.0)
    assert(!r.getAs[Boolean]("pass"))
  }

  test("gopherFilter keeps exactly the passing documents") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      ("good", "the cat sat with the hat and ten"),
      ("bad", "a an to of it be")).toDF("k", "t")
    val kept = TextMetrics.gopherFilter(df, "t", minWords = 2)
      .select("k").collect().map(_.getString(0)).toSeq
    assert(kept == Seq("good"))
  }

  test("differential fuzz: measurements match a naive model on random documents") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    val alpha = Vector("the", "cat", "#", "a", "...", "line...", "- x", "12",
      "with", "elephant", "be", "...", "to")
    val seps = Vector(" ", "  ", "\n", " \n")
    val rnd = new scala.util.Random(8181L)
    val samples = (1 to 200).map { i =>
      (i, Vector.fill(rnd.nextInt(25))(alpha(rnd.nextInt(alpha.size)))
        .mkString(seps(rnd.nextInt(seps.size))))
    }
    def model(text: String): (Long, Double, Double, Double, Double, Double, Long) = {
      val words = text.split("\\s+").filterNot(_.isEmpty)
      val lines = text.split("\n").map(_.trim).filterNot(_.isEmpty)
      val n = words.length
      val mwl = if (n == 0) 0.0 else words.map(_.length).sum.toDouble / n
      val sym = if (n == 0) 0.0
        else "#|\\.\\.\\.".r.findAllIn(text).size.toDouble / n
      val blf = if (lines.isEmpty) 0.0
        else lines.count(l => l.startsWith("-") || l.startsWith("*")).toDouble / lines.length
      val elf = if (lines.isEmpty) 0.0
        else lines.count(_.endsWith("...")).toDouble / lines.length
      val awf = if (n == 0) 0.0
        else words.count(_.exists(_.isLetter)).toDouble / n
      val sh = TextMetrics.GopherStops.count(st => words.map(_.toLowerCase).contains(st))
      (n.toLong, mwl, sym, blf, elf, awf, sh.toLong)
    }
    val got = samples.toDF("i", "t")
      .select(col("i"), TextMetrics.gopherRules(col("t"), minWords = 2).as("g"))
      .select("i", "g.*").collect().map(r => r.getAs[Int]("i") -> r).toMap
    samples.foreach { case (i, text) =>
      val (wc, mwl, sym, blf, elf, awf, sh) = model(text)
      val r = got(i)
      assert(r.getAs[Long]("word_count") == wc, s"i=$i wc <$text>")
      assert(math.abs(r.getAs[Double]("mean_word_len") - mwl) < 1e-5, s"i=$i mwl <$text>")
      assert(math.abs(r.getAs[Double]("symbol_word_ratio") - sym) < 1e-5, s"i=$i sym <$text>")
      assert(math.abs(r.getAs[Double]("bullet_line_frac") - blf) < 1e-5, s"i=$i blf <$text>")
      assert(math.abs(r.getAs[Double]("ellipsis_line_frac") - elf) < 1e-5, s"i=$i elf <$text>")
      assert(math.abs(r.getAs[Double]("alpha_word_frac") - awf) < 1e-5, s"i=$i awf <$text>")
      assert(r.getAs[Long]("stop_word_hits") == sh, s"i=$i sh <$text>")
    }
  }

  test("eval_once: identical results, and the struct stays out of the filter") {
    val sp = spark; import sp.implicits._
    // a FILE source, not a local relation: ConvertToLocalRelation folds
    // projections/filters over LocalRelation at planning time regardless
    // of determinism, which would hide the very plan shape under test
    val tmp = java.nio.file.Files.createTempDirectory("evalonce").toString
    (0 until 200).map { i =>
      (i.toLong, s"the cat sat with the hat and ten $i " * (1 + i % 5))
    }.toDF("id", "t").write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    val plain = df
      .withColumn("__g", TextMetrics.gopherRules(col("t"), minWords = 2))
      .filter(col("__g.pass") && col("__g.word_count") >= 5)
      .select(col("id"), col("__g.word_count"))
    val barriered = df
      .withColumn("__g", graft.functions.eval_once(
        TextMetrics.gopherRules(col("t"), minWords = 2)))
      .filter(col("__g.pass") && col("__g.word_count") >= 5)
      .select(col("id"), col("__g.word_count"))
    // bit-identical rows: the barrier only changes plan shape
    assert(barriered.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
    // the heavy struct must be evaluated in a Project BELOW the filter,
    // never inlined per predicate into the Filter condition
    val planStr = barriered.queryExecution.executedPlan.toString
    val filterLines = planStr.linesIterator.filter(_.contains("Filter")).toSeq
    assert(filterLines.nonEmpty)
    assert(!filterLines.exists(_.contains("gopher_counts")),
      s"struct inlined into the Filter: $filterLines")
    // while the un-barriered plan DOES inline it (the regression the
    // barrier exists for — if Catalyst ever stops, the barrier can go)
    val plainFilter = plain.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Filter")).toSeq
    assert(plainFilter.exists(_.contains("gopher_counts")))
  }
}
