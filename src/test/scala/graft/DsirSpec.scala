package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Curation

/** DSIR importance resampling (Xie et al. NeurIPS'23) — differential
  * spec vs a plain-Scala model of the same estimator, plus the
  * selection-behavior property the operator exists for. */
class DsirSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private val B = 64

  /** Scala mirror of dsirBuckets: lowercase alnum tokens, unigrams +
    * bigrams, bucket = first 8 md5 hex digits mod B. */
  private def bucketsOf(text: String): Seq[Int] = {
    val words = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val ngs = words ++ words.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    ngs.map { g =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(g.getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xFF}%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % B).toInt
    }
  }

  test("dsirBuckets matches the Scala model (tokenization + md5 bucketing)") {
    val sp = spark; import sp.implicits._
    val texts = Seq(
      "Hello, World! hello again",
      "singleword",
      "",
      "  punct---only?!  ",
      "MiXeD CaSe 123 numbers 456",
      "a b a b a") // repeated bigrams count once per occurrence
    val got = texts.toDF("t")
      .select(Curation.dsirBuckets(col("t"), B).as("b"))
      .collect().map(_.getSeq[Int](0).toSeq)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == bucketsOf(t), s"text: '$t'")
    }
  }

  test("dsirLogRatio: add-1 smoothed, unseen buckets finite, known value") {
    val t = Array(3L, 0L); val r = Array(1L, 1L)
    val lr = Curation.dsirLogRatio(t, r)
    // p_T = (4/5, 1/5), p_R = (2/4, 2/4)
    assert(math.abs(lr(0) - (math.log(4.0 / 5) - math.log(2.0 / 4))) < 1e-12)
    assert(math.abs(lr(1) - (math.log(1.0 / 5) - math.log(2.0 / 4))) < 1e-12)
    assert(lr.forall(v => !v.isInfinite && !v.isNaN))
  }

  test("dsirScore folds buckets over the ratio; empty doc scores 0") {
    val sp = spark; import sp.implicits._
    val ratio = Array.tabulate(B)(i => i * 0.01)
    val df = Seq(("d1", "alpha beta"), ("d2", "")).toDF("k", "t")
    val got = Curation.dsirScore(df, "t", ratio)
      .select("k", "__dsir_logw").as[(String, Double)].collect().toMap
    val want = bucketsOf("alpha beta").map(ratio).sum
    assert(math.abs(got("d1") - want) < 1e-9)
    assert(got("d2") == 0.0)
  }

  test("resampling selects target-like docs; deterministic across runs") {
    val sp = spark; import sp.implicits._
    // 40 docs speaking the target vocabulary, 40 speaking another;
    // strong separation so logw dominates the Gumbel noise
    val tgtVocab = "zebra quark lattice meson photon"
    val offVocab = "pebble harbor lantern meadow cedar"
    val pool = ((0 until 40).map(i => (s"t$i", Seq.fill(8)(tgtVocab).mkString(" "))) ++
      (0 until 40).map(i => (s"o$i", Seq.fill(8)(offVocab).mkString(" "))))
      .toDF("k", "t")
    val target = Seq.tabulate(10)(i => (s"ref$i", tgtVocab)).toDF("k", "t")
    val ratio = Curation.dsirLogRatio(
      Curation.dsirBucketCounts(target, "t", B),
      Curation.dsirBucketCounts(pool, "t", B))
    val pick = Curation.dsirResample(pool, "k", "t", ratio, k = 25)
      .select("k").as[String].collect().toSeq
    assert(pick.size == 25)
    assert(pick.forall(_.startsWith("t")),
      s"selection leaked off-target docs: $pick")
    val again = Curation.dsirResample(pool, "k", "t", ratio, k = 25)
      .select("k").as[String].collect().toSeq
    assert(pick == again)
  }

  test("dsirBuckets fuzz: random unicode texts match the Scala model") {
    val sp = spark; import sp.implicits._
    val pieces = Vector("a", "zz", "Q7", "1", "\u00e9", "\u00df", "\u4e2d\u6587",
      "\ud83d\ude00", "x y", "", " ", "tok", "na\u00efve", "..", "-", "A_B", "0x1f")
    val rnd = new scala.util.Random(20260813L)
    val texts = Seq.fill(200)(
      Seq.fill(rnd.nextInt(14))(pieces(rnd.nextInt(pieces.size)))
        .mkString(Seq(" ", ", ", "!", "  ")(rnd.nextInt(4))))
    val got = texts.toDF("t")
      .select(Curation.dsirBuckets(col("t"), B).as("b"))
      .collect().map(_.getSeq[Int](0).toSeq)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == bucketsOf(t), s"text: '$t'")
    }
  }

  test("dsirBucketCountsSplit equals two separate dsirBucketCounts scans") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("en", "the cat sat on the mat"),
      ("en", "a dog ran far"),
      ("fr", "le chat dort ici"),
      ("fr", "the mixed language row"),
      ("en", "")).toDF("lang", "t")
    val b = 64
    val (tgt, raw) = Curation.dsirBucketCountsSplit(df, "t", col("lang") === "en", b)
    assert(tgt.toSeq == Curation.dsirBucketCounts(df.filter(col("lang") === "en"), "t", b).toSeq)
    assert(raw.toSeq == Curation.dsirBucketCounts(df, "t", b).toSeq)
  }
}
