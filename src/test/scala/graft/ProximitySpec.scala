package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Proximity
import graft.text.Proximity.ExactSpec

/**
 * Bounded proximity algorithms (INORDER greedy, unordered sliding
 * window + distinct-representative matching) against the naive
 * assignment-backtracking MODEL — semantics must be identical; only
 * the complexity changed (the naive reject path is exponential on a
 * long document that repeats every query term).
 */
class ProximitySpec extends AnyFunSuite {

  private def model(tokens: Seq[(String, Int)], words: Seq[String],
                    slop: Int, inorder: Boolean): Boolean = {
    val cands = words.map(w =>
      tokens.filter(_._1 == w).map(_._2).toArray).toArray
    if (cands.exists(_.isEmpty)) false
    else Proximity.matchesBacktrack(cands, slop, inorder)
  }

  private def fast(tokens: Seq[(String, Int)], words: Seq[String],
                   slop: Int, inorder: Boolean): Boolean =
    Proximity.matches(tokens, words.map(ExactSpec.apply), slop, inorder)

  test("targeted: distinctness, duplicate matchers, order, window edges") {
    def toks(ws: String*): Seq[(String, Int)] = ws.zipWithIndex
    // duplicate matchers need DISTINCT positions
    assert(!fast(toks("a", "b"), Seq("a", "a"), slop = 5, inorder = false))
    assert(fast(toks("a", "b", "a"), Seq("a", "a"), slop = 5, inorder = false))
    assert(fast(toks("a", "a"), Seq("a", "a"), slop = 0, inorder = true))
    // order matters only under INORDER
    assert(fast(toks("b", "a"), Seq("a", "b"), slop = 1, inorder = false))
    assert(!fast(toks("b", "a"), Seq("a", "b"), slop = 1, inorder = true))
    // window arithmetic: k words spanning exactly slop intervening
    assert(fast(toks("a", "x", "b"), Seq("a", "b"), slop = 1, inorder = true))
    assert(!fast(toks("a", "x", "b"), Seq("a", "b"), slop = 0, inorder = true))
    // Int.MaxValue slop (the INORDER-only call shape) must not overflow
    assert(fast(toks("b", "x", "x", "a"), Seq("b", "a"), Int.MaxValue, inorder = true))
    assert(!fast(toks("a", "x", "x", "b"), Seq("b", "a"), Int.MaxValue, inorder = true))
    // three matchers choosing around a shared middle position
    assert(fast(toks("a", "b", "c"), Seq("a", "b", "c"), slop = 0, inorder = false))
    assert(!fast(toks("a", "b"), Seq("a", "b", "b"), slop = 5, inorder = false))
    assert(fast(toks("a", "b", "b"), Seq("a", "b", "b"), slop = 0, inorder = false))
  }

  test("differential fuzz: bounded algorithms == backtracking model") {
    val rnd = new scala.util.Random(0xC0FFEE)
    val alphabet = Vector("a", "b", "c", "d")
    var checked = 0
    for (_ <- 0 until 4000) {
      val nTok = 1 + rnd.nextInt(14)
      // occasional position gaps, like stop-word-free streams vs raw
      var pos = 0
      val tokens = (0 until nTok).map { _ =>
        pos += 1 + (if (rnd.nextInt(4) == 0) rnd.nextInt(3) else 0)
        (alphabet(rnd.nextInt(alphabet.size)), pos)
      }
      val k = 1 + rnd.nextInt(4)
      val words = Seq.fill(k)(alphabet(rnd.nextInt(alphabet.size)))
      val slop = rnd.nextInt(6)
      val inorder = rnd.nextBoolean()
      val expect = model(tokens, words, slop, inorder)
      val got = fast(tokens, words, slop, inorder)
      assert(got == expect,
        s"diverged: tokens=$tokens words=$words slop=$slop inorder=$inorder " +
          s"model=$expect fast=$got")
      checked += 1
    }
    assert(checked == 4000)
  }

  test("adversarial long document rejects in bounded time") {
    // 3 matchers × 2000 occurrences each, interleaved far apart so no
    // window ever matches: the naive reject path would exhaust ~8e9
    // assignments; the bounded algorithms must answer instantly.
    val tokens = (0 until 6000).map { i =>
      (Vector("a", "b", "c")(i % 3), i * 10) // every pair ≥ 10 apart
    }
    val words = Seq("a", "b", "c")
    val t0 = System.nanoTime()
    assert(!fast(tokens, words, slop = 5, inorder = false))
    assert(!fast(tokens, words, slop = 5, inorder = true))
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs < 5000, s"bounded reject took ${elapsedMs}ms")
  }

  test("OR inside SLOP: a pure-text OR is one matcher over the union of positions (orproximity.h)") {
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.engine.{SearchEngine, SearchOptions}
    import graft.model._
    import graft.sources.Documents
    val e = new SearchEngine
    val schema = IndexSchema("orprox_t", Seq(
      FieldDef("body", TextField()), FieldDef("price", NumericField)))
    val docs = Seq(
      ("d1", "cat runs fast today", 1.0),          // cat near fast
      ("d2", "fast dog appears", 2.0),             // dog adjacent to fast
      ("d3", "cat sits calmly while others wander slowly and then suddenly move fast", 3.0),
      ("d4", "dog stands alone", 4.0))             // no fast at all
      .toDF("__key", "body", "price")
    e.createIndex(schema, Documents.enrich(docs, schema))
    def keys(q: String, slop: Int) =
      e.search("orprox_t", q, SearchOptions(slop = Some(slop)))
        .collect().map(_.getAs[String]("__key")).toSet
    // the OR group supplies cat-or-dog positions; d3 has both words but
    // far apart, so SLOP 1 rejects it (previously the OR was dropped
    // from proximity and d3 leaked through)
    assert(keys("(cat|dog) fast", 1) == Set("d1", "d2"))
    // a wide slop admits d3 again — the group still participates
    assert(keys("(cat|dog) fast", 20) == Set("d1", "d2", "d3"))
    // a NON-pure OR (text|numeric) keeps filter-only semantics — no
    // proximity matcher from that subtree, so far-apart d3 passes via
    // its price branch
    val mixed = e.search("orprox_t", "(cat|@price:[3 3]) fast",
      SearchOptions(slop = Some(1))).collect().map(_.getAs[String]("__key")).toSet
    assert(mixed == Set("d1", "d3"))
  }
}
