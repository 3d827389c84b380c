package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{RepetitionStats, SqEncode, WordNgrams}

/**
 * Differential fuzz for the row-local text/quantization expressions
 * against plain-Scala models, over inputs the ASCII gate corpora never
 * exercise: multi-byte UTF-8 (é, ß, 中), astral code points (😀 — where
 * UTF8String.numChars counts code points, not UTF-16 units), empties,
 * and embedded whitespace. Direct `eval` is the runtime path: these
 * expressions are CodegenFallback.
 */
class ExpressionFuzzSpec extends AnyFunSuite {

  private val pieces = Vector("a", "b", "zz", "Q7", "1", "é", "ß", "中文",
    "😀", "x y", "", " ", "tok", "naïve", "..", "ß😀é")

  test("TagsOf matches the legacy split/trim/fold/filter semantics") {
    import graft.functions.TagsOf
    // plain-Scala model of the replaced HOF chain: literal-separator
    // split keeping trailing empties, Spark trim (ASCII space 0x20
    // both ends), ASCII-only A-Z fold, drop empties
    def model(s: String, sep: String, cs: Boolean): Seq[String] = {
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      var start = 0
      var more = true
      while (more) {
        val i = s.indexOf(sep, start)
        if (i < 0) { parts += s.substring(start); more = false }
        else { parts += s.substring(start, i); start = i + sep.length }
      }
      parts.toSeq
        .map(_.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse)
        .map(t => if (cs) t else t.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c))
        .filter(_.nonEmpty)
    }
    def run(s: String, sep: String, cs: Boolean): Seq[String] = {
      val out = TagsOf(Literal(UTF8String.fromString(s), StringType), sep, cs)
        .eval(null).asInstanceOf[ArrayData]
      (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
    }
    val edges = Seq("", " ", ",", ",,", " A , b ,", "x,Y Z", "a||B|| ||c",
      "NEWS", "né,É中 ,😀", "  spaced  out  ", "trail,", ",lead")
    for (s <- edges; sep <- Seq(",", "||"); cs <- Seq(true, false))
      assert(run(s, sep, cs) == model(s, sep, cs), s"s='$s' sep='$sep' cs=$cs")
    val rnd = new scala.util.Random(20260814L)
    // whole code points only: picking raw UTF-16 units would produce
    // lone surrogates, which UTF8String round-trips as replacements
    val atoms = Vector("a", "A", " ", ",", "z", "Z", "|", "é", "😀", " ", " ")
    for (iter <- 1 to 1000) {
      val s = Vector.fill(rnd.nextInt(16))(atoms(rnd.nextInt(atoms.size))).mkString
      for ((sep, cs) <- Seq((",", false), (",", true), ("||", false)))
        assert(run(s, sep, cs) == model(s, sep, cs), s"iter $iter s='$s' sep='$sep' cs=$cs")
    }
  }

  test("WordNgrams matches the Scala model on random unicode word arrays") {
    val rnd = new scala.util.Random(20260813L)
    for (iter <- 1 to 1000) {
      val words = Vector.fill(rnd.nextInt(12))(pieces(rnd.nextInt(pieces.size)))
      val n = 1 + rnd.nextInt(4)
      val kept = words.filter(_.nonEmpty)
      val expected =
        if (kept.size < n) Seq.empty[String]
        else kept.sliding(n).map(_.mkString(" ")).toSeq.distinct
      val in = ArrayData.toArrayData(words.map(UTF8String.fromString).toArray)
      val out = WordNgrams(Literal(in, ArrayType(StringType)), n)
        .eval(null).asInstanceOf[ArrayData]
      val got = (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
      assert(got == expected, s"iter $iter: words=$words n=$n")
    }
  }

  test("RepetitionStats matches the Scala model on random unicode texts") {
    val rnd = new scala.util.Random(977L)
    for (iter <- 1 to 1000) {
      val text = Vector.fill(rnd.nextInt(10))(pieces(rnd.nextInt(pieces.size)))
        .mkString("\n")
      val lines = text.split("\n", -1).filter(_.nonEmpty)
      val total = lines.length
      val (expFrac, expChar) =
        if (total == 0) (0.0, 0.0)
        else {
          val byLine = lines.groupBy(identity).view
            .mapValues(g => (g.length.toLong,
              g.head.codePointCount(0, g.head.length).toLong))
          val totChars = byLine.values.map { case (c, l) => c * l }.sum
          val dupChars = byLine.values.map { case (c, l) => (c - 1) * l }.sum
          ((total - byLine.size).toDouble / total,
            if (totChars == 0) 0.0 else dupChars.toDouble / totChars)
        }
      val row = RepetitionStats(Literal(UTF8String.fromString(text), StringType))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      assert(row.getInt(0) == total, s"iter $iter n_lines: $text")
      assert(row.getDouble(1) == expFrac, s"iter $iter line frac: $text")
      assert(row.getDouble(2) == expChar, s"iter $iter char frac: $text")
    }
  }

  test("SqEncode matches the Scala model on random float vectors") {
    val rnd = new scala.util.Random(31337L)
    for (iter <- 1 to 1000) {
      val v = Array.fill(rnd.nextInt(20))((rnd.nextFloat() - 0.5f) * 20f *
        (if (rnd.nextInt(10) == 0) 0f else 1f)) // occasional zeros
      val maxAbs = if (v.isEmpty) 0f else v.map(math.abs).max
      val scale = if (maxAbs == 0f) 0f else maxAbs / 127f
      val expected =
        if (scale == 0f) v.map(_ => 0.toByte).toSeq
        else v.map(x => math.max(-127, math.min(127, math.round(x / scale))).toByte).toSeq
      val in = ArrayData.toArrayData(v)
      val row = SqEncode(Literal(in, ArrayType(FloatType)))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      assert(row.getFloat(0) == scale, s"iter $iter scale")
      val code = row.getArray(1)
      val got = (0 until code.numElements()).map(code.getByte)
      assert(got == expected, s"iter $iter codes: v=${v.toSeq}")
      // reconstruction bound: |v - scale*code| <= scale/2 everywhere
      got.zip(v).foreach { case (c, x) =>
        assert(math.abs(x - scale * c) <= scale / 2 + 1e-7f, s"iter $iter bound") }
    }
  }

  test("NgramRepetitionStats matches the Scala model on collision-heavy word streams") {
    import graft.functions.NgramRepetitionStats
    // tiny alphabet forces gram collisions; separators mix spaces/newlines
    val alpha = Vector("a", "bb", "ab", "c", "\u00e9\u00e9")
    val seps = Vector(" ", "  ", "\n", " \n ")
    def model(text: String): Seq[Double] = {
      val words = text.split("\\s+").filterNot(_.isEmpty)
      val total = words.map(_.length).sum.toDouble
      def grams(n: Int) = words.sliding(n).map(_.mkString(" ")).toSeq
      def cover(n: Int, pred: String => Boolean): Double = {
        val marked = Array.fill(words.length)(false)
        for (i <- 0 to words.length - n
             if pred(words.slice(i, i + n).mkString(" ")))
          (i until i + n).foreach(marked(_) = true)
        words.indices.filter(marked).map(words(_).length).sum / total
      }
      val tops = Seq(2, 3, 4).map { n =>
        if (total == 0 || words.length < n) 0.0
        else {
          val cnt = grams(n).groupBy(identity).view.mapValues(_.size).toMap
          // count desc, joined-length desc, lexicographic asc
          val best = cnt.keys.toSeq.sortBy(g => (-cnt(g), -g.length, g)).head
          cover(n, _ == best)
        }
      }
      val dups = Seq(5, 6, 7, 8, 9, 10).map { n =>
        if (total == 0 || words.length < n) 0.0
        else {
          val cnt = grams(n).groupBy(identity).view.mapValues(_.size).toMap
          cover(n, g => cnt(g) >= 2)
        }
      }
      tops ++ dups
    }
    val rnd = new scala.util.Random(4242L)
    for (iter <- 1 to 500) {
      val k = rnd.nextInt(30)
      val text = Vector.fill(k)(alpha(rnd.nextInt(alpha.size)))
        .mkString(seps(rnd.nextInt(seps.size)))
      val expected = model(text)
      val row = NgramRepetitionStats(Literal(UTF8String.fromString(text), StringType))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val got = (0 until 9).map(row.getDouble)
      assert(got == expected, s"iter $iter: text=<$text>")
    }
  }
}
