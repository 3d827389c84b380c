package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{SearchEngine, SearchOptions}
import graft.model._
import graft.query.StringParam
import graft.sources.Documents

/**
 * The reference's OWN expression test table
 * (testing/expr/expr_test.cc:76-158 TypesTest, :179-195 rejection
 * tests), replayed verbatim through the public APPLY surface against
 * the same record (@one=1, @two=2, @notfound declared-but-absent,
 * params $one="1", $two="2"). Pins the precedence ladder the table
 * defines — `^` at the SAME level as `*` `/`, left-associative
 * ((2*-2)^4 = 256, not 2*((-2)^4) = 32), chained comparisons
 * left-folding through bool-as-number ((1<=2)<=3), `!` binding
 * tighter than arithmetic — plus byte substr, contains-counts,
 * variadic concat, param coercion, and NaN comparison rules.
 */
class ExprTableParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private lazy val engine: SearchEngine = {
    val sp = spark; import sp.implicits._
    val df = Seq(("k1", Some(1.0), Some(2.0), Option.empty[Double]))
      .toDF("k", "one", "two", "notfound")
    val schema = IndexSchema("exprs", Seq(
      FieldDef("one", NumericField), FieldDef("two", NumericField),
      FieldDef("notfound", NumericField)))
    val e = new SearchEngine
    e.createIndex(schema, Documents.enrich(df, schema, keyExpr = Some(col("k"))))
    e
  }
  private val opts = SearchOptions(params = Map(
    "one" -> StringParam("1"), "two" -> StringParam("2")))

  private def eval(expr: String): Any =
    engine.aggregate("exprs", "*", Seq("APPLY", expr, "AS", "v"), opts)
      .select("v").collect().head.get(0)

  // expr_test.cc:77-157, verbatim. None = the reference expects a
  // compile failure. Value(true) surfaces as 1.0 (bools materialize
  // numerically on the APPLY surface, like the reference's RESP).
  private val table: Seq[(String, Option[Any])] = Seq(
    ("1<=2<=3", Some(1.0)),
    ("1==2==3", Some(0.0)),
    ("1>=2>=3", Some(0.0)),
    ("1!=2!=3", Some(1.0)),
    ("1--1-1", Some(1.0)),
    ("1--1+1", Some(3.0)),
    ("1+-1<1", Some(1.0)),
    ("1+-1<=1", Some(1.0)),
    ("1+-1==1", Some(0.0)),
    ("1+-1!=1", Some(1.0)),
    ("1+-1>=1", Some(0.0)),
    ("0*0^0", Some(1.0)),
    ("2*-2^4", Some(256.0)),
    ("2/-2*4", Some(-4.0)),
    ("2/-2/4", Some(-0.25)),
    ("2/-2^4", Some(1.0)),
    ("0/0<0", Some(0.0)),
    ("1", Some(1.0)),
    (".5", Some(0.5)),
    ("1+1", Some(2.0)),
    ("1+1-2", Some(0.0)),
    ("1*1+3", Some(4.0)),
    (" 1 ", Some(1.0)),
    (" 1 + 1 ", Some(2.0)),
    (" 1 + 1 -2", Some(0.0)),
    (" 1 *1+ 3", Some(4.0)),
    ("1 - -1 -1", Some(1.0)),
    (" (1)", Some(1.0)),
    (" 1+(2*3)", Some(7.0)),
    (" -1+(2*3)", Some(5.0)),
    (" 1+2", Some(3.0)),
    ("@one", Some(1.0)),
    ("@two", Some(2.0)),
    ("floor(1+1/2)", Some(1.0)),
    (" ceil(1 + 1 / 2)", Some(2.0)),
    (" '1' ", Some("1")),
    (" startswith('11', '1')", Some(1.0)),
    ("exists(@notfound)", Some(0.0)),
    ("exists(@one)", Some(1.0)),
    ("exists(@xx)", None),
    ("log(1.0)", Some(0.0)),
    ("abs(-1.0)", Some(1.0)),
    ("sqrt(4.0)", Some(2.0)),
    ("exp(0.0)", Some(1.0)),
    ("log2(4.0)", Some(2.0)),
    ("substr('', 1, 1)", Some("")),
    ("substr('abc', 1, 1)", Some("b")),
    ("substr('abc', -1, 1)", Some("c")),
    ("substr('abc', 1, 2)", Some("bc")),
    ("substr('abc', -1, 2)", Some("c")),
    ("substr('abc', -2, 2)", Some("bc")),
    ("substr('abc', 3, 0)", Some("")),
    ("substr('abc', 3, 1)", Some("")),
    ("substr('abc', 2, 10)", Some("c")),
    ("lower('A')", Some("a")),
    ("upper('a')", Some("A")),
    ("contains('abc', '')", Some(4.0)),
    ("contains('abc', '1')", Some(0.0)),
    ("contains('abcabc', 'abc')", Some(2.0)),
    ("strlen('')", Some(0.0)),
    ("strlen('a')", Some(1.0)),
    ("concat()", Some("")),
    ("concat('a')", Some("a")),
    ("concat('b','')", Some("b")),
    ("concat('a', 'b')", Some("ab")),
    ("concat('ab', 'cd', 'ef')", Some("abcdef")),
    ("!0", Some(1.0)),
    ("!1", Some(0.0)),
    ("!1+1", Some(1.0)),
    ("!1!=1", Some(1.0)),
    ("$one", Some("1")),
    ("$one+1", Some(2.0)),
    ("1>2", Some(0.0)),
    ("1<2", Some(1.0)),
    ("1>=2", Some(0.0)),
    ("1<=2", Some(1.0)))

  test("expr_test.cc TypesTest table, verbatim through APPLY") {
    table.foreach { case (exprStr, want) =>
      want match {
        case None =>
          intercept[Exception](eval(exprStr))
        case Some(d: Double) =>
          val got = eval(exprStr)
          val gd = got match {
            case x: Double => x
            case x: java.lang.Double => x.doubleValue()
            case other => fail(s"'$exprStr': non-numeric result $other")
          }
          assert(math.abs(gd - d) < 1e-12, s"'$exprStr': got $gd want $d")
        case Some(s: String) =>
          assert(eval(exprStr) == s, s"'$exprStr'")
        case Some(other) => fail(s"bad expectation $other")
      }
    }
  }

  test("empty / bare-NOT expressions are rejected (expr_test.cc:179-195)") {
    for (bad <- Seq("", " ", "!", "! ", "!()")) {
      intercept[Exception](eval(bad))
    }
  }
}
