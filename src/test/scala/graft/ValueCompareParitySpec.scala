package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.SearchEngine
import graft.model._
import graft.sources.Documents

/**
 * The reference's OWN dynamic-value Compare test table
 * (testing/expr/value_test.cc:112-165 Compare_test, :167-169
 * Compare_floating_point), replayed through the public APPLY surface.
 * Each (l, r, ordering) vector is checked through all six relational
 * operators, so both the ordering itself and the UNORDERED truth
 * rules (value.h:135-161: ==, <=, >= true; <, >, != false) are pinned
 * against the exact cases the reference uses to define them.
 */
class ValueCompareParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private lazy val engine: SearchEngine = {
    val sp = spark; import sp.implicits._
    val df = Seq(("k1", Option.empty[Double], Option.empty[String]))
      .toDF("k", "nilnum", "nilstr")
    val e = new SearchEngine
    e.createIndex(IndexSchema("vals", Seq(FieldDef("nilnum", NumericField))),
      Documents.enrich(df, IndexSchema("vals", Seq(
        FieldDef("nilnum", NumericField))), keyExpr = Some(col("k"))))
    e
  }

  sealed trait Ord
  case object LT extends Ord; case object EQ extends Ord
  case object GT extends Ord; case object UN extends Ord

  // value_test.cc:120-143, verbatim (bools spelled as comparisons —
  // the expression language has no bool literals, like the reference's
  // parser; (0 == 1) IS Value(false) by the comparison rules).
  private val F = "(0 == 1)"
  private val T = "(0 == 0)"
  private val vectors: Seq[(String, String, Ord)] = Seq(
    ("@nilnum", "@nilnum", EQ),        // both-Nil ⇒ EQUAL
    ("@nilnum", F, UN),                // one-Nil ⇒ UNORDERED
    ("@nilnum", T, UN),
    ("@nilnum", "0.0", UN),
    ("@nilnum", "''", UN),
    (F, F, EQ), (F, T, LT), (T, F, GT), (T, T, EQ),
    ("-1.0", "0.0", LT), ("0.0", "0.0", EQ), ("1.0", "0.0", GT),
    ("0.0", "'0.0'", EQ),              // num/str promotes the string
    ("0.0", "'1.0'", LT),
    ("0.0", "'-1.0'", GT),
    (T, "'0.0'", GT),                  // bool joins numerically
    ("'a'", "'b'", LT), ("'a'", "'a'", EQ), ("'a'", "'aa'", LT),
    ("'0.0'", "'0.00'", LT),           // str/str stays LEXICOGRAPHIC
    ("0.0", "-0.0", EQ))               // Compare_floating_point

  private def expected(o: Ord, op: String): Double = {
    val t = (o, op) match {
      case (EQ, "==") | (UN, "==") => true
      case (LT, "!=") | (GT, "!=") => true
      case (LT, "<") => true
      case (LT, "<=") | (EQ, "<=") | (UN, "<=") => true
      case (GT, ">") => true
      case (GT, ">=") | (EQ, ">=") | (UN, ">=") => true
      case _ => false
    }
    if (t) 1.0 else 0.0
  }

  private val ops = Seq("==", "!=", "<", "<=", ">", ">=")

  test("value_test.cc Compare table: all vectors x all six operators") {
    vectors.zipWithIndex.foreach { case ((l, r, o), i) =>
      val applys = ops.zipWithIndex.flatMap { case (op, j) =>
        Seq("APPLY", s"($l) $op ($r)", "AS", s"c$j")
      }
      val row = engine.aggregate("vals", "*",
        Seq("LOAD", "1", "@nilnum") ++ applys).collect().head
      ops.zipWithIndex.foreach { case (op, j) =>
        val got = row.getAs[Double](s"c$j")
        assert(got == expected(o, op),
          s"vector #$i: ($l) $op ($r) — got $got, want ${expected(o, op)}")
      }
      // symmetry, as the reference's loop asserts (value_test.cc:146-160)
      val rApplys = ops.zipWithIndex.flatMap { case (op, j) =>
        Seq("APPLY", s"($r) $op ($l)", "AS", s"c$j")
      }
      val flipped: Ord = o match {
        case LT => GT; case GT => LT; case x => x
      }
      val row2 = engine.aggregate("vals", "*",
        Seq("LOAD", "1", "@nilnum") ++ rApplys).collect().head
      ops.zipWithIndex.foreach { case (op, j) =>
        assert(row2.getAs[Double](s"c$j") == expected(flipped, op),
          s"vector #$i flipped: ($r) $op ($l)")
      }
    }
  }
}
