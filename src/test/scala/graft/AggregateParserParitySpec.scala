package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.SearchEngine
import graft.model._
import graft.sources.Documents

/**
 * The reference's OWN aggregate-parser stage table
 * (testing/ft_aggregate_parser_test.cc:195-230 TestStages, :284-300
 * empty-expression rejects), replayed verbatim: every accepted stage
 * must parse AND execute; every `nullptr` row must throw — wrong
 * arity, non-integer counts, unknown `@fred`, bare identifiers where
 * a field is required, trailing junk, `MAX` without a value, `APPLY`
 * without `AS`, mixed-case keywords on both sides of the verdict.
 */
class AggregateParserParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private lazy val engine: SearchEngine = {
    val sp = spark; import sp.implicits._
    val df = (0 until 2).map(i => (s"k$i", i.toDouble, 2.0))
      .toDF("k", "n1", "n2")
    val schema = IndexSchema("pars", Seq(
      FieldDef("n1", NumericField), FieldDef("n2", NumericField)))
    val e = new SearchEngine
    e.createIndex(schema, Documents.enrich(df, schema, keyExpr = Some(col("k"))))
    e
  }

  private def run(tokens: Seq[String]): Unit = {
    engine.aggregate("pars", "*", tokens).collect(); ()
  }

  // ft_aggregate_parser_test.cc TestStages, verbatim: (argv, accepted)
  private val stages: Seq[(Seq[String], Boolean)] = Seq(
    (Seq("bogus"), false),
    (Seq("LiMiT"), false),
    (Seq("LIMIT", "10"), false),
    (Seq("LIMIT", "fred"), false),
    (Seq("LIMIT", "0", "10"), true),
    (Seq("LIMIT", "0", "10", "fred"), false),
    (Seq("FiLTER"), false),
    (Seq("FILTER", "fred"), false),
    (Seq("FILTER", "@fred"), false),
    (Seq("FILTER", "@n1", "+", "@n2"), false),
    (Seq("FILTER", "@n1"), true),
    (Seq("SORtBY", "1", "@n1"), true),
    (Seq("SORTBY", "2", "@n1", "ASC"), true),
    (Seq("SORTBY", "2", "@n1", "DESC"), true),
    (Seq("SORTBY"), false),
    (Seq("SORTBY", "1"), false),
    (Seq("SOrTBY", "2", "@n1"), false),
    (Seq("SORTBY", "1", "@n1", "MAX"), false),
    (Seq("SORTBY", "1", "@n1", "max", "5"), true),
    (Seq("SOrTBY", "2", "@n1", "max"), false),
    // DELIBERATE DEVIATION: the reference rejects GROUPBY 0 outright
    // ("Groupby requires arguments", ft_aggregate_parser.cc:198-200);
    // this engine accepts it as the global-aggregation form (classic
    // RediSearch `GROUPBY 0 REDUCE …`, used by a_global_stats) — the
    // reference simply has no global-reduce spelling. Pinned as
    // accepted so the divergence is explicit, not accidental.
    (Seq("GrOUPBY", "0"), true),
    (Seq("GROUPBY", "1"), false),
    (Seq("GROUPBY", "1", "fred"), false),
    (Seq("GROUPBY", "1", "@n1"), true),
    (Seq("GROUPBY", "1", "@n1", "REDUCE"), false),
    (Seq("GROUPBY", "1", "@n1", "REDUCE", "COUNT"), false),
    (Seq("GROUPBY", "1", "@n1", "REDUCE", "COUNT", "0"), true),
    (Seq("GROUPBY", "1", "@n1", "REDUCE", "COUNT", "0", "AS", "Y"), true),
    (Seq("GROUPBY", "1", "@n1", "REDUCE", "MIN", "1", "@n2", "as", "Z"), true),
    (Seq("apply"), false),
    (Seq("apply", "x"), false),
    (Seq("apply", "@n1"), false),
    (Seq("apply", "@n1", "xx"), false),
    (Seq("APPLY", "@n1", "as", "freddy"), true))

  test("TestStages table: every vector's accept/reject verdict") {
    stages.zipWithIndex.foreach { case ((tokens, ok), i) =>
      if (ok) run(tokens) // must not throw
      else {
        val e = intercept[Exception](run(tokens))
        assert(e != null, s"vector #$i '${tokens.mkString(" ")}' was accepted")
      }
    }
  }

  test("empty APPLY/FILTER expressions are rejected (parser_test.cc:284)") {
    for (bad <- Seq(Seq("FILTER", ""), Seq("FILTER", " "),
        Seq("APPLY", "", "AS", "r"), Seq("APPLY", " ", "AS", "r"))) {
      intercept[Exception](run(bad))
    }
  }
}
