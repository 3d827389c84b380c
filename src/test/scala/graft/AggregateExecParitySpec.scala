package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.SearchEngine
import graft.model._
import graft.sources.Documents

/**
 * The reference's OWN aggregate-stage execution tests
 * (testing/ft_aggregate_exec_test.cc:103-271), replayed through the
 * public aggregate surface over the same fixture: record i of m has
 * n1 = i, n2 = m (constant — the fixture maps @n2 to the record's
 * second slot, so every n2 sort is an all-ties sort and every n2
 * group is one group). Stage strings are the reference's, verbatim,
 * lowercase included.
 *
 * Order-assertion policy mirrors the reference's: vectors it marks
 * `ordered == false` depend on its STABLE deque sort for their
 * expected order; a distributed sort has no stable tie order, so for
 * those we assert the row set / size exactly as the reference skips
 * content asserts for its unordered MAX cases.
 */
class AggregateExecParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private val engines =
    scala.collection.mutable.Map.empty[Int, SearchEngine]
  private def eng(m: Int): SearchEngine = engines.getOrElseUpdate(m, {
    val sp = spark; import sp.implicits._
    val df = (0 until m).map(i => (s"k$i", i.toDouble, m.toDouble))
      .toDF("k", "n1", "n2").coalesce(1) // record order = insertion order
    val schema = IndexSchema(s"recs$m", Seq(
      FieldDef("n1", NumericField), FieldDef("n2", NumericField)))
    val e = new SearchEngine
    e.createIndex(schema, Documents.enrich(df, schema, keyExpr = Some(col("k"))))
    e
  })

  private def run(m: Int, stages: String) =
    eng(m).aggregate(s"recs$m", "*", stages.trim.split("\\s+").toSeq)

  test("FilterTest: FILTER @n1==1 keeps exactly record 1 (exec_test.cc:120)") {
    val rows = run(4, "FILTER @n1==1 LOAD 1 @n1").collect()
    assert(rows.length == 1 && rows.head.getAs[Double]("n1") == 1.0)
  }

  test("ApplyTest: APPLY @n1+1 as fred (exec_test.cc:136)") {
    val rows = run(2, "LOAD 1 @n1 APPLY @n1+1 as fred SORTBY 1 @n1").collect()
    assert(rows.map(r => (r.getAs[Double]("n1"), r.getAs[Double]("fred")))
      .toSeq == Seq((0.0, 1.0), (1.0, 2.0)))
  }

  test("LimitTest: LIMIT 1 2 on 4 records keeps two (exec_test.cc:103)") {
    // the reference's content assert rides on deque order; a DataFrame
    // carries no row order, so pair LIMIT with the explicit sort the
    // production surface requires and assert the offset window
    val rows = run(4, "LOAD 1 @n1 SORTBY 1 @n1 LIMIT 1 2").collect()
    assert(rows.map(_.getAs[Double]("n1")).toSeq == Seq(1.0, 2.0))
  }

  test("SortTest: all 12 vectors, MAX off and on (exec_test.cc:159)") {
    // (stages, expected n1 order | None when tie-order-dependent,
    //  expected MAX-2 n1 order | None)
    val vectors: Seq[(String, Option[Seq[Double]], Option[Seq[Double]])] = Seq(
      ("Sortby 2 @n1 desc", Some(Seq(1.0, 0.0)), Some(Seq(9.0, 8.0))),
      ("sortby 2 @n1 asc", Some(Seq(0.0, 1.0)), Some(Seq(0.0, 1.0))),
      ("sortby 2 @n2 asc", None, None),
      ("sortby 2 @n2 desc", None, None),
      ("sortby 4 @n1 desc @n2 asc", Some(Seq(1.0, 0.0)), Some(Seq(9.0, 8.0))),
      ("sortby 4 @n1 asc @n2 asc", Some(Seq(0.0, 1.0)), Some(Seq(0.0, 1.0))),
      ("sortby 4 @n1 desc @n2 desc", Some(Seq(1.0, 0.0)), Some(Seq(9.0, 8.0))),
      ("sortby 4 @n1 asc @n2 desc", Some(Seq(0.0, 1.0)), Some(Seq(0.0, 1.0))),
      // n2 leads (all ties) so n1 decides — fully determined again
      ("sortby 4 @n2 asc @n1 asc", Some(Seq(0.0, 1.0)), Some(Seq(0.0, 1.0))),
      ("sortby 4 @n2 asc @n1 desc", Some(Seq(1.0, 0.0)), Some(Seq(9.0, 8.0))),
      ("sortby 4 @n2 desc @n1 asc", Some(Seq(0.0, 1.0)), Some(Seq(0.0, 1.0))),
      ("sortby 4 @n2 desc @n1 desc", Some(Seq(1.0, 0.0)), Some(Seq(9.0, 8.0))))
    vectors.foreach { case (stages, plain, maxed) =>
      val rows = run(2, s"LOAD 1 @n1 $stages").collect()
        .map(_.getAs[Double]("n1")).toSeq
      plain match {
        case Some(want) => assert(rows == want, s"'$stages'")
        case None => assert(rows.sorted == Seq(0.0, 1.0), s"'$stages' set")
      }
      val rowsMax = run(10, s"LOAD 1 @n1 $stages MAX 2").collect()
        .map(_.getAs[Double]("n1")).toSeq
      maxed match {
        case Some(want) => assert(rowsMax == want, s"'$stages MAX 2'")
        case None => assert(rowsMax.length == 2, s"'$stages MAX 2' size")
      }
    }
  }

  test("GroupTest: group cardinalities (exec_test.cc:213)") {
    assert(run(2, "groupby 1 @n1 REDUCE COUNT 0 AS n").collect().length == 2)
    assert(run(2, "groupby 2 @n1 @n2 REDUCE COUNT 0 AS n").collect().length == 2)
    assert(run(2, "groupby 1 @n2 REDUCE COUNT 0 AS n").collect().length == 1)
  }

  test("ReducerTest: all eight vectors on MakeData(4) (exec_test.cc:240)") {
    val vectors: Seq[(String, Seq[Double])] = Seq(
      ("groupby 1 @n2 reduce count 0 AS r0", Seq(4.0)),
      ("groupby 1 @n2 reduce min 1 @n1 AS r0", Seq(0.0)),
      ("groupby 1 @n2 reduce min 1 @n1 AS r0 reduce count 0 AS r1", Seq(0.0, 4.0)),
      ("groupby 1 @n2 reduce max 1 @n1 AS r0", Seq(3.0)),
      ("groupby 1 @n2 reduce sum 1 @n1 AS r0", Seq(6.0)),
      ("groupby 1 @n2 reduce stddev 1 @n1 AS r0", Seq(1.2909944487358056)),
      ("groupby 1 @n2 reduce count_distinct 1 @n1 AS r0", Seq(4.0)),
      ("groupby 1 @n2 reduce avg 1 @n1 AS r0", Seq(1.5)))
    vectors.foreach { case (stages, want) =>
      val rows = run(4, stages).collect()
      assert(rows.length == 1, s"'$stages' groups")
      want.zipWithIndex.foreach { case (v, i) =>
        assert(math.abs(rows.head.getAs[Double](s"r$i") - v) < 0.001,
          s"'$stages' r$i")
      }
    }
  }
}
