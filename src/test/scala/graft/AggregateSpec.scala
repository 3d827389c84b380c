package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.engine.{SearchEngine, SearchOptions}
import graft.model._
import graft.sources.Documents

/** FT.AGGREGATE semantics vs the reference (ft_aggregate_exec.cc,
  * expr/value.cc). */
class AggregateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var engine: SearchEngine = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("aggregate-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val schema = IndexSchema("t", Seq(
      FieldDef("price", NumericField),
      FieldDef("qty", NumericField),
      FieldDef("color", TagField()),
      FieldDef("name", TextField())))
    val sp = spark; import sp.implicits._
    val df = Seq(
      ("k1", Some(10.0), Some(2.0), "red", "alpha beta"),
      ("k2", Some(20.0), Some(3.0), "blue", "gamma"),
      ("k3", Some(30.0), None, "red", "delta"),
      ("k4", None, Some(5.0), "blue", "epsilon"),
      ("k5", Some(50.0), Some(1.0), "red", "zeta"))
      .toDF("k", "price", "qty", "color", "name")
    engine = new SearchEngine
    engine.createIndex(schema, Documents.enrich(df, schema, keyExpr = Some(col("k"))))
  }

  // NOTE: never stop() here - getOrCreate shares ONE SparkContext
  // across all suites in the JVM; stopping it kills whichever suite
  // runs next (the forked test JVM cleans up on exit).
  override def afterAll(): Unit = ()

  // every test reads __key: since r13 the record carries it only when
  // LOADed (reference load_key semantics), so the helper loads it first
  private def agg(q: String, tokens: String*): DataFrame =
    engine.aggregate("t", q, Seq("LOAD", "1", "@__key") ++ tokens)

  test("APPLY arithmetic with Nil propagation (value.cc:321-349)") {
    val rows = agg("*", "LOAD", "1", "@price",
      "APPLY", "@price * 2 + 1", "AS", "x",
      "SORTBY", "2", "@__key", "ASC")
      .collect().map(r => (r.getString(0), Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(rows.toSeq == Seq(
      ("k1", Some(21.0)), ("k2", Some(41.0)), ("k3", Some(61.0)),
      ("k4", None), ("k5", Some(101.0))))
  }

  test("division by zero yields NaN, not NULL (value.cc:351-362)") {
    val r = agg("*", "APPLY", "1 / (@price - @price)", "AS", "x",
      "FILTER", "exists(@price)", "LIMIT", "0", "1").collect()
    assert(r.head.getDouble(1).isNaN)
  }

  test("FILTER IsTrue drops Nil and zero (ft_aggregate_exec.cc:112-128)") {
    val rows = agg("*", "FILTER", "@qty - 1", "SORTBY", "1", "@__key")
      .collect().map(_.getString(0))
    // qty: k1→2 (1 truthy), k2→3, k3→Nil (dropped), k4→5, k5→1 (0 dropped)
    assert(rows.toSeq == Seq("k1", "k2", "k4"))
  }

  test("string fns use byte/ASCII semantics on multibyte input (value.cc:534-622)") {
    val sp = spark; import sp.implicits._
    val schema = IndexSchema("uni", Seq(FieldDef("s", TagField(separator = "|"))))
    val e2 = new SearchEngine
    e2.createIndex(schema, Documents.enrich(
      Seq(("k1", "éclair")).toDF("k", "s"), schema, keyExpr = Some(col("k"))))
    val r = e2.aggregate("uni", "*", Seq("LOAD", "1", "@s",
      "APPLY", "upper(@s)", "AS", "u",      // ASCII-only: é untouched
      "APPLY", "strlen(@s)", "AS", "n",     // bytes: é is 2
      "APPLY", "substr(@s, 0, 3)", "AS", "sub")) // bytes: é(2) + c
      .collect().head
    assert(r.getAs[String]("u") == "éCLAIR")
    assert(r.getAs[Double]("n") == 7.0)
    assert(r.getAs[String]("sub") == "éc")
  }

  test("one-Nil comparison is UNORDERED: == true, != false (value.h:135-143)") {
    val rows = agg("*",
      "APPLY", "@qty == 99", "AS", "eq",
      "APPLY", "@qty != 99", "AS", "ne",
      "SORTBY", "1", "@__key")
      .select("__key", "eq", "ne").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val k3 = rows.find(_._1 == "k3").get
    assert(k3._2 == 1.0 && k3._3 == 0.0) // Nil vs 99 → unordered
    val k1 = rows.find(_._1 == "k1").get
    assert(k1._2 == 0.0 && k1._3 == 1.0) // 2 vs 99 → ordered, unequal
  }

  test("string functions: contains counts occurrences, substr, concat") {
    val rows = agg("*",
      "APPLY", "contains(@name, 'a')", "AS", "cnt",
      "APPLY", "substr(@name, 0, 3)", "AS", "pre",
      "APPLY", "concat(@color, '-', @name)", "AS", "cc",
      "SORTBY", "1", "@__key", "LIMIT", "0", "1").collect()
    val r = rows.head
    assert(r.getAs[Double]("cnt") == 3.0) // "alpha beta" has 3 a's
    assert(r.getAs[String]("pre") == "alp")
    assert(r.getAs[String]("cc") == "red-alpha beta")
  }

  test("GROUPBY reducers incl. empty-set semantics (§2.5)") {
    val rows = agg("*",
      "GROUPBY", "1", "@color",
      "REDUCE", "COUNT", "0", "AS", "n",
      "REDUCE", "SUM", "1", "@qty", "AS", "s",
      "REDUCE", "AVG", "1", "@qty", "AS", "a",
      "REDUCE", "MIN", "1", "@price", "AS", "mn",
      "REDUCE", "MAX", "1", "@price", "AS", "mx",
      "REDUCE", "COUNT_DISTINCT", "1", "@color", "AS", "cd",
      "REDUCE", "STDDEV", "1", "@price", "AS", "sd",
      "SORTBY", "1", "@color")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val blue = rows.find(_._1 == "blue").get
    assert(blue._2 == 2.0 && blue._3 == 8.0 && blue._4 == 4.0)
    val red = rows.find(_._1 == "red").get
    assert(red._2 == 3.0 && red._3 == 3.0) // qty: 2 + Nil + 1
    assert(red._4 == 1.5) // AVG skips Nil: (2+1)/2
  }

  test("STDDEV of single value is 0, not NULL (ft_aggregate_exec.cc:309-327)") {
    val rows = agg("@color:{blue}",
      "FILTER", "exists(@price)",
      "GROUPBY", "1", "@color", "REDUCE", "STDDEV", "1", "@price", "AS", "sd")
      .collect()
    assert(rows.head.getDouble(1) == 0.0)
  }

  test("SORTBY MAX is a bounded top-k (ft_aggregate_exec.cc:156-172)") {
    val rows = agg("*", "LOAD", "1", "@price",
      "SORTBY", "2", "@price", "DESC", "MAX", "2")
      .collect().map(_.getString(0))
    assert(rows.toSeq == Seq("k5", "k3"))
  }

  test("LIMIT offset count (ft_aggregate_exec.cc:80-93)") {
    val rows = agg("*", "SORTBY", "1", "@__key", "LIMIT", "1", "2")
      .collect().map(_.getString(0))
    assert(rows.toSeq == Seq("k2", "k3"))
  }

  test("APPLY overwrite keeps cardinality and order of fields") {
    val df = agg("*", "LOAD", "1", "@price",
      "APPLY", "@price + 1", "AS", "price",
      "SORTBY", "1", "@__key", "LIMIT", "0", "2")
    assert(df.columns.toSeq == Seq("__key", "price"))
    assert(df.collect().map(_.getDouble(1)).toSeq == Seq(11.0, 21.0))
  }

  test("logical ops surface as 0/1 and propagate Nil (value.cc:387-409)") {
    // Comparisons ALWAYS produce a bool — Nil operands make them
    // UNORDERED, never Nil (value.h:135-161). So `&&` over comparisons
    // is total: k3 has qty=Nil → (Nil > 0) is false, not Nil.
    val rows = agg("*",
      "APPLY", "(@price > 15) && (@qty > 0)", "AS", "both",
      "SORTBY", "1", "@__key")
      .select("__key", "both").collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
    assert(rows.toMap == Map(
      "k1" -> Some(0.0), "k2" -> Some(1.0),
      "k3" -> Some(0.0), "k4" -> Some(0.0), "k5" -> Some(1.0)))
    // A genuinely-Nil operand DOES propagate through && (FuncLand):
    val nilProp = agg("*", "APPLY", "@qty && 1", "AS", "x",
      "SORTBY", "1", "@__key")
      .select("__key", "x").collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
    assert(nilProp.toMap.apply("k3") == None) // qty Nil → Nil && 1 → Nil
    assert(nilProp.toMap.apply("k5") == Some(1.0))
  }

  test("time functions: 0-based dow/monthofyear components, day/hour/minute/month ROUND (value.cc:669-830)") {
    // 2021-03-14 15:09:26 UTC, a Sunday = 1615734566
    val rows = agg("*", "LIMIT", "0", "1",
      "APPLY", "dayofweek(1615734566)", "AS", "dow",
      "APPLY", "monthofyear(1615734566)", "AS", "moy",
      "APPLY", "month(1615734566)", "AS", "mon",
      "APPLY", "year(1615734566)", "AS", "yr",
      "APPLY", "hour(1615734566)", "AS", "hr",
      "APPLY", "day(1615734566)", "AS", "dy",
      "APPLY", "timefmt(1615734566)", "AS", "iso").collect()
    val r = rows.head
    assert(r.getAs[Double]("dow") == 0.0) // Sunday
    assert(r.getAs[Double]("moy") == 2.0) // March, 0-based component
    // month/hour/day ROUND the timestamp (value.cc FuncMonth:766-797,
    // RoundToPeriod:800-815 — the doc table's "extract" wording is
    // stale; the golden expr corpus pins the rounding)
    assert(r.getAs[Double]("mon") == 1614556800.0) // 2021-03-01T00:00:00Z
    assert(r.getAs[Double]("yr") == 2021.0)
    assert(r.getAs[Double]("hr") == 1615734000.0) // 15:00:00 that day
    assert(r.getAs[Double]("dy") == 1615680000.0) // 00:00:00 that day
    assert(r.getAs[String]("iso") == "2021-03-14T15:09:26Z")
    // round-trip
    val rt = agg("*", "LIMIT", "0", "1",
      "APPLY", "parsetime('2021-03-14T15:09:26Z')", "AS", "ts").collect()
    assert(rt.head.getAs[Double]("ts") == 1615734566.0)
  }

  test("APPLY and SORTBY can reference reducer outputs after GROUPBY") {
    val rows = agg("*",
      "GROUPBY", "1", "@color",
      "REDUCE", "SUM", "1", "@qty", "AS", "s",
      "REDUCE", "COUNT", "0", "AS", "n",
      "APPLY", "@s / @n", "AS", "mean",
      "FILTER", "@mean > 0",
      "SORTBY", "2", "@mean", "DESC")
      .collect().map(r => (r.getString(0), r.getDouble(3)))
    assert(rows.toSeq == Seq(("blue", 4.0), ("red", 1.0)))
    // referencing a non-grouped doc field after GROUPBY is an error
    intercept[Exception] {
      agg("*", "GROUPBY", "1", "@color", "REDUCE", "COUNT", "0", "AS", "n",
        "APPLY", "@price + 1", "AS", "bad").collect()
    }
  }

  test("string-to-number coercion failure yields Nil, not an ANSI error") {
    val rows = agg("*", "APPLY", "@name + 1", "AS", "x",
      "APPLY", "'12' + 3", "AS", "y",
      "SORTBY", "1", "@__key", "LIMIT", "0", "1").collect()
    assert(rows.head.isNullAt(1)) // "alpha beta" + 1 → Nil
    assert(rows.head.getDouble(2) == 15.0) // numeric string converts
  }

  test("time fns: NaN/negative/unconvertible timestamps yield Nil, no ANSI error") {
    val rows = agg("*", "LIMIT", "0", "1",
      "APPLY", "hour(0 - 100)", "AS", "neg",
      "APPLY", "hour(1 / 0)", "AS", "nan",
      "APPLY", "timefmt(0 - 5)", "AS", "fneg",
      "APPLY", "year(@name)", "AS", "bad").collect()
    val r = rows.head
    assert(r.isNullAt(r.fieldIndex("neg"))) // negative ts → Nil (1.2.1)
    assert(r.isNullAt(r.fieldIndex("nan"))) // NaN ts → Nil
    // timefmt formats PRE-EPOCH timestamps (value.cc FuncTimefmt:704-705
    // — "unlike the component extractors"; golden expr corpus pins it)
    assert(r.getAs[String]("fneg") == "1969-12-31T23:59:55Z")
    assert(r.isNullAt(r.fieldIndex("bad"))) // text field unconvertible
  }

  test("hybrid: KNN front-end feeds the pipeline with score pseudo-field") {
    val schema = IndexSchema("vecs", Seq(
      FieldDef("label", NumericField),
      FieldDef("v", VectorField(dim = 2, metric = DistanceMetric.L2))))
    val sp = spark; import sp.implicits._
    val df = Seq(
      ("a", 1.0, Array(0.0f, 0.0f)), ("b", 1.0, Array(1.0f, 0.0f)),
      ("c", 2.0, Array(3.0f, 4.0f))).toDF("k", "label", "v")
    engine.createIndex(schema, Documents.enrich(df, schema, keyExpr = Some(col("k"))))
    val rows = engine.aggregate("vecs", "*=>[KNN 2 @v $q AS d]",
      Seq("LOAD", "1", "@__key", "APPLY", "@d * 10", "AS", "d10",
        "SORTBY", "1", "@d"),
      SearchOptions(params = Map("q" -> graft.query.VectorParam(Array(0.0f, 0.0f)))))
      .collect().map(r => (r.getAs[String]("__key"), r.getAs[Double]("d10")))
    assert(rows.toSeq == Seq(("a", 0.0), ("b", 10.0)))
  }
}
