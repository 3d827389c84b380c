package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.SearchEngine
import graft.model._
import graft.sources.Documents

/**
 * Index declarations over the driver's testdata (TESTDATA.md /
 * FIXTURES.md §B): each table becomes a registered index the way
 * `FT.CREATE ... SCHEMA ...` declares one in the reference.
 */
object Fixtures {

  val lineitemSchema: IndexSchema = IndexSchema("lineitem", Seq(
    FieldDef("l_quantity", NumericField),
    FieldDef("l_extendedprice", NumericField),
    FieldDef("l_discount", NumericField),
    FieldDef("l_tax", NumericField),
    FieldDef("l_orderkey", NumericField),
    FieldDef("l_returnflag", TagField()),
    FieldDef("l_linestatus", TagField())))

  val ordersSchema: IndexSchema = IndexSchema("orders", Seq(
    FieldDef("o_totalprice", NumericField),
    FieldDef("o_custkey", NumericField),
    FieldDef("o_orderstatus", TagField()),
    FieldDef("o_orderpriority", TagField())))

  val customerSchema: IndexSchema = IndexSchema("customer", Seq(
    FieldDef("c_acctbal", NumericField),
    FieldDef("c_mktsegment", TagField())))

  val partSchema: IndexSchema = IndexSchema("part", Seq(
    FieldDef("p_size", NumericField),
    FieldDef("p_retailprice", NumericField),
    FieldDef("p_brand", TagField()),
    FieldDef("p_name", TextField(withSuffixTrie = true))))

  val documentsSchema: IndexSchema = IndexSchema("documents", Seq(
    FieldDef("n_chars", NumericField),
    FieldDef("doc_id", NumericField),
    FieldDef("lang", TagField()),
    FieldDef("source", TagField()),
    FieldDef("text", TextField(withSuffixTrie = true))))

  /** Timestamps surface as numeric unix seconds — the reference has no
    * timestamp type; time fns take doubles (search-expressions.md). */
  val eventsSchema: IndexSchema = IndexSchema("events", Seq(
    FieldDef("ts_sec", NumericField),
    FieldDef("value", NumericField),
    FieldDef("user_id", NumericField),
    FieldDef("event_type", TagField()),
    // S4 JSON reader: `$.k` scalar out of the JSON `props` column
    FieldDef("props:$.k", "prop_k", NumericField)))

  val embeddingsL2Schema: IndexSchema = IndexSchema("embeddings_l2", Seq(
    FieldDef("label", NumericField),
    FieldDef("embedding", "vec", VectorField(dim = 64, metric = DistanceMetric.L2))))

  // normalizeAtIngest=false keeps raw vectors so the DuckDB oracle
  // (list_cosine_similarity over the same floats) is numerically
  // comparable; the normalized-ingest path is covered by unit tests.
  val embeddingsCosSchema: IndexSchema = IndexSchema("embeddings_cos", Seq(
    FieldDef("label", NumericField),
    FieldDef("embedding", "vec", VectorField(dim = 64, metric = DistanceMetric.Cosine,
      normalizeAtIngest = false))))

  val embeddingsIpSchema: IndexSchema = IndexSchema("embeddings_ip", Seq(
    FieldDef("label", NumericField),
    FieldDef("embedding", "vec", VectorField(dim = 64, metric = DistanceMetric.IP))))

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Build an engine with every index registered over `dir`'s tables. */
  def engine(spark: SparkSession, dir: String): SearchEngine = {
    val e = new SearchEngine
    // NOT resident: a cached fact table loses parquet filter pushdown
    // (InMemoryRelation has no row-group pruning) and benched slower
    // than scanning — the scan+pushdown path wins for filter-heavy use.
    e.createIndex(lineitemSchema, Documents.enrich(
      table(spark, dir, "lineitem"), lineitemSchema,
      keyExpr = Some(concat_ws("-", col("l_orderkey"), col("l_linenumber")))))
    e.createIndex(ordersSchema, Documents.enrich(
      table(spark, dir, "orders"), ordersSchema,
      keyExpr = Some(col("o_orderkey"))))
    e.createIndex(customerSchema, Documents.enrich(
      table(spark, dir, "customer"), customerSchema,
      keyExpr = Some(col("c_custkey"))))
    e.createIndex(partSchema, Documents.enrich(
      table(spark, dir, "part"), partSchema,
      keyExpr = Some(col("p_partkey"))))
    // resident: text queries reuse the tokenized columns instead of
    // re-running the analyzer per query (the index-in-memory stance).
    e.createIndex(documentsSchema, Documents.enrich(
      table(spark, dir, "documents"), documentsSchema,
      keyExpr = Some(col("doc_id"))), resident = true)
    // events.ts is TIMESTAMP(NANOS) parquet — Spark 4 only reads it as
    // a long (nanos) under this legacy flag; seconds = nanos / 1e9.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val eventsRaw = table(spark, dir, "events")
    val tsSec =
      if (eventsRaw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        col("ts").cast("double") / 1e9
      else col("ts").cast("double")
    e.createIndex(eventsSchema, Documents.enrich(
      eventsRaw.withColumn("ts_sec", tsSec),
      eventsSchema,
      keyExpr = Some(col("event_id"))))
    val emb = table(spark, dir, "embeddings")
    e.createIndex(embeddingsL2Schema, Documents.enrich(
      emb, embeddingsL2Schema, keyExpr = Some(col("vec_id"))))
    e.createIndex(embeddingsCosSchema, Documents.enrich(
      emb, embeddingsCosSchema, keyExpr = Some(col("vec_id"))))
    e.createIndex(embeddingsIpSchema, Documents.enrich(
      emb, embeddingsIpSchema, keyExpr = Some(col("vec_id"))))
    e
  }
}
