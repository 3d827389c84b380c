package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Expected column types per testdata table. The driver regenerates
    * `/root/testdata` between rounds and has already changed an encoding
    * once (events.ts TIMESTAMP(NANOS) → timestamp[us]); this check turns
    * the resulting 52 opaque per-gate failures into ONE error naming the
    * table/column/got-vs-expected. */
  private val expectedColumns: Seq[(String, String, DataType => Boolean, String)] = {
    def numeric(t: DataType) = t.isInstanceOf[NumericType]
    def str(t: DataType) = t == StringType
    def timeLike(t: DataType) = t match {
      case LongType | TimestampType | TimestampNTZType | DateType => true
      case _: NumericType => true
      case _ => false
    }
    def floatVec(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    Seq(
      ("lineitem", "l_orderkey", numeric _, "numeric"),
      ("lineitem", "l_linenumber", numeric _, "numeric"),
      ("lineitem", "l_quantity", numeric _, "numeric"),
      ("lineitem", "l_extendedprice", numeric _, "numeric"),
      ("lineitem", "l_discount", numeric _, "numeric"),
      ("lineitem", "l_tax", numeric _, "numeric"),
      ("lineitem", "l_returnflag", str _, "string"),
      ("lineitem", "l_linestatus", str _, "string"),
      ("orders", "o_orderkey", numeric _, "numeric"),
      ("orders", "o_custkey", numeric _, "numeric"),
      ("orders", "o_totalprice", numeric _, "numeric"),
      ("orders", "o_orderstatus", str _, "string"),
      ("orders", "o_orderpriority", str _, "string"),
      ("customer", "c_custkey", numeric _, "numeric"),
      ("customer", "c_acctbal", numeric _, "numeric"),
      ("customer", "c_mktsegment", str _, "string"),
      ("part", "p_partkey", numeric _, "numeric"),
      ("part", "p_size", numeric _, "numeric"),
      ("part", "p_retailprice", numeric _, "numeric"),
      ("part", "p_brand", str _, "string"),
      ("part", "p_name", str _, "string"),
      ("documents", "doc_id", numeric _, "numeric"),
      ("documents", "n_chars", numeric _, "numeric"),
      ("documents", "lang", str _, "string"),
      ("documents", "source", str _, "string"),
      ("documents", "text", str _, "string"),
      ("events", "event_id", numeric _, "numeric"),
      ("events", "ts", timeLike _, "timestamp/long/numeric"),
      ("events", "user_id", numeric _, "numeric"),
      ("events", "event_type", str _, "string"),
      ("events", "value", numeric _, "numeric"),
      ("events", "props", str _, "string"),
      ("embeddings", "vec_id", numeric _, "numeric"),
      ("embeddings", "label", numeric _, "numeric"),
      ("embeddings", "embedding", floatVec _, "array<float|double>"))
  }

  /** Load every table's parquet footer and validate the columns the
    * fixtures depend on. Throws ONE IllegalStateException listing every
    * drifted column, or returns silently. Footer-only — no data scan.
    * The per-table schema reads are independent driver-side footer
    * jobs, so they run CONCURRENTLY (guide §2.6 overlap-independent-
    * jobs): serial, each ~50 ms of listing+footer latency dominated
    * the check's wall time. */
  def preflight(spark: SparkSession, dir: String): Unit = {
    val byTable = expectedColumns.groupBy(_._1)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val errs = Await.result(
      Future.sequence(byTable.toSeq.sortBy(_._1).map { case (tbl, checks) =>
        Future((tbl, checks, scala.util.Try(table(spark, dir, tbl).schema)))
      }), Duration.Inf).flatMap { case (tbl, checks, tried) =>
      tried match {
        case scala.util.Failure(e) =>
          Seq(s"$tbl: unreadable (${e.getMessage.linesIterator.next()})")
        case scala.util.Success(schema) =>
          checks.flatMap { case (_, colName, ok, want) =>
            schema.fields.find(_.name == colName) match {
              case None => Some(s"$tbl.$colName: MISSING (want $want)")
              case Some(f) if !ok(f.dataType) =>
                Some(s"$tbl.$colName: got ${f.dataType.simpleString}, want $want")
              case _ => None
            }
          }
      }
    }
    if (errs.nonEmpty) throw new IllegalStateException(
      s"testdata schema drift under $dir — ${errs.size} column(s): " +
        errs.mkString("; "))
  }

  /** Unix seconds from whatever encoding the driver wrote `ts` in this
    * round. Type-driven — the round-7 post-mortem: the testdata regen
    * switched TIMESTAMP(NANOS) → timestamp[us] (Spark: TIMESTAMP_NTZ)
    * and a cast-to-double-only path zeroed all 52 engine gates. */
  private[graft] def tsSeconds(dt: DataType): org.apache.spark.sql.Column = dt match {
    // TIMESTAMP(NANOS) read as long under the legacy flag
    case LongType => col("ts").cast("double") / 1e9
    // timestamp[us] w/o TZ: wall-clock → instant via session TZ (pinned
    // UTC in build.sbt/Verify/Bench), then seconds since epoch
    case TimestampNTZType => col("ts").cast(TimestampType).cast("double")
    case TimestampType => col("ts").cast("double")
    case DateType => col("ts").cast(TimestampType).cast("double")
    case _: NumericType => col("ts").cast("double")
    case other => throw new IllegalStateException(
      s"events.ts: unsupported type ${other.simpleString}")
  }

  /** Build an engine with every index registered over `dir`'s tables. */
  def engine(spark: SparkSession, dir: String): SearchEngine = {
    preflight(spark, dir)
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
    // Fallback for a TIMESTAMP(NANOS)-encoded ts (rounds 1-6's testdata):
    // Spark 4 only reads it as a long (nanos) under this legacy flag.
    // Harmless for the current timestamp[us] encoding.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val eventsRaw = table(spark, dir, "events")
    e.createIndex(eventsSchema, Documents.enrich(
      eventsRaw.withColumn("ts_sec", tsSeconds(eventsRaw.schema("ts").dataType)),
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
