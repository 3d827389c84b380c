package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Kafka-source projection into the [[Ingest]] change-feed contract
 * (SURVEY §2.1 S1; reference keyspace-notification ingest,
 * src/index_schema.cc:560-599). The offline sandbox cannot run
 * `.format("kafka")` itself (no Kafka jars, zero egress), so this
 * module pins everything AROUND that one format string: the exact
 * wire schema Spark's Kafka source emits, and the semantics mapping
 * it onto op/__key/__seq.
 *
 * Mapping, following Kafka's own log-compaction conventions:
 *  - `__key`  ← record key (UTF-8). Keyed topics are the unit of
 *    identity, exactly like the reference's keyspace.
 *  - tombstone: a NULL record value means DELETE (the convention
 *    compacted topics use; mirrors keyspace DEL/expire notifications).
 *    A non-null value may also carry an explicit `"op":"delete"`.
 *  - `__seq` ← record offset. Kafka guarantees order per partition,
 *    and a keyed producer routes a key to a stable partition, so the
 *    offset is monotonic PER KEY — precisely the contract
 *    [[Ingest.mergeBatch]]'s last-write-wins needs. (Cross-partition
 *    offsets are incomparable, but no key spans partitions on a keyed
 *    topic.)
 *  - document columns ← record value parsed as JSON against the doc
 *    schema (the S4 JSON-reader convention). Fields absent from the
 *    JSON surface as NULL — same as a HASH missing a declared field.
 *
 * Deployment delta from the tested path, in full:
 * {{{
 *   spark.readStream.format("kafka")
 *     .option("kafka.bootstrap.servers", …)
 *     .option("subscribe", topic)            // ONLY untested lines
 *     .load()                                //
 *     |> KafkaFeed.project(_, docSchema)     // tested (KafkaFeedSpec)
 *     |> Ingest.start(spark, _, …)           // tested (File/RateFeedSpec)
 * }}}
 */
object KafkaFeed {

  /** The schema Spark's Kafka source emits (spark-sql-kafka docs,
    * "Creating a Kafka Source for Streaming Queries") — pinned here so
    * a source change fails loudly in one place. */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Project a Kafka-source frame into the change-feed contract:
    * columns `op, __key, __seq` + the doc columns of `docSchema`
    * (minus `__key`, which comes from the record key). Works on both
    * streaming and batch frames — the projection is stateless. */
  def project(kafka: DataFrame, docSchema: StructType): DataFrame = {
    val missing = wireSchema.fieldNames.filterNot(kafka.columns.contains)
    require(missing.isEmpty,
      s"not a Kafka-source frame: missing column(s) ${missing.mkString(", ")}")
    val docFields = docSchema.fields.filter(_.name != "__key")
    // value JSON may carry an explicit op alongside the doc fields
    val valueSchema = StructType(
      StructField("op", StringType) +: docFields)
    val parsed = kafka.select(
      col("key").cast(StringType).as("__key"),
      col("offset").as("__seq"),
      col("value").isNull.as("__tombstone"),
      from_json(col("value").cast(StringType), valueSchema).as("__v"))
    val opCol: Column = when(col("__tombstone"), lit("delete"))
      .otherwise(coalesce(col("__v.op"), lit("upsert")))
    parsed.select(
      (Seq(opCol.as("op"), col("__key"), col("__seq")) ++
        docFields.map(f => col(s"__v.${f.name}").as(f.name))).toIndexedSeq: _*)
      .filter(col("__key").isNotNull) // un-keyed records carry no identity
  }
}
