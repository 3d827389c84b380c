package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 hardening (round-7 post-mortem): the driver regenerated
  * testdata with a drifted ts encoding and 52 gates failed with the same
  * opaque cast error. These pin (a) the preflight produces ONE explicit
  * error naming the drifted column, (b) the type-driven ts_sec dispatch,
  * (c) fixture caches are per-session, not per-dir. */
class FixturePreflightSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  test("preflight passes on the driver's current testdata") {
    Fixtures.preflight(spark, sf) // must not throw
  }

  test("a drifted column type yields one error naming table.column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-preflight").toString
    // clone the real tables, then corrupt exactly one column's type
    Seq("lineitem", "orders", "customer", "part", "documents", "embeddings")
      .foreach { t =>
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(s"$dir/$t.parquet"),
          java.nio.file.Paths.get(s"$sf/$t.parquet"))
      }
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", col("ts").cast("string")) // the drift under test
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Fixtures.preflight(spark, dir))
    assert(e.getMessage.contains("events.ts"), e.getMessage)
    assert(e.getMessage.contains("1 column(s)"), e.getMessage)
  }

  test("a missing table is reported by name, not as a stack of casts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-preflight2").toString
    Seq("lineitem", "orders", "customer", "part", "documents", "embeddings")
      .foreach { t =>
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(s"$dir/$t.parquet"),
          java.nio.file.Paths.get(s"$sf/$t.parquet"))
      }
    val e = intercept[IllegalStateException](Fixtures.preflight(spark, dir))
    assert(e.getMessage.contains("events"), e.getMessage)
  }

  test("tsSeconds dispatches by type: NTZ micros == long nanos == double") {
    import spark.implicits._
    val epochSec = 1704067200L // 2024-01-01T00:00:00Z
    val fromLong = Seq(epochSec * 1000000000L).toDF("ts")
      .select(Fixtures.tsSeconds(LongType).as("s")).head.getDouble(0)
    val fromNtz = Seq(java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)).toDF("ts")
      .select(Fixtures.tsSeconds(TimestampNTZType).as("s")).head.getDouble(0)
    val fromDouble = Seq(epochSec.toDouble).toDF("ts")
      .select(Fixtures.tsSeconds(DoubleType).as("s")).head.getDouble(0)
    assert(fromLong === epochSec.toDouble)
    assert(fromNtz === epochSec.toDouble) // session TZ pinned UTC
    assert(fromDouble === epochSec.toDouble)
  }

  test("fixture caches are keyed per session: newSession gets a fresh engine") {
    val s2 = spark.newSession()
    val e1 = Queries.eng(spark, sf)
    val e2 = Queries.eng(s2, sf)
    assert(e1 ne e2, "engines cache must not leak across sessions")
    // and the same session still memoizes
    assert(Queries.eng(spark, sf) eq e1)
  }
}
