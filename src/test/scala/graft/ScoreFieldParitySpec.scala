package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Commands, SearchEngine}

/**
 * Replays the reference's per-document score ingestion
 * (index_schema_test.cc:2676-2800 IndexSchemaScoreFieldTest): with
 * `SCORE 0.5 SCORE_FIELD priority`, a document carrying priority=0.8
 * scores 0.8; a document without the field — or with a non-numeric
 * value — falls back to the index default. The score field is a raw
 * document attribute, not necessarily an indexed one.
 */
class ScoreFieldParitySpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark

  test("SCORE_FIELD value ingested per doc; default on missing/invalid") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      ("d1", "Widget", Some("0.8")),
      ("d2", "Gadget", None),
      ("d3", "Gizmo", Some("not_a_number")))
      .toDF("pk", "name", "priority")
    val engine = new SearchEngine
    val cmds = new Commands(engine, _ => (docs, col("pk")))
    cmds.execute(Seq("FT.CREATE", "score_idx", "SCORE", "0.5",
      "SCORE_FIELD", "priority", "SCHEMA", "name", "TEXT"))
    val scores = engine.documentScores("score_idx")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores == Map("d1" -> 0.8, "d2" -> 0.5, "d3" -> 0.5))
    // FT.INFO surfaces the index-level default + field name
    val info = cmds.execute(Seq("FT.INFO", "score_idx"))
      .asInstanceOf[org.apache.spark.sql.DataFrame].collect().head
    assert(info.getAs[Double]("score") == 0.5)
    assert(info.getAs[String]("score_field") == "priority")
  }

  test("no SCORE_FIELD: every document scores the default") {
    val sp = spark; import sp.implicits._
    val docs = Seq(("d1", "Widget")).toDF("pk", "name")
    val engine = new SearchEngine
    val cmds = new Commands(engine, _ => (docs, col("pk")))
    cmds.execute(Seq("FT.CREATE", "score_idx2", "SCHEMA", "name", "TEXT"))
    val scores = engine.documentScores("score_idx2")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores == Map("d1" -> 1.0))
  }
}
