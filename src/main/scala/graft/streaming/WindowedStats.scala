package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-time windowed aggregation over a document/event stream — the
 * Structured-Streaming layer the reference has no analogue for
 * (SURVEY §2.10 lists streaming windows as absent; the builder brief
 * asks for them as a first-class Spark-native capability).
 *
 * Shape: `readStream` → `withWatermark` → window/session groupBy with
 * the same reducer semantics as the batch FT.AGGREGATE GROUPBY
 * (empty→0 SUM/AVG, sample STDDEV) → append-mode sink. State is
 * bounded by the watermark; at scale the shuffle is on
 * (window, key) — the streaming twin of the batch GROUPBY plan.
 */
object WindowedStats {

  /**
   * Tumbling (or sliding, when `slide` is set) event-time window stats.
   *
   * @param events    streaming (or batch — same plan) DataFrame
   * @param tsCol     event-time timestamp column
   * @param keyCols   grouping keys besides the window
   * @param valueCol  numeric column to aggregate
   * @param window    window length, e.g. "1 hour"
   * @param watermark max lateness, e.g. "10 minutes"
   */
  def tumbling(events: DataFrame, tsCol: String, keyCols: Seq[String],
               valueCol: String, window: String, watermark: String,
               slide: Option[String] = None): DataFrame = {
    val w = slide match {
      case Some(s) => org.apache.spark.sql.functions.window(col(tsCol), window, s)
      case None => org.apache.spark.sql.functions.window(col(tsCol), window)
    }
    val keys: Seq[Column] = w.as("win") +: keyCols.map(col)
    events
      .withWatermark(tsCol, watermark)
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).cast("double").as("n"),
        coalesce(sum(col(valueCol)), lit(0.0)).as("sum_value"),
        coalesce(avg(col(valueCol)), lit(0.0)).as("avg_value"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))
      .select(
        (col("win.start").as("window_start") +:
          col("win.end").as("window_end") +:
          keyCols.map(col)) ++
          Seq(col("n"), col("sum_value"), col("avg_value"),
            col("min_value"), col("max_value")): _*)
  }

  /** Session windows (gap-based), same aggregate surface. */
  def sessions(events: DataFrame, tsCol: String, keyCols: Seq[String],
               valueCol: String, gap: String, watermark: String): DataFrame = {
    val keys: Seq[Column] = session_window(col(tsCol), gap).as("win") +: keyCols.map(col)
    events
      .withWatermark(tsCol, watermark)
      .groupBy(keys: _*)
      .agg(count(lit(1)).cast("double").as("n"),
        coalesce(sum(col(valueCol)), lit(0.0)).as("sum_value"))
      .select(
        (col("win.start").as("window_start") +:
          col("win.end").as("window_end") +:
          keyCols.map(col)) ++ Seq(col("n"), col("sum_value")): _*)
  }
}
