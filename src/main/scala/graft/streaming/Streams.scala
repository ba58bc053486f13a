package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming re-expressions of the reference's "lazy dataset
  * that refreshes" model (bacon CuttingBoard over a callable dataset).
  * Every transform here works identically on a batch DataFrame and a
  * `readStream` DataFrame — the streaming cube is the same Slicer plan
  * plus a watermark.
  */
object Streams {

  /** Tumbling-window event counts/sums with a watermark for state expiry.
    * On a stream: append-mode windowed aggregation; on a batch frame the
    * same code yields the batch answer (used by the oracle check).
    */
  def tumblingAgg(events: DataFrame, tsCol: String, windowLen: String,
                  watermark: String = "1 hour", streaming: Boolean = false): DataFrame = {
    val src = if (streaming) events.withWatermark(tsCol, watermark) else events
    src.groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Session windows with gap timeout — batch/stream symmetric. */
  def sessionAgg(events: DataFrame, tsCol: String, gap: String,
                 watermark: String = "1 hour", streaming: Boolean = false): DataFrame = {
    val src = if (streaming) events.withWatermark(tsCol, watermark) else events
    src.groupBy(col("user_id"), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))
  }
}
