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

  /** Streaming cube slice: the Slicer's filters + axes + measures applied
    * to a stream, grouped into tumbling windows with a watermark. The
    * same CubeDef/CubeQuery that drives batch slices drives the stream —
    * bacon's "cuttingboard over a refreshing dataset" with real
    * incremental state instead of a re-scan.
    */
  def streamingSlice(stream: DataFrame, cube: graft.cube.CubeDef,
                     q: graft.cube.CubeQuery, tsCol: String,
                     windowLen: String, watermark: String = "1 hour"): DataFrame = {
    val filtered = graft.cube.Slicer.filter(stream, cube, q).withWatermark(tsCol, watermark)
    val axisCols = window(col(tsCol), windowLen).as("window") +:
      q.axes.map(a => cube.label(a).named)
    val aggCols = q.values.map(v => cube.measure(v).compiled)
    filtered.groupBy(axisCols: _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("window_start", col("window.start"))
      .drop("window")
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
