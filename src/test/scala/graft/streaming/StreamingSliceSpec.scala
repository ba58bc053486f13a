package graft.streaming

import graft.SparkSpec
import graft.cube._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSliceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("the same CubeDef/CubeQuery slices a stream with windows + watermark") {
    implicit val sqlCtx = spark.sqlContext
    val cube = CubeDef(
      labels = Seq(Label("event_type")),
      measures = Seq(Measure("n", lit(1), Agg.Count), Measure("sum_v", col("value"), Agg.Sum)))
    val q = CubeQuery().addAxis("event_type").addValue("n").addValue("sum_v")
      .addFilter("event_type", "spam", FilterOp.Ne)

    val mem = MemoryStream[(Timestamp, String, Double)]
    val sdf = mem.toDF().toDF("ts", "event_type", "value")
    val out = Streams.streamingSlice(sdf, cube, q, "ts", "15 minutes")
      .writeStream.format("memory").queryName("s_slice").outputMode("complete").start()
    mem.addData(
      (ts("2024-01-01 10:01:00"), "click", 1.0),
      (ts("2024-01-01 10:05:00"), "click", 2.0),
      (ts("2024-01-01 10:05:30"), "spam", 99.0),
      (ts("2024-01-01 10:20:00"), "view", 3.0))
    out.processAllAvailable()
    val rows = spark.table("s_slice").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString, r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("sum_v"))).toMap
    out.stop()
    assert(rows(("2024-01-01 10:00:00.0", "click")) == (2L, 3.0))
    assert(rows(("2024-01-01 10:15:00.0", "view")) == (1L, 3.0))
    assert(!rows.keys.exists(_._2 == "spam")) // cube filter applied on the stream
  }

  test("hopping streamingSlice (q50's shape) equals the batch hopping answer") {
    implicit val sqlCtx = spark.sqlContext
    val cube = CubeDef(
      labels = Seq(Label("event_type")),
      measures = Seq(Measure("n", lit(1), Agg.Count), Measure("sum_v", col("value"), Agg.Sum)))
    val q = CubeQuery().addAxis("event_type").addValue("n").addValue("sum_v")
    val data = Seq(
      (ts("2024-01-01 10:01:00"), "click", 1.0),
      (ts("2024-01-01 10:05:00"), "click", 2.0),
      (ts("2024-01-01 10:20:00"), "view", 3.0),
      (ts("2024-01-01 11:05:00"), "click", 4.0))

    val mem = MemoryStream[(Timestamp, String, Double)]
    val sdf = mem.toDF().toDF("ts", "event_type", "value")
    val out = Streams.streamingSlice(sdf, cube, q, "ts",
        windowLen = "30 minutes", slide = Some("15 minutes"))
      .writeStream.format("memory").queryName("s_hop").outputMode("complete").start()
    mem.addData(data: _*)
    out.processAllAvailable()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Timestamp]("window_start").toString, r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("sum_v"))
    val streamed = spark.table("s_hop").collect().map(key).toMap
    out.stop()
    // the identical slice run on the same rows as a BATCH frame
    val batched = Streams.streamingSlice(
        data.toDF("ts", "event_type", "value"), cube, q, "ts",
        windowLen = "30 minutes", slide = Some("15 minutes"))
      .collect().map(key).toMap
    assert(streamed == batched)
    // overlap really happened: every event lands in 30/15 = 2 windows
    assert(streamed.values.map(_._1).sum == 2L * data.size)
  }
}
