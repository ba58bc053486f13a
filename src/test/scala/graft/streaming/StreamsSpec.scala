package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val batch = Seq(
    (ts("2024-01-01 10:01:00"), "click", 1L, 1.0),
    (ts("2024-01-01 10:05:00"), "click", 1L, 2.0),
    (ts("2024-01-01 10:20:00"), "view", 2L, 3.0),
    (ts("2024-01-01 11:05:00"), "click", 1L, 4.0),
  ).toDF("ts", "event_type", "user_id", "value")

  test("tumbling agg on batch") {
    val out = Streams.tumblingAgg(batch, "ts", "15 minutes").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("2024-01-01 10:00:00.0", "click")) == 2)
    assert(out(("2024-01-01 10:15:00.0", "view")) == 1)
    assert(out(("2024-01-01 11:00:00.0", "click")) == 1)
  }

  test("streaming tumbling agg equals the batch answer") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val sdf = mem.toDF().toDF("ts", "event_type", "user_id", "value")
    val q = Streams.tumblingAgg(sdf, "ts", "15 minutes", watermark = "1 hour", streaming = true)
      .writeStream.format("memory").queryName("t_agg").outputMode("complete").start()
    mem.addData(
      (ts("2024-01-01 10:01:00"), "click", 1L, 1.0),
      (ts("2024-01-01 10:05:00"), "click", 1L, 2.0),
      (ts("2024-01-01 10:20:00"), "view", 2L, 3.0),
      (ts("2024-01-01 11:05:00"), "click", 1L, 4.0))
    q.processAllAvailable()
    val streamed = spark.table("t_agg").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    q.stop()
    val expected = Streams.tumblingAgg(batch, "ts", "15 minutes").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed == expected)
  }

  test("session agg groups by gap") {
    val out = Streams.sessionAgg(batch, "ts", "30 minutes").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString) -> r.getLong(2)).toMap
    assert(out((1L, "2024-01-01 10:01:00.0")) == 2) // 10:01 + 10:05 merge
    assert(out((1L, "2024-01-01 11:05:00.0")) == 1)
    assert(out((2L, "2024-01-01 10:20:00.0")) == 1)
  }
}
