package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Pins the loader's timestamp normalization: the driver's events
  * parquet has carried two different physical annotations across rounds
  * (TIMESTAMP(NANOS) read as LongType under nanosAsLong, then
  * TIMESTAMP(isAdjustedToUTC=false, MICROS) read as TIMESTAMP_NTZ), and
  * the round-8 annotation switch silently broke every `unix_micros(ts)`
  * query. Whatever the writer did, `Tpch.table` must hand queries a UTC
  * TimestampType `ts`.
  */
class TpchSpec extends SparkSpec {
  import spark.implicits._

  test("driver events.parquet loads with ts as UTC TimestampType (NTZ normalized)") {
    val dir = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$dir/events.parquet")
    // the regression precondition: the driver data really is NTZ (if the
    // driver changes the annotation again, this assert points straight
    // at the cause instead of a downstream DATATYPE_MISMATCH)
    assert(raw.schema("ts").dataType == TimestampNTZType,
      s"driver events.ts annotation changed: ${raw.schema("ts").dataType}")
    val df = Tpch.table(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    // unix_micros must resolve (the exact call q41/q43/q47 make) and the
    // wall-clock value must survive the cast unchanged under UTC
    val r = df.select(unix_micros(col("ts")).as("us"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s"),
      col("ts")).orderBy("us").head()
    assert(r.getLong(0) > 0L)
    val viaNtz = raw.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s"))
      .orderBy("s").head().getString(0)
    assert(r.getString(1) == viaNtz, "NTZ→UTC cast must preserve the wall-clock value")
  }

  test("a LongType nanos ts still rebuilds to microsecond TimestampType") {
    val df = Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
    df.write.mode("overwrite").parquet("/tmp/graft-tpch-nanos/events.parquet")
    val got = Tpch.table(spark, "/tmp/graft-tpch-nanos", "events")
    assert(got.schema("ts").dataType == TimestampType)
    // integer div: exact microsecond, no float rounding
    assert(got.select(unix_micros(col("ts"))).head().getLong(0) == 1700000000123456L)
  }
}
