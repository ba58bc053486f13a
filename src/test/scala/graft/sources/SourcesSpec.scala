package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv and jsonl round-trip through a temp dir") {
    val dir = Files.createTempDirectory("graftsrc").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    df.write.option("header", "true").mode("overwrite").csv(s"$dir/c")
    df.write.mode("overwrite").json(s"$dir/j")
    assert(Sources.csv(spark, s"$dir/c").count() == 2)
    assert(Sources.jsonl(spark, s"$dir/j").select("id", "s").count() == 2)
  }

  test("rows source wraps in-memory data (the bacon iterable analogue)") {
    val df = Sources.rows(spark, Seq((1, "x"), (2, "y")))
    assert(df.columns.toSeq == Seq("_1", "_2") && df.count() == 2)
  }

  test("date-partitioned sink enables partition pruning") {
    val dir = Files.createTempDirectory("graftpart").toString + "/t"
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 2.0)).toDF("ts", "v")
    Sources.writeDatePartitioned(df, "ts", dir)
    val back = Sources.parquet(spark, dir).where(col("p_date") === "2024-01-01")
    val plan = back.queryExecution.executedPlan.toString
    assert(back.count() == 1)
    assert(plan.contains("PartitionFilters") && plan.contains("p_date"), plan)
  }

  test("bucketed table aggregation runs without a shuffle exchange") {
    val dir = Files.createTempDirectory("graftbucket").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS graft_bucket_test")
    val df = Seq.tabulate(100)(i => (i % 7L, i.toDouble)).toDF("k", "v")
    Sources.writeBucketed(df, "k", 4, "graft_bucket_test", dir)
    val agg = spark.table("graft_bucket_test").groupBy("k").agg(sum("v").as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan) // bucketing pre-partitioned the scan
    assert(agg.collect().length == 7)
    spark.sql("DROP TABLE IF EXISTS graft_bucket_test")
  }

  test("parquet streaming source yields a streaming frame with the batch schema") {
    val dir = Files.createTempDirectory("graftstream").toString + "/t"
    val df = Seq((1L, "a")).toDF("id", "s")
    df.write.mode("overwrite").parquet(dir)
    val stream = Sources.parquetStream(spark, dir, df.schema)
    assert(stream.isStreaming)
    assert(stream.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType))) // nullability may widen
  }
}
