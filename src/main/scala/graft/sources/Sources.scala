package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset sources and sinks.
  *
  * The reference consumes any Python iterable or a Postgres query
  * (bacon/cutting.py:21 CuttingBoard dataset, bacon/sql.py); the Spark
  * re-expression is the DataSource API — schema'd columnar readers whose
  * scans Catalyst can prune and push filters into, plus partitioned
  * writers so downstream cubes get partition pruning for free.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, header: Boolean = true,
          inferSchema: Boolean = true): DataFrame =
    spark.read.option("header", header).option("inferSchema", inferSchema).csv(path)

  def jsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** In-memory rows — the analogue of handing bacon a Python list. */
  def rows[T <: Product : org.apache.spark.sql.Encoder](
      spark: SparkSession, data: Seq[T]): DataFrame =
    spark.createDataset(data).toDF()

  /** Streaming source: files appearing under a directory (the streaming
    * twin of `parquet` — same schema, same downstream plan).
    */
  def parquetStream(spark: SparkSession, path: String,
                    schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Date-partitioned parquet sink. Partitioning by a date-derived column
    * is what turns the date-hierarchy filters (q23-style ge/le) into
    * whole-partition pruning at 100 TB: the scan skips directories, not
    * just row groups.
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.partitionBy("p_date").mode("overwrite").parquet(path)

  /** Bucketed table sink: pre-shuffles once on the join/agg key so every
    * later join or groupBy on that key is shuffle-free (co-located) — the
    * bucketed scan reports HashPartitioning(key, buckets) and Catalyst
    * drops the Exchange.
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String,
                    path: String): Unit =
    df.write.bucketBy(buckets, key).sortBy(key).mode("overwrite")
      .option("path", path).saveAsTable(table)
}
