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
    * drops the Exchange. This is how a hot cube materializes at 100 TB:
    * bucket the fact table by its hottest axis once, and every re-slice
    * grouped on that axis skips the shuffle forever.
    *
    * A `_graft_meta` manifest (underscore-prefixed → invisible to the
    * file scan) is written inside the table path so `loadBucketed` can
    * re-register the table in a FRESH session: the default in-memory
    * catalog dies with the session, the files do not.
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String,
                    path: String): Unit = {
    df.write.bucketBy(buckets, key).sortBy(key).mode("overwrite")
      .option("path", path).saveAsTable(table)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((key, buckets)).toDF("key", "buckets").coalesce(1)
      .write.mode("overwrite").json(s"$path/_graft_meta")
  }

  /** Compact a parquet directory's small files into `targetBytes`-sized
    * ones, writing to `dstDir` (write-then-swap stays with the caller —
    * an in-place rewrite that crashes mid-way loses data; a new
    * directory never can). The small-files problem is THE operational
    * tax of streaming/incremental ingest at scale: a micro-batch sink
    * leaves thousands of KB-sized files per day, and every later scan
    * pays a task + an open + a footer parse per file.
    *
    * Partition count = ceil(on-disk bytes / targetBytes), from the file
    * listing (not optimizer stats — compression estimates drift).
    * `coalesce`, not `repartition`: no shuffle, adjacent input files
    * merge into one task; row order inside files may interleave but no
    * row moves between executors. Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
              targetBytes: Long = 128L << 20): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val src = spark.read.parquet(srcDir)
    val files = src.inputFiles
    val conf = spark.sparkContext.hadoopConfiguration
    val bytes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    src.coalesce(parts).write.mode("overwrite").parquet(dstDir)
    (files.length, spark.read.parquet(dstDir).inputFiles.length)
  }

  /** (Re)open a table written by `writeBucketed`. The manifest is the
    * source of truth: an existing catalog entry is reused only when its
    * declared bucket count matches — a fresh session has no entry, and a
    * stale one (the path rewritten out-of-band with different bucketing)
    * would mis-declare HashPartitioning and silently corrupt joins/aggs
    * that skip the exchange. On mismatch the external entry is dropped
    * and recreated from the manifest (no data is touched).
    */
  def loadBucketed(spark: SparkSession, table: String, path: String): DataFrame = {
    val meta = spark.read.json(s"$path/_graft_meta").head()
    val key = meta.getAs[String]("key")
    val buckets = meta.getAs[Long]("buckets").toInt
    val declared =
      if (!spark.catalog.tableExists(table)) None
      else spark.sql(s"DESCRIBE TABLE EXTENDED `$table`").collect()
        .find(_.getString(0) == "Num Buckets")
        .flatMap(_.getString(1).trim.toIntOption)
    if (declared != Some(buckets)) {
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      val schema = spark.read.parquet(path).schema.toDDL
      spark.sql(
        s"""CREATE TABLE `$table` ($schema) USING parquet
           |CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $buckets BUCKETS
           |LOCATION '${path.replace("'", "''")}'""".stripMargin)
    }
    spark.table(table)
  }
}
