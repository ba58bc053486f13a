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
    // Align the input to the bucket spec before writing: a bucketed
    // write splits EVERY task's rows by bucket, so an unaligned
    // N-partition input fans out up to N × buckets files (measured on
    // the d20 index build after its source scan went 32-way: the
    // 2 s build became 30+ s of small-file writes and the probe scans
    // read the shards back). repartition(buckets, key) uses the same
    // hash the bucket spec does, giving the one-file-per-bucket floor
    // at any input partitioning; when a caller already aligned, the
    // optimizer collapses the adjacent repartitions.
    df.repartition(buckets, col(key))
      .write.bucketBy(buckets, key).sortBy(key).mode("overwrite")
      .option("path", path).saveAsTable(table)
    writeMetaJson(df.sparkSession, s"$path/_graft_meta",
      s"""{"key":"$key","buckets":$buckets}""")
  }

  /** Write a tiny single-record JSON manifest through the Hadoop
    * FileSystem API — the same FS abstraction Spark's writers (and
    * GenerationPointer) use, so the index stays FS-agnostic, WITHOUT
    * paying a Spark job to move one line (the Seq(...).toDF.write.json
    * form it replaces cost a job per manifest; an index build/load
    * touches several manifests — r17 JobProbe measured ~100 ms of
    * driver round-trip per such micro-job). Layout-compatible with the
    * previous Spark-written form: a directory holding one part-*.json
    * line plus _SUCCESS, so stores written by either writer read back
    * with either reader.
    */
  def writeMetaJson(spark: SparkSession, dir: String, json: String): Unit = {
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(d)) fs.delete(d, true)
    fs.mkdirs(d)
    val out = fs.create(new org.apache.hadoop.fs.Path(d, "part-00000.json"), true)
    try out.write((json + "\n").getBytes("UTF-8")) finally out.close()
    fs.create(new org.apache.hadoop.fs.Path(d, "_SUCCESS"), true).close()
  }

  /** First non-empty JSON line of a manifest dir — the driver-side read
    * for [[writeMetaJson]] manifests (and the legacy Spark-written
    * form). Throws FileNotFoundException when the dir is absent, like
    * the spark.read.json it replaces.
    */
  def readMetaJson(spark: SparkSession, dir: String): String = {
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(d).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".json")).sortBy(_.getPath.getName)
    files.iterator.flatMap { f =>
      val in = fs.open(f.getPath)
      val txt =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          var n = in.read(tmp)
          while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
          buf.toString("UTF-8")
        } finally in.close()
      txt.linesIterator.map(_.trim).find(_.nonEmpty)
    }.nextOption().getOrElse(throw new java.io.FileNotFoundException(
      s"no JSON manifest line under $dir"))
  }

  /** Long field of a [[readMetaJson]] line — the manifests are written
    * by graft itself ([[writeMetaJson]] call sites), so a flat-object
    * field grab is exact, never heuristic.
    */
  def metaLong(json: String, field: String): Option[Long] =
    ("\"" + java.util.regex.Pattern.quote(field) + "\"\\s*:\\s*(-?\\d+)").r
      .findFirstMatchIn(json).map(_.group(1).toLong)

  /** String field of a [[readMetaJson]] line (no escapes — graft meta
    * fields are identifiers).
    */
  def metaString(json: String, field: String): Option[String] =
    ("\"" + java.util.regex.Pattern.quote(field) + "\"\\s*:\\s*\"([^\"]*)\"").r
      .findFirstMatchIn(json).map(_.group(1))

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

  /** [[compact]] with the swap protocol PINNED for concurrent readers —
    * what a live warehouse (a CuttingBoard slice store, a streaming
    * corpus sink) needs and bare `compact` leaves to the caller. The
    * table lives under `baseDir/gen-<n>` behind a [[GenerationPointer]];
    * each maintenance pass compacts the CURRENT generation into
    * `gen-<n+1>` and flips the pointer only after the write completes.
    *
    * Reader-visible transition (the exactly-once argument):
    *  1. A reader resolves the pointer ONCE (at `resolve`/load time) and
    *     from then on scans a generation directory that is NEVER mutated
    *     — its view is a consistent snapshot for the lifetime of the
    *     query/Dataset, even while a compaction runs and flips.
    *  2. The flip is one atomic rename ([[GenerationPointer.write]]), so
    *     a concurrent resolve sees the old generation or the new one,
    *     never a torn path — and both contain the same rows.
    *  3. A crash before the flip leaves a torn `gen-<n+1>` UNREFERENCED
    *     (readers stay on gen-n); the next pass recomputes gen-<n+1>
    *     with mode(overwrite) and flips — self-healing, same argument
    *     as the managed IVF ingest loop.
    *  4. Old generations are retired only by an explicit
    *     [[retireOldGenerations]], giving in-flight readers whatever
    *     drain grace the operator chooses; retiring is the ONLY delete
    *     in the protocol and never touches the current generation.
    *
    * Initialize with a first write to `baseDir/gen-0` +
    * `GenerationPointer.write(spark, baseDir, "gen-0")`. Returns
    * (filesBefore, filesAfter, newGen).
    */
  def compactManaged(spark: SparkSession, baseDir: String,
                     targetBytes: Long = 128L << 20): (Int, Int, String) = {
    val cur = GenerationPointer.currentDir(spark, baseDir)
    val n = cur.substring(cur.lastIndexOf("gen-") + 4).toInt
    val gen = s"gen-${n + 1}"
    val (before, after) = compact(spark, cur, s"$baseDir/$gen", targetBytes)
    GenerationPointer.write(spark, baseDir, gen)
    (before, after, gen)
  }

  /** Delete every `gen-*` directory under `baseDir` EXCEPT the current
    * one. Call only after in-flight readers of older generations have
    * drained (protocol point 4 above). Returns the retired dir names.
    */
  def retireOldGenerations(spark: SparkSession, baseDir: String): Seq[String] = {
    val cur = GenerationPointer.current(spark, baseDir).getOrElse(
      throw new IllegalStateException(s"no generation pointer at $baseDir/_current"))
    val base = new org.apache.hadoop.fs.Path(baseDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen-")
        && s.getPath.getName != cur)
      .map { s => fs.delete(s.getPath, true); s.getPath.getName }
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
    val meta = readMetaJson(spark, s"$path/_graft_meta")
    val key = metaString(meta, "key").getOrElse(
      throw new IllegalStateException(s"manifest at $path/_graft_meta has no key: $meta"))
    val buckets = metaLong(meta, "buckets").getOrElse(
      throw new IllegalStateException(s"manifest at $path/_graft_meta has no buckets: $meta")).toInt
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

/** Generation pointer for a MANAGED table location: `baseDir/_current`
  * names the generation subdirectory (`gen-<n>`) readers should use —
  * the shared write-then-swap cutover primitive behind
  * [[Sources.compactManaged]] and the managed IVF index
  * ([[graft.sim.IvfIndex]] delegates here). The flip is write-to-temp +
  * rename-over: the full content lands in `_current.tmp` first, then a
  * single FileContext rename (Rename.OVERWRITE) replaces `_current`, so
  * a concurrent reader sees either the old pointer or the complete new
  * one, never a zero-length/partial file (rename is atomic on local and
  * HDFS; object stores with non-atomic rename should front this with
  * their own conditional PUT).
  */
object GenerationPointer {
  def write(spark: SparkSession, baseDir: String, gen: String): Unit = {
    require(gen.nonEmpty && !gen.contains("/"), s"generation must be a bare dir name: $gen")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(s"$baseDir/_current")
    val tmp = new org.apache.hadoop.fs.Path(s"$baseDir/_current.tmp")
    val fs = p.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The generation subdir the pointer names, or None when unmanaged. */
  def current(spark: SparkSession, baseDir: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$baseDir/_current")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](256)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0), "UTF-8").trim).filter(_.nonEmpty)
      } finally in.close()
    }
  }

  /** Resolved dir of a managed location: `baseDir/<current gen>`.
    * Throws when no pointer exists — a managed reader must not guess.
    */
  def currentDir(spark: SparkSession, baseDir: String): String =
    current(spark, baseDir) match {
      case Some(g) => s"$baseDir/$g"
      case None => throw new IllegalStateException(
        s"no generation pointer at $baseDir/_current — initialize with a first " +
          "write to s\"$baseDir/gen-0\" + GenerationPointer.write(spark, baseDir, \"gen-0\")")
    }
}
