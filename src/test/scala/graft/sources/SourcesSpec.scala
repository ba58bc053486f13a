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

  test("bucketed cube table: re-slicing on the bucketed axis needs no exchange") {
    import graft.cube._
    val dir = Files.createTempDirectory("graftbcube").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS graft_cube_bucketed")
    val df = Seq.tabulate(200)(i => (s"k${i % 5}", s"s${i % 3}", i.toDouble))
      .toDF("k", "s", "v")
    Sources.writeBucketed(df, "k", 4, "graft_cube_bucketed", dir)
    val cube = CubeDef(
      labels = Seq(Label("k"), Label("s")),
      measures = Seq(Measure("sum_v", col("v"), Agg.Sum),
        Measure("n", lit(1), Agg.Count)))
    val t = spark.table("graft_cube_bucketed")
    // a slice grouped on the bucketed axis: the scan's HashPartitioning
    // feeds the aggregate directly — zero exchanges in the whole plan,
    // filters included (this is ROADMAP's "materialized cube" shape)
    val q = CubeQuery().addAxis("k").addValue("sum_v").addValue("n")
      .addFilter("s", "s0", FilterOp.Ne)
    val slice = Slicer.slice(t, cube, q)
    assert(!slice.queryExecution.executedPlan.toString.contains("Exchange"),
      slice.queryExecution.executedPlan.toString)
    val got = slice.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val want = df.where(col("s") =!= "s0").groupBy("k")
      .agg(sum("v"), count(lit(1)))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == want)
    // contrast: an axis the table is NOT bucketed by still shuffles
    val other = Slicer.slice(t, cube, CubeQuery().addAxis("s").addValue("sum_v"))
    assert(other.queryExecution.executedPlan.toString.contains("Exchange"))
    spark.sql("DROP TABLE IF EXISTS graft_cube_bucketed")
  }

  test("loadBucketed re-registers after catalog loss and fixes stale bucketing") {
    val dir = Files.createTempDirectory("graftbload").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS graft_bucket_load")
    val df = Seq.tabulate(60)(i => (i % 6L, i.toDouble)).toDF("k", "v")
    Sources.writeBucketed(df, "k", 4, "graft_bucket_load", dir)
    // fresh-session path: the in-memory catalog entry is gone, the
    // manifest re-registers the external bucketed table
    spark.sql("DROP TABLE IF EXISTS graft_bucket_load")
    val t = Sources.loadBucketed(spark, "graft_bucket_load", dir)
    val agg = t.groupBy("k").agg(sum("v").as("s"))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(agg.collect().length == 6)
    // a stale entry declaring the wrong bucket count is rebuilt from the
    // manifest rather than trusted
    spark.sql("DROP TABLE IF EXISTS graft_bucket_load")
    val schema = spark.read.parquet(dir).schema.toDDL
    spark.sql(
      s"""CREATE TABLE graft_bucket_load ($schema) USING parquet
         |CLUSTERED BY (k) SORTED BY (k) INTO 16 BUCKETS
         |LOCATION '$dir'""".stripMargin)
    Sources.loadBucketed(spark, "graft_bucket_load", dir)
    val declared = spark.sql("DESCRIBE TABLE EXTENDED graft_bucket_load").collect()
      .find(_.getString(0) == "Num Buckets").map(_.getString(1).trim)
    assert(declared.contains("4"), s"declared=$declared")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_load")
  }

  test("compact merges a shredded directory into target-sized files, rows intact") {
    val src = Files.createTempDirectory("graftcompact").toString + "/src"
    val dst = src.stripSuffix("src") + "dst"
    // 64 tiny files
    (1 to 640).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(64).write.mode("overwrite").parquet(src)
    val (before, after) = Sources.compact(spark, src, dst, targetBytes = 256L << 10)
    assert(before == 64 && after < 8, s"$before -> $after")
    // same rows, nothing lost or duplicated
    val a = spark.read.parquet(src).collect().map(_.getLong(0)).sorted
    val b = spark.read.parquet(dst).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
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

  test("compactManaged: generation swap is invisible to in-flight readers, crash-safe, retirable") {
    val base = Files.createTempDirectory("graft-cmpmg").toString
    val rows = (1L to 200L).map(i => (i, s"v$i"))
    // seed gen-0 FRAGMENTED (many small files — the micro-batch tax)
    rows.toDF("id", "s").repartition(20)
      .write.mode("overwrite").parquet(s"$base/gen-0")
    GenerationPointer.write(spark, base, "gen-0")
    // reader A resolves the pointer ONCE — its snapshot for the query
    val dirA = GenerationPointer.currentDir(spark, base)
    val readerA = spark.read.parquet(dirA)
    assert(readerA.inputFiles.length == 20)
    // maintenance: compact into gen-1, flip
    val (before, after, gen) = Sources.compactManaged(spark, base, targetBytes = 1L << 30)
    assert(before == 20 && after == 1 && gen == "gen-1")
    assert(GenerationPointer.current(spark, base).contains("gen-1"))
    // 1. reader A's generation was never mutated: same rows, same files
    assert(readerA.collect().map(r => (r.getLong(0), r.getString(1))).toSet == rows.toSet)
    assert(spark.read.parquet(dirA).inputFiles.length == 20)
    // 2. a post-flip resolve sees the SAME rows in compacted layout
    val readerB = spark.read.parquet(GenerationPointer.currentDir(spark, base))
    assert(readerB.collect().map(r => (r.getLong(0), r.getString(1))).toSet == rows.toSet)
    assert(readerB.inputFiles.length == 1)
    // no torn pointer artifacts survive the atomic flip
    assert(!new java.io.File(s"$base/_current.tmp").exists())
    // 3. crash window: a torn gen-2 without a flip leaves readers on
    // gen-1; the next pass overwrites the torn dir and flips
    rows.take(3).toDF("id", "s").write.mode("overwrite").parquet(s"$base/gen-2")
    assert(GenerationPointer.currentDir(spark, base).endsWith("gen-1"))
    val (_, _, gen2) = Sources.compactManaged(spark, base, targetBytes = 1L << 30)
    assert(gen2 == "gen-2")
    assert(spark.read.parquet(GenerationPointer.currentDir(spark, base))
      .collect().map(_.getLong(0)).toSet == rows.map(_._1).toSet)
    // 4. retirement deletes everything but the current generation
    val retired = Sources.retireOldGenerations(spark, base)
    assert(retired.toSet == Set("gen-0", "gen-1"), retired.toString)
    assert(new java.io.File(s"$base/gen-2").exists())
    assert(!new java.io.File(s"$base/gen-0").exists())
  }
}
