package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
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

  test("hopping-window agg equals the batch answer on a stream") {
    // the q50 shape: width 30 min, slide 15 min — every event lands in 2
    // overlapping windows; streaming adds watermarking, nothing else
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val sdf = mem.toDF().toDF("ts", "event_type", "user_id", "value")
    def agg(df: org.apache.spark.sql.DataFrame, streaming: Boolean) = {
      val in = if (streaming) df.withWatermark("ts", "1 hour") else df
      in.groupBy(window(col("ts"), "30 minutes", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sv"))
    }
    val q = agg(sdf, streaming = true)
      .writeStream.format("memory").queryName("h_agg").outputMode("complete").start()
    mem.addData(
      (ts("2024-01-01 10:01:00"), "click", 1L, 1.0),
      (ts("2024-01-01 10:05:00"), "click", 1L, 2.0),
      (ts("2024-01-01 10:20:00"), "view", 2L, 3.0),
      (ts("2024-01-01 11:05:00"), "click", 1L, 4.0))
    q.processAllAvailable()
    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3))
    val streamed = spark.table("h_agg").collect().map(key).toMap
    q.stop()
    val want = agg(batch, streaming = false).collect().map(key).toMap
    assert(streamed == want)
    // the multiplication really happened: 4 events, every one in 2 windows
    assert(streamed.values.map(_._1).sum == 8L)
  }

  test("corpus ops run unchanged on a stream: split/mixture/redaction are stateless") {
    import graft.text.CorpusOps
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val rates = Seq("srcA" -> 0.5)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .where(CorpusOps.mixtureFilter(col("id"), col("src"), rates))
      .withColumn("split", CorpusOps.splitColumn(col("id"), splits))
      .withColumn("red", CorpusOps.redactPii(col("text")))
    val q = shape(mem.toDF().toDF("id", "src", "text"))
      .writeStream.format("memory").queryName("s_corpus").outputMode("append").start()
    val rows = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "srcA" else "srcB", s"doc $i contact u$i@x.io"))
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("s_corpus").collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[String]("split"), r.getAs[String]("red")))
      .toMap
    q.stop()
    // identical decisions to the batch run of the same expressions —
    // streaming adds no RNG/state that could diverge
    val batch = shape(rows.toDF("id", "src", "text")).collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[String]("split"), r.getAs[String]("red")))
      .toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.size < 200) // srcA half-sampled
    assert(streamed.values.forall(_._2.contains("[EMAIL]")))
  }

  test("streaming dedup drops repeated content within the watermark, matching batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val sdf = mem.toDF().toDF("ts", "doc_id", "text")
    val q = Streams.streamingDedup(sdf, "ts", "text")
      .writeStream.format("memory").queryName("s_dedup").outputMode("append").start()
    mem.addData(
      (ts("2024-01-01 10:00:00"), 1L, "the quick brown fox"),
      (ts("2024-01-01 10:01:00"), 2L, "the  quick brown fox"), // ws-variant dup
      (ts("2024-01-01 10:02:00"), 3L, "something else entirely"))
    q.processAllAvailable()
    mem.addData(
      (ts("2024-01-01 10:10:00"), 4L, "THE QUICK BROWN FOX"),  // case-variant dup
      (ts("2024-01-01 10:11:00"), 5L, "a genuinely new document"))
    q.processAllAvailable()
    val streamed = spark.table("s_dedup").collect().map(_.getAs[Long]("doc_id")).toSet
    q.stop()
    assert(streamed == Set(1L, 3L, 5L))
    // batch mode of the same transform agrees
    val batchDocs = Seq(
      (ts("2024-01-01 10:00:00"), 1L, "the quick brown fox"),
      (ts("2024-01-01 10:01:00"), 2L, "the  quick brown fox"),
      (ts("2024-01-01 10:02:00"), 3L, "something else entirely"),
      (ts("2024-01-01 10:10:00"), 4L, "THE QUICK BROWN FOX"),
      (ts("2024-01-01 10:11:00"), 5L, "a genuinely new document"),
    ).toDF("ts", "doc_id", "text")
    val batchKept = Streams.streamingDedup(batchDocs, "ts", "text", streaming = false)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(batchKept.size == 3 && batchKept.contains(3L) && batchKept.contains(5L))
  }

  test("CuttingBoard.refresh in foreachBatch keeps slices current (callable-dataset parity)") {
    // The reference's dataset is a callable re-checked per slice
    // (bacon/cutting.py:122): each stream micro-batch refreshes the
    // board, so later slices see the grown dataset and never a stale
    // cached aggregate.
    import graft.cube._
    implicit val sqlCtx = spark.sqlContext
    val cube = CubeDef(
      labels = Seq(Label("event_type")),
      measures = Seq(Measure("sum_value", col("value"), Agg.Sum), Measure("n", lit(1), Agg.Count)))
    val board = new CuttingBoard(batch.limit(0), cube)
    val q0 = CubeQuery().addAxis("event_type").addValue("sum_value").addValue("n")

    var seen = Vector.empty[DataFrame] // accumulated micro-batches
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val sq = mem.toDF().toDF("ts", "event_type", "user_id", "value")
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        seen = seen :+ b
        board.refresh(seen.reduce(_ unionAll _))
        ()
      }.start()

    mem.addData((ts("2024-01-01 10:01:00"), "click", 1L, 1.0),
      (ts("2024-01-01 10:05:00"), "click", 1L, 2.0))
    sq.processAllAvailable()
    val first = board.slice(q0).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(first("click") == 3.0)

    mem.addData((ts("2024-01-01 10:20:00"), "view", 2L, 3.0),
      (ts("2024-01-01 11:05:00"), "click", 1L, 4.0))
    sq.processAllAvailable()
    sq.stop()
    // same query after refresh: no stale cache hit, new rows visible
    val second = board.slice(q0).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(second("click") == 7.0 && second("view") == 3.0)
    board.clear()
  }

  test("CuttingBoard.append in foreachBatch maintains slices at DELTA cost") {
    // The incremental sibling of the refresh test: each micro-batch is
    // APPENDED, so cached mergeable slices update by aggregating only
    // the batch — the streaming materialized-view loop. The post-append
    // slice must be a cache HIT (refresh would recompute from scratch).
    import graft.cube._
    implicit val sqlCtx = spark.sqlContext
    val cube = CubeDef(
      labels = Seq(Label("event_type")),
      measures = Seq(Measure("sum_value", col("value"), Agg.Sum), Measure("n", lit(1), Agg.Count)))
    val board = new CuttingBoard(batch.limit(0), cube)
    val q0 = CubeQuery().addAxis("event_type").addValue("sum_value").addValue("n")
    board.slice(q0).collect() // prime the (empty) materialization
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val sq = mem.toDF().toDF("ts", "event_type", "user_id", "value")
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        board.append(b)
        ()
      }.start()
    mem.addData((ts("2024-01-01 10:01:00"), "click", 1L, 1.0),
      (ts("2024-01-01 10:05:00"), "click", 1L, 2.0))
    sq.processAllAvailable()
    mem.addData((ts("2024-01-01 10:20:00"), "view", 2L, 3.0),
      (ts("2024-01-01 11:05:00"), "click", 1L, 4.0))
    sq.processAllAvailable()
    sq.stop()
    val got = board.slice(q0).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got == Map("click" -> (7.0, 3L), "view" -> (3.0, 1L)))
    // served from the MAINTAINED cache, not recomputed
    assert(board.stats == (1L, 1L), s"stats=${board.stats}")
    board.clear()
  }

  test("flatMapGroupsWithState keeps per-user running stats across batches") {
    implicit val sqlCtx = spark.sqlContext
    import Streams.{UserEvent, UserStats}
    val mem = MemoryStream[UserEvent]
    val out = Streams.userStats(mem.toDS())
      .writeStream.format("memory").queryName("u_stats").outputMode("update").start()
    // batch 1
    mem.addData(
      UserEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
      UserEvent(1L, ts("2024-01-01 10:10:00"), 2.0))
    out.processAllAvailable()
    // batch 2 — state must carry over (n=3, max gap grows to 50 min)
    mem.addData(UserEvent(1L, ts("2024-01-01 11:00:00"), 4.0))
    out.processAllAvailable()
    val last = spark.table("u_stats").collect()
      .map(r => UserStats(r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .filter(_.user_id == 1L).maxBy(_.n_events)
    out.stop()
    assert(last == UserStats(1L, 3L, 7.0, 3000L)) // 50 min = 3000 s
  }

  test("session agg groups by gap") {
    val out = Streams.sessionAgg(batch, "ts", "30 minutes").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString) -> r.getLong(2)).toMap
    assert(out((1L, "2024-01-01 10:01:00.0")) == 2) // 10:01 + 10:05 merge
    assert(out((1L, "2024-01-01 11:05:00.0")) == 1)
    assert(out((2L, "2024-01-01 10:20:00.0")) == 1)
  }

  test("continuous ingest: cross-batch near-dup dedup through the persistent index") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    // seed corpus: one doc; the index is the ONLY carried state
    val seed = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val idx = graft.dedup.MinHashIndex.create(spark, s"$base/idx", seed,
      "doc_id", "text", buckets = 4)
    val mem = MemoryStream[(Long, String)]
    val q = Streams.continuousIngest(
      mem.toDF().toDF("doc_id", "text"), idx, "doc_id", "text",
      s"$base/corpus", s"$base/ckpt")
    // batch 1: a near-dup of the seed (drop), a novel doc (keep), and a
    // within-batch dup pair (keep only the smaller id)
    mem.addData(
      (10L, "the quick brown fox jumps over the lazy cat"), // ~seed → drop
      (11L, "completely different words entirely here now friends"),
      (12L, "completely different words entirely here now friend"))  // ~11 → drop
    q.processAllAvailable()
    // batch 2: a near-dup of what batch 1 KEPT (drop — state crossed
    // batches through the index), and one more novel doc
    mem.addData(
      (20L, "completely different words entirely here now friends"), // ~11 → drop
      (21L, "another unrelated document about spark engines"))
    q.processAllAvailable()
    q.stop()
    val corpus = spark.read.parquet(s"$base/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(corpus == Set(11L, 21L))
    // and the index now knows everything kept: a rerun of any kept doc
    // under a fresh id is no longer novel
    val re = graft.dedup.MinHashIndex.load(spark, s"$base/idx")
    val again = Seq((30L, "another unrelated document about spark engines"))
      .toDF("doc_id", "text")
    assert(re.filterNovel(again, "doc_id", "text").count() == 0L)
  }

  test("continuous corpus ingest (t05 shape): streamed micro-batches keep exactly the batch survivors") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-corpus-ingest").toString
    val seedDoc = "the quick brown fox jumps over the lazy dog and it is a fine day for all of the animals in the field"
    val seed = Seq((1L, seedDoc, "web")).toDF("doc_id", "text", "source")
    // high-quality bodies: long, stopword-rich, punctuation-light — they
    // clear the 0.5 threshold; JUNK does not (short + punctuation-heavy).
    // The two keepers share only stopwords, so their shingle Jaccard is
    // far below the dedup threshold.
    val harvest = "the harvest would come early this year for everyone and it was a time " +
      "of great joy in the village as the people gathered to celebrate the season with " +
      "food and song for all of the families who had worked in the fields"
    val lanterns = "the lanterns were lit along the harbour wall at dusk and it is said " +
      "that the ships would find their way home by that light in the dark of the winter " +
      "nights when the storms came down from the north and covered the coast"
    val junk = "!!! ??? ,,, ;;; buy now !!!"
    val rates = Seq("web" -> 1.0, "spam" -> 0.0)
    val batch1 = Seq(
      (10L, harvest, "web"),                                   // keep
      (11L, harvest + ".", "web"),                             // ~10 → self-dedup drop
      (12L, junk, "web"),                                      // quality drop
      (13L, lanterns + " for a while", "spam"),                // mixture drop
      (14L, seedDoc + " today", "web"))                        // ~seed → index drop
    val batch2 = Seq(
      (20L, harvest.replace("everyone", "everybody"), "web"),  // ~10 (kept in b1) → drop
      (21L, lanterns, "web"),                                  // keep
      (22L, junk + " limited offer", "web"))                   // quality drop
    // STREAM: two micro-batches through the persistent index
    val idxS = graft.dedup.MinHashIndex.create(spark, s"$base/idxS", seed,
      "doc_id", "text", buckets = 4)
    val mem = MemoryStream[(Long, String, String)]
    val q = Streams.continuousCorpusIngest(
      mem.toDF().toDF("doc_id", "text", "source"), idxS, "doc_id", "text", "source",
      s"$base/corpus", s"$base/ckpt", minQuality = 0.5, mixtureRates = rates)
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$base/corpus")
      .select("doc_id").as[Long].collect().toSet
    // BATCH: the same docs in ONE ingest step against a fresh same-seed index
    val idxB = graft.dedup.MinHashIndex.create(spark, s"$base/idxB", seed,
      "doc_id", "text", buckets = 4)
    val all = (batch1 ++ batch2).toDF("doc_id", "text", "source")
    val batched = Streams.ingestBatch(
      Streams.corpusFilter(all, "doc_id", "text", "source", 0.5, rates),
      idxB, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batched, s"stream=$streamed batch=$batched")
    assert(streamed == Set(10L, 21L), s"survivor set wrong: $streamed")
  }

  test("a replayed micro-batch is idempotent: same kept-set after index.add, sink partition replaced") {
    // foreachBatch is at-least-once: the batch can re-run AFTER its
    // index.add committed. The replay must (a) recompute the identical
    // kept-set — its own rows finding THEMSELVES in the store is not a
    // dup (id-equal matches ignored) — and (b) overwrite its own
    // ingest_batch partition rather than appending a second copy.
    val base = java.nio.file.Files.createTempDirectory("graft-replay").toString
    val seed = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val idx = graft.dedup.MinHashIndex.create(spark, s"$base/idx", seed,
      "doc_id", "text", buckets = 4)
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy cat"), // ~seed → drop
      (11L, "completely different words entirely here now friends"))
      .toDF("doc_id", "text")
    def run() = {
      val kept = Streams.ingestBatch(batch, idx, "doc_id", "text")
      kept.withColumn("ingest_batch", lit(0L))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch").parquet(s"$base/corpus")
      idx.add(kept, "doc_id", "text")
      kept.select("doc_id").as[Long].collect().toSet
    }
    val first = run()
    assert(first == Set(11L))
    val replay = run() // attempt 2 of the SAME batch, index already has 11
    assert(replay == first, "replay changed the kept-set")
    val corpus = spark.read.parquet(s"$base/corpus")
      .select("doc_id").as[Long].collect().toSeq
    assert(corpus.sorted == Seq(11L), s"corpus has duplicates or losses: $corpus")
    // and the duplicated store rows never duplicate a search answer
    val pairs = idx.pairsAgainst(batch, "doc_id", "text")
    assert(pairs.count() == pairs.dropDuplicates("id", "dup_of").count())
  }

  test("continuous embedding ingest: cell-scoped semantic dedup through the persistent IVF index") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-eingest").toString
    // seed corpus spanning the cells; the written index is the ONLY state
    val seed = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)), (4L, Array(0f, 0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    graft.sim.IvfIndex.build(seed, "vec_id", "embedding", numCentroids = 2, iters = 2)
      .write(s"$base/idx", buckets = 2)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = Streams.continuousEmbeddingIngest(
      mem.toDF().toDF("vec_id", "embedding"), s"$base/idx", "vec_id", "embedding",
      s"$base/corpus", s"$base/ckpt", threshold = 0.95)
    // batch 1: a near-dup of seed 1 (drop vs store), a novel vector
    // (keep), and its within-batch near-dup (keep only the smaller id)
    mem.addData(
      (10L, Array(0.999f, 0.001f, 0f, 0f)),   // ~seed 1 -> drop
      (11L, Array(0.6f, 0.62f, 0.5f, 0f)),     // novel -> keep
      (12L, Array(0.62f, 0.6f, 0.5f, 0f)))     // ~11 within batch -> drop
    q.processAllAvailable()
    // batch 2: a near-dup of what batch 1 KEPT (state crossed batches
    // through the index) and one more novel vector
    mem.addData(
      (20L, Array(0.61f, 0.61f, 0.51f, 0f)),   // ~11 -> drop
      (21L, Array(0f, 0.7f, 0f, 0.71f)))       // novel -> keep
    q.processAllAvailable()
    q.stop()
    val corpus = spark.read.parquet(s"$base/corpus")
      .select("vec_id").as[Long].collect().toSet
    assert(corpus == Set(11L, 21L), corpus.toString)
    // the index knows everything kept: replaying a kept vector under a
    // fresh id is no longer novel
    val again = Seq((30L, Array(0f, 0.7f, 0f, 0.71f))).toDF("vec_id", "embedding")
    val dup = graft.sim.IvfIndex.storeDupIds(spark, s"$base/idx", again,
      "vec_id", "embedding", 0.95).collect()
    assert(dup.map(_.getLong(0)).toSet == Set(30L))
    // and replaying an ALREADY-INGESTED batch recomputes the identical
    // kept set (the exactly-once argument: id-equal store rows are
    // ignored, cell relation is symmetric)
    val replay = Seq(
      (10L, Array(0.999f, 0.001f, 0f, 0f)),
      (11L, Array(0.6f, 0.62f, 0.5f, 0f)),
      (12L, Array(0.62f, 0.6f, 0.5f, 0f))).toDF("vec_id", "embedding")
    val keptAgain = Streams.embedIngestBatch(replay, s"$base/idx",
      "vec_id", "embedding", 0.95).select("vec_id").as[Long].collect().toSet
    assert(keptAgain == Set(11L), keptAgain.toString)
  }

  test("embedding-index maintenance mid-stream: compact + rebuild, ingest continues") {
    // the ops loop the maintenance primitives exist for: ingest
    // fragments and skews the index -> compact, rebuild into a fresh
    // dir -> flip the ingest to the new dir; dedup state survives
    // because the postings ARE the state
    val base = java.nio.file.Files.createTempDirectory("graft-emaint").toString
    val seed = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)), (4L, Array(0f, 0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    graft.sim.IvfIndex.build(seed, "vec_id", "embedding", numCentroids = 2, iters = 2)
      .write(s"$base/idx0", buckets = 2)
    // two ingest steps through the batch entry point (same loop the
    // stream runs), each committing via addTo
    val b1 = Seq((10L, Array(0.999f, 0.001f, 0f, 0f)),   // ~seed 1 -> drop
      (11L, Array(0.6f, 0.62f, 0.5f, 0f))).toDF("vec_id", "embedding") // keep
    val kept1 = Streams.embedIngestBatch(b1, s"$base/idx0", "vec_id", "embedding", 0.95)
    graft.sim.IvfIndex.addTo(spark, s"$base/idx0", kept1, "vec_id", "embedding")
    // maintenance: compact the fragmented postings, then rebuild the
    // quantizer over the grown population, each into a fresh dir
    graft.sim.IvfIndex.compactTo(spark, s"$base/idx0", s"$base/idx1", buckets = 2)
    graft.sim.IvfIndex.rebuildTo(spark, s"$base/idx1", s"$base/idx2",
      numCentroids = 2, iters = 2)
    // dedup state survived both hops: near-dups of the seed AND of the
    // batch-1 keeper are still caught by the rebuilt index
    val probes = Seq((90L, Array(0.999f, 0.001f, 0f, 0f)),  // ~seed 1
      (91L, Array(0.61f, 0.61f, 0.5f, 0f)),                  // ~11
      (92L, Array(0f, 0.7f, 0f, 0.71f))).toDF("vec_id", "embedding") // novel
    val dups = graft.sim.IvfIndex.storeDupIds(spark, s"$base/idx2", probes,
      "vec_id", "embedding", 0.95).collect().map(_.getLong(0)).toSet
    assert(dups == Set(90L, 91L), dups.toString)
    // and ingest continues against the rebuilt dir
    val kept2 = Streams.embedIngestBatch(probes, s"$base/idx2",
      "vec_id", "embedding", 0.95).select("vec_id").as[Long].collect().toSet
    assert(kept2 == Set(92L), kept2.toString)
  }

  test("managed embedding ingest: maintenance rewrites a new generation and flips the pointer") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-emanaged").toString
    val seed = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)), (4L, Array(0f, 0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    // a managed reader must refuse to guess before initialization
    intercept[IllegalStateException] {
      graft.sim.IvfIndex.currentIndexDir(spark, s"$base/idx")
    }
    graft.sim.IvfIndex.build(seed, "vec_id", "embedding", numCentroids = 2, iters = 2)
      .write(s"$base/idx/gen-0", buckets = 2)
    graft.sim.IvfIndex.writeGenerationPointer(spark, s"$base/idx", "gen-0")
    assert(graft.sim.IvfIndex.currentIndexDir(spark, s"$base/idx") == s"$base/idx/gen-0")
    val mem = MemoryStream[(Long, Array[Float])]
    val q = Streams.continuousEmbeddingIngestManaged(
      mem.toDF().toDF("vec_id", "embedding"), s"$base/idx", "vec_id", "embedding",
      s"$base/corpus", s"$base/ckpt", threshold = 0.95,
      maintainEvery = 2, skewThreshold = 1.5)
    // batch 0: near-dup of seed 1 (drop) + a novel keeper; no maintenance
    mem.addData((10L, Array(0.999f, 0.001f, 0f, 0f)),
      (11L, Array(0.6f, 0.62f, 0.5f, 0f)))
    q.processAllAvailable()
    assert(graft.sim.IvfIndex.currentGeneration(spark, s"$base/idx").contains("gen-0"))
    // batch 1: one more novel vector; (1+1) % 2 == 0 -> maintenance fires
    mem.addData((20L, Array(0f, 0.7f, 0f, 0.71f)))
    q.processAllAvailable()
    assert(graft.sim.IvfIndex.currentGeneration(spark, s"$base/idx").contains("gen-2"))
    // batch 2 runs against the NEW generation: near-dups of the seed AND
    // of both pre-flip keepers are still dropped (the postings are the
    // state; they crossed the hop), a novel vector still lands
    mem.addData(
      (30L, Array(0.999f, 0.001f, 0f, 0f)),  // ~seed 1 -> drop
      (31L, Array(0.61f, 0.61f, 0.5f, 0f)),   // ~11 -> drop
      (32L, Array(0f, 0.71f, 0f, 0.7f)),      // ~20 -> drop
      (33L, Array(0.5f, -0.5f, 0.5f, -0.5f))) // novel -> keep
    q.processAllAvailable()
    q.stop()
    val corpus = spark.read.parquet(s"$base/corpus")
      .select("vec_id").as[Long].collect().toSet
    assert(corpus == Set(11L, 20L, 33L), corpus.toString)
  }

  test("managed ingest crash recovery: replay after pointer flip is a no-op; crash before flip redoes maintenance") {
    // The two crash windows of the maintenance hop, driven through the
    // SAME step function the stream's foreachBatch runs:
    //   (a) crash AFTER writeGenerationPointer but BEFORE the streaming
    //       checkpoint commits -> the batch replays with the pointer
    //       already at the target generation; the guard must skip
    //       maintenance (re-running would compact src == dst) and the
    //       replayed ingest must keep the identical set.
    //   (b) crash AFTER the gen-N dir is written but BEFORE the pointer
    //       flip -> the old generation is still live; the replayed batch
    //       must redo maintenance over the half-committed dst (overwrite)
    //       and flip.
    val base = java.nio.file.Files.createTempDirectory("graft-ecrash").toString
    val seed = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)), (4L, Array(0f, 0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    graft.sim.IvfIndex.build(seed, "vec_id", "embedding", numCentroids = 2, iters = 2)
      .write(s"$base/idx/gen-0", buckets = 2)
    graft.sim.IvfIndex.writeGenerationPointer(spark, s"$base/idx", "gen-0")
    def step(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      Streams.managedIngestStep(df, id, s"$base/idx", "vec_id", "embedding",
        s"$base/corpus", threshold = 0.95, maintainEvery = 2, skewThreshold = 1.5)
    val b0 = Seq((10L, Array(0.999f, 0.001f, 0f, 0f)),   // ~seed 1 -> drop
      (11L, Array(0.6f, 0.62f, 0.5f, 0f))).toDF("vec_id", "embedding")
    step(b0, 0L)
    // --- scenario (b): maintenance batch crashes between gen-2 write and
    // pointer flip. Simulate the torn state: write gen-2, leave pointer.
    val b1 = Seq((20L, Array(0f, 0.7f, 0f, 0.71f))).toDF("vec_id", "embedding")
    graft.sim.IvfIndex.compactTo(spark, s"$base/idx/gen-0", s"$base/idx/gen-2", buckets = 2)
    assert(graft.sim.IvfIndex.currentGeneration(spark, s"$base/idx").contains("gen-0"))
    // replay of batch 1 from the checkpoint: old generation still live,
    // maintenance must redo the hop (overwriting the torn gen-2) + flip
    step(b1, 1L)
    assert(graft.sim.IvfIndex.currentGeneration(spark, s"$base/idx").contains("gen-2"))
    // dedup continuity across the recovered hop: pre-flip keepers are
    // still detected by the recovered generation
    val probes = Seq((90L, Array(0.999f, 0.001f, 0f, 0f)),  // ~seed 1
      (91L, Array(0.61f, 0.61f, 0.5f, 0f)),                  // ~11
      (92L, Array(0f, 0.71f, 0f, 0.7f))).toDF("vec_id", "embedding") // ~20
    val dups = graft.sim.IvfIndex.storeDupIds(spark, s"$base/idx/gen-2", probes,
      "vec_id", "embedding", 0.95).collect().map(_.getLong(0)).toSet
    assert(dups == Set(90L, 91L, 92L), dups.toString)
    // --- scenario (a): the flip happened but the checkpoint didn't
    // commit -> batch 1 replays with the pointer ALREADY at gen-2. Before
    // the guard this threw ("cannot overwrite a path being read from");
    // now it must be a clean no-op on the pointer and keep the same set.
    step(b1, 1L)
    assert(graft.sim.IvfIndex.currentGeneration(spark, s"$base/idx").contains("gen-2"))
    val corpus = spark.read.parquet(s"$base/corpus")
    val survivors = corpus.select("vec_id").as[Long].collect().toSeq
    // no duplicate survivors: each kept id appears exactly once
    assert(survivors.sorted == Seq(11L, 20L), survivors.toString)
  }

  test("managed PQ ingest: dedup in the code metric, maintenance compacts a new generation and flips") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-pqmanaged").toString
    val seed = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)), (4L, Array(0f, 0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    graft.sim.PqIndex.build(seed, "vec_id", "embedding",
        m = 2, codesPerSub = 4, numCentroids = 2, iters = 2)
      .write(s"$base/idx/gen-0", buckets = 2)
    graft.sim.IvfIndex.writeGenerationPointer(spark, s"$base/idx", "gen-0")
    val mem = MemoryStream[(Long, Array[Float])]
    val q = Streams.continuousPqIngestManaged(
      mem.toDF().toDF("vec_id", "embedding"), s"$base/idx", "vec_id", "embedding",
      s"$base/corpus", s"$base/ckpt", threshold = 0.95, maintainEvery = 2)
    // batch 0: near-dup of seed 1 (same code -> drop), a novel keeper,
    // and its within-batch near-dup (drop, smaller id wins); no hop yet
    mem.addData(
      (10L, Array(0.999f, 0.001f, 0f, 0f)),
      (11L, Array(0.6f, 0.62f, 0.5f, 0f)),
      (12L, Array(0.6f, 0.62f, 0.5f, 0.001f)))
    q.processAllAvailable()
    assert(graft.sim.IvfIndex.currentGeneration(spark, s"$base/idx").contains("gen-0"))
    // batch 1: one more novel vector; (1+1) % 2 == 0 -> compaction hop
    mem.addData((21L, Array(0f, 0.7f, 0f, 0.71f)))
    q.processAllAvailable()
    assert(graft.sim.IvfIndex.currentGeneration(spark, s"$base/idx").contains("gen-2"))
    // batch 2 runs against the NEW generation: near-dups of the seed AND
    // of both pre-flip keepers still drop (the codes are the state and
    // they crossed the hop); a novel vector lands
    mem.addData(
      (30L, Array(0.999f, 0.001f, 0f, 0f)),   // ~seed 1 -> drop
      (31L, Array(0.6f, 0.62f, 0.5f, 0f)),     // == 11 content -> drop
      (32L, Array(0f, 0.7f, 0f, 0.71f)),       // == 21 content -> drop
      (33L, Array(0.5f, -0.5f, 0.5f, -0.5f)))  // novel -> keep
    q.processAllAvailable()
    q.stop()
    val corpus = spark.read.parquet(s"$base/corpus")
      .select("vec_id").as[Long].collect().toSet
    assert(corpus == Set(11L, 21L, 33L), corpus.toString)
  }

  test("managed PQ ingest crash windows + offline quantizer-rebuild handoff") {
    // Same two crash windows as the IVF loop, through the SAME step
    // function the stream runs, then the PQ-specific third case: the
    // quantizer rebuild is an OFFLINE build from the accumulated vector
    // corpus, handed off via the pointer — the loop must pick the new
    // generation up and keep recognizing pre-rebuild content.
    val base = java.nio.file.Files.createTempDirectory("graft-pqcrash").toString
    val seed = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)), (4L, Array(0f, 0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    graft.sim.PqIndex.build(seed, "vec_id", "embedding",
        m = 2, codesPerSub = 4, numCentroids = 2, iters = 2)
      .write(s"$base/idx/gen-0", buckets = 2)
    graft.sim.IvfIndex.writeGenerationPointer(spark, s"$base/idx", "gen-0")
    def step(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      Streams.managedPqIngestStep(df, id, s"$base/idx", "vec_id", "embedding",
        s"$base/corpus", threshold = 0.95, maintainEvery = 2)
    val b0 = Seq((10L, Array(0.999f, 0.001f, 0f, 0f)),   // ~seed 1 -> drop
      (11L, Array(0.6f, 0.62f, 0.5f, 0f))).toDF("vec_id", "embedding") // keep
    step(b0, 0L)
    // --- crash window (b): gen-2 written, pointer NOT flipped
    val b1 = Seq((20L, Array(0f, 0.7f, 0f, 0.71f))).toDF("vec_id", "embedding")
    graft.sim.PqIndex.compactTo(spark, s"$base/idx/gen-0", s"$base/idx/gen-2", buckets = 2)
    assert(graft.sim.IvfIndex.currentGeneration(spark, s"$base/idx").contains("gen-0"))
    step(b1, 1L) // replay: must redo the hop over the torn dst and flip
    assert(graft.sim.IvfIndex.currentGeneration(spark, s"$base/idx").contains("gen-2"))
    // --- crash window (a): pointer flipped, checkpoint uncommitted ->
    // the SAME batch replays; guard must skip maintenance, kept set and
    // sink must come out identical (dynamic partition overwrite)
    step(b1, 1L)
    assert(graft.sim.IvfIndex.currentGeneration(spark, s"$base/idx").contains("gen-2"))
    val survivors = spark.read.parquet(s"$base/corpus")
      .select("vec_id").as[Long].collect().toSeq
    assert(survivors.sorted == Seq(11L, 20L), survivors.toString)
    // --- offline rebuild handoff: retrain quantizer+codebooks over the
    // full live population (seed + accumulated corpus), write gen-X,
    // flip — the operator move the managed loop documents
    val live = seed.union(spark.read.parquet(s"$base/corpus")
      .select("vec_id", "embedding"))
    graft.sim.PqIndex.build(live, "vec_id", "embedding",
        m = 2, codesPerSub = 4, numCentroids = 2, iters = 2)
      .write(s"$base/idx/gen-rebuilt", buckets = 2)
    graft.sim.IvfIndex.writeGenerationPointer(spark, s"$base/idx", "gen-rebuilt")
    // next batch resolves the rebuilt generation: pre-rebuild content is
    // still recognized, novel content still lands
    val b2 = Seq((40L, Array(0.6f, 0.62f, 0.5f, 0f)),    // == 11 -> drop
      (41L, Array(0.5f, -0.5f, 0.5f, -0.5f))).toDF("vec_id", "embedding") // keep
    step(b2, 2L)
    val after = spark.read.parquet(s"$base/corpus")
      .select("vec_id").as[Long].collect().toSet
    assert(after == Set(11L, 20L, 41L), after.toString)
    // tombstone-aware replay: take 41 down, replay its batch — the
    // replayed row is dropped from the kept set (not resurrected into
    // the index), and the index stops serving it. The corpus dir is a
    // LANDING ZONE: an empty replayed kept-set rewrites no partition, so
    // the pre-takedown file lingers until compaction — readers apply
    // the same tombstone mask (filterOut), which is the serving truth.
    graft.sim.PqIndex.removeFrom(spark, s"$base/idx/gen-rebuilt",
      Seq(41L).toDF("id"), "id")
    step(b2, 2L)
    val servedIds = graft.sim.PqIndex.storedReconstructions(spark, s"$base/idx/gen-rebuilt")
      .select("id").as[Long].collect().toSet
    assert(!servedIds.contains(41L), servedIds.toString)
    val replayed = graft.sources.Tombstones.filterOut(spark, s"$base/idx/gen-rebuilt",
        spark.read.parquet(s"$base/corpus"), "vec_id")
      .select("vec_id").as[Long].collect().toSet
    assert(replayed == Set(11L, 20L), replayed.toString)
  }

  test("continuous drift monitor: per-batch JS vs a frozen reference, drifted batch flagged") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val ref = Seq((1L, "web", "the quick brown fox jumps the lazy dog"),
      (2L, "web", "the dog and the fox run the yard")).toDF("id", "source", "text")
    val mem = MemoryStream[(Long, String, String)]
    val q = Streams.continuousDriftMonitor(
      mem.toDF().toDF("id", "source", "text"), ref, "source", "text",
      s"$base/monitor", s"$base/ckpt")
    // batch 0: in-distribution (same vocabulary, similar frequencies)
    mem.addData((10L, "web", "the quick dog and the lazy fox"))
    q.processAllAvailable()
    // batch 1: drifted (disjoint vocabulary — a crawl gone wrong)
    mem.addData((20L, "web", "zzz qqq vvv kkk zzz qqq www uuu"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(s"$base/monitor")
      .select("batch_id", "source", "js").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(rows.keySet == Set((0L, "web"), (1L, "web")), rows.toString)
    // the drifted batch's divergence must dwarf the in-distribution one
    assert(rows((1L, "web")) > 3 * rows((0L, "web")),
      s"js0=${rows((0L, "web"))} js1=${rows((1L, "web"))}")
  }
}
