package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely different words entirely here now friends"),
    (3L, "another unrelated document about spark engines"),
    (4L, "rain in spain falls mainly on the plain today"),
  ).toDF("doc_id", "text")

  private lazy val batch = Seq(
    (10L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (11L, "a wholly novel document nothing like the corpus"),
    (12L, "another unrelated document about spark engines"), // exact dup of 3
  ).toDF("doc_id", "text")

  test("index pairs equal the one-shot minhashLshPairs cross pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mhidx").toString
    val idx = MinHashIndex.create(spark, dir, corpus, "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, buckets = 4)
    val got = idx.pairsAgainst(batch, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // oracle: the one-shot operator over corpus ∪ batch, restricted to
    // cross pairs (store ids < 10 < batch ids, so id1 is the stored doc)
    val want = Dedup.minhashLshPairs(corpus.union(batch), "doc_id", "text",
        k = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a < 10L && b >= 10L }
      .map { case (a, b, j) => (b, a, j) }.toSet
    assert(got == want)
    assert(got.map(p => (p._1, p._2)) == Set((10L, 1L), (12L, 3L)))
  }

  test("filterNovel keeps only batch rows with no stored near-dup; add() extends the store") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mhidx2").toString
    val idx = MinHashIndex.create(spark, dir, corpus, "doc_id", "text", buckets = 4)
    val kept = idx.filterNovel(batch, "doc_id", "text")
    assert(kept.columns.toSeq == batch.columns.toSeq) // all columns intact
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(11L))
    // ingest step: add what was kept, then the SAME doc arriving again
    // (new id) is no longer novel — the increment is immediately visible
    idx.add(kept, "doc_id", "text")
    val again = Seq((20L, "a wholly novel document nothing like the corpus"))
      .toDF("doc_id", "text")
    assert(idx.filterNovel(again, "doc_id", "text").count() == 0L)
    // and a fresh load sees the increment too (it lives in the tables)
    val re = MinHashIndex.load(spark, dir)
    assert(re.filterNovel(again, "doc_id", "text").count() == 0L)
  }

  test("a fresh-session load searches without an Exchange on the stored bands side") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mhidx3").toString
    MinHashIndex.create(spark, dir, corpus, "doc_id", "text", buckets = 4)
    // simulate the fresh session: drop the catalog entries, keep the files
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_mh_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    val idx = MinHashIndex.load(spark, dir)
    // the stored-bands scan is pre-partitioned by bkey: a bkey
    // aggregation over it plans with NO exchange at all…
    val agg = idx.bandsTable.groupBy("bkey").count()
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
      agg.queryExecution.executedPlan.toString)
    // …and in the LSH join only the (small) batch side shuffles to meet
    // the store's bucketing: exactly one bkey exchange in the whole plan
    val plan = idx.pairsAgainst(batch, "doc_id", "text").queryExecution.executedPlan.toString
    val bkeyExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning(bkey"))
    assert(bkeyExchanges <= 1, plan)
  }

  test("remove tombstones a stored doc; compactTo drops it physically; revive unmasks") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mhidx4").toString
    val idx = MinHashIndex.create(spark, dir, corpus, "doc_id", "text", buckets = 4)
    def hits() = idx.pairsAgainst(batch, "doc_id", "text")
      .select("id", "dup_of").as[(Long, Long)].collect().toSet
    assert(hits() == Set((10L, 1L), (12L, 3L)))
    // takedown of stored doc 1: immediately invisible to searches
    idx.remove(Seq(1L).toDF("doc_id"), "doc_id")
    assert(hits() == Set((12L, 3L)))
    // unrelated ids in the takedown set change nothing
    idx.remove(Seq(999L).toDF("doc_id"), "doc_id")
    assert(hits() == Set((12L, 3L)))
    // compaction drops the rows for real and starts clean
    val dst = java.nio.file.Files.createTempDirectory("graft-mhidx5").toString
    MinHashIndex.compactTo(spark, dir, dst, buckets = 4)
    val re = MinHashIndex.load(spark, dst)
    assert(spark.read.parquet(s"$dst/shingles")
      .where(col("id") === 1L).count() == 0L)
    assert(!new java.io.File(s"$dst/tombstones").exists())
    assert(re.pairsAgainst(batch, "doc_id", "text")
      .select("id", "dup_of").as[(Long, Long)].collect().toSet == Set((12L, 3L)))
    // re-inserting a tombstoned id is refused (its stored rows still
    // exist — a second copy would double-serve); revive() unmasks them
    intercept[IllegalArgumentException] {
      idx.add(corpus.where(col("doc_id") === 1L), "doc_id", "text")
    }
    idx.revive(Seq(1L).toDF("doc_id"), "doc_id")
    assert(hits() == Set((10L, 1L), (12L, 3L)))
  }

  test("takedown propagates through the ingest loop: a removed doc stops masking new arrivals") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mhidx6").toString
    val idx = MinHashIndex.create(spark, dir, corpus, "doc_id", "text", buckets = 4)
    val arrival = batch.where(col("doc_id") === 10L) // near-dup of stored 1
    // masked while doc 1 is indexed…
    assert(idx.filterNovel(arrival, "doc_id", "text").count() == 0L)
    // …takedown of doc 1 → the arrival is novel again and gets KEPT —
    // the corpus re-acquires the content through the front door instead
    // of silently losing it forever
    idx.remove(Seq(1L).toDF("doc_id"), "doc_id")
    assert(idx.filterNovel(arrival, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq == Seq(10L))
    idx.add(arrival, "doc_id", "text")
    // the replacement now masks the NEXT copy (id 20, same shingles as 10)
    val next = arrival.select((col("doc_id") + 10L).as("doc_id"), col("text"))
    assert(idx.filterNovel(next, "doc_id", "text").count() == 0L)
    assert(idx.pairsAgainst(next, "doc_id", "text")
      .select("dup_of").as[Long].collect().toSet == Set(10L))
  }

  test("a replayed batch carrying a tombstoned id is dropped by the ingest step, not thrown on") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mhidx7").toString
    val idx = MinHashIndex.create(spark, dir, corpus, "doc_id", "text", buckets = 4)
    idx.remove(Seq(2L).toDF("doc_id"), "doc_id")
    // at-least-once replay of a PRE-takedown batch containing doc 2
    // itself: resurrecting it would undo the takedown, and letting
    // index.add throw would poison-pill the streaming loop (checkpoint
    // replays the same batch forever) — the ingest step silently drops it
    val replay = corpus.where(col("doc_id") === 2L)
      .union(Seq((30L, "fresh new content unrelated to anything stored"))
        .toDF("doc_id", "text"))
    val kept = graft.streaming.Streams.ingestBatch(replay, idx, "doc_id", "text")
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(30L))
    idx.add(kept, "doc_id", "text") // must not throw: id 2 was filtered out
  }
}
