package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions.shingleSet

/** Persistent, INCREMENTAL MinHash/LSH dedup index — the "dedup a new
  * batch against an existing 100 TB corpus" contract every continuously
  * ingesting training-data pipeline needs. `Dedup.minhashLshPairs` is the
  * one-shot whole-corpus operator; this is its build-once/serve-many
  * twin, the same split `IvfIndex` gives ANN search
  * (sim/IvfIndex.scala):
  *
  *  - `create` scans the corpus once per stored table and writes two
  *    parquet tables under `dir`: `bands` (id, bkey — the 8-byte LSH
  *    band-bucket key) BUCKETED by bkey, and `shingles` (id, sh —
  *    xxhash64'd word-shingle set as array<bigint>) BUCKETED by id.
  *  - `load` re-opens them in ANY later session (catalog re-registration
  *    + bucket-count validation is `Sources.loadBucketed`).
  *  - `pairsAgainst` LSH-joins a NEW batch against the stored bands —
  *    the batch side (small, by definition of incremental ingest) is
  *    shuffled to the store's bucketing, the store side needs NO
  *    exchange — then verifies candidates with exact Jaccard over the
  *    hashed shingle sets.
  *  - `filterNovel` returns the batch rows that survive; `add` appends
  *    the batch's bands + shingles through the catalog tables (inserts
  *    into a bucketed table keep its layout), so ingest step N+1 dedups
  *    against everything steps 1..N kept.
  *
  * The stored shingles are 8-byte hashes, not strings — at corpus scale
  * the shingle store is the big artifact and hashing cuts it ~5-10× while
  * leaving Jaccard identical short of an xxhash64 collision inside one
  * document pair's union (~10⁻¹⁵ per pair). Band keys fold the band index
  * into the hash (`xxhash64(band, bandHash)`) so the bands table carries
  * ONE join column instead of two.
  *
  * Reference analogue: bacon has no dedup at all (SURVEY §2.36-38 derive
  * from published training-data pipelines); the persistence contract
  * mirrors its cutting-board warehouse (bacon/cutting.py:205) the same
  * way IvfIndex does.
  */
final class MinHashIndex private (
    val spark: SparkSession, val dir: String,
    val k: Int, val numHashes: Int, val bands: Int) {

  import MinHashIndex._

  /** The stored tables, re-resolved from the catalog PER ACCESS — a
    * DataFrame captured once would freeze its file listing, making
    * `add`ed increments invisible to later searches in the same session
    * (insertInto refreshes the catalog cache; a fresh spark.table() call
    * picks that up, a held plan does not).
    */
  def bandsTable: DataFrame = graft.sources.Tombstones.filterOut(
    spark, dir, spark.table(tableName(dir, "bands")), "id")
  def shinglesTable: DataFrame = graft.sources.Tombstones.filterOut(
    spark, dir, spark.table(tableName(dir, "shingles")), "id")

  /** Delete ids from the store — the [[graft.sources.Tombstones]]
    * contract (O(|takedown|) append; both table reads anti-join the set
    * out, [[MinHashIndex.compactTo]] drops the rows physically; undo
    * via [[revive]], and [[add]] refuses tombstoned ids — the stored
    * rows still exist, so a re-insert would leave two live copies). A
    * tombstoned doc stops matching new batches immediately — the store
    * behaves as if it was never indexed.
    */
  def remove(ids: DataFrame, idCol: String): Unit =
    graft.sources.Tombstones.add(spark, dir, ids, idCol)

  /** Unmask previously-removed ids: their stored rows serve again. */
  def revive(ids: DataFrame, idCol: String): Unit =
    graft.sources.Tombstones.remove(spark, dir, ids, idCol)

  /** LSH candidate pairs (batch × store) verified by exact Jaccard over
    * the hashed shingle sets: (id — batch, dup_of — stored, jaccard ≥
    * threshold). A batch doc colliding with several stored docs yields
    * several rows; `filterNovel` only needs existence.
    */
  def pairsAgainst(batch: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.5): DataFrame = {
    val withSig = prepare(batch, idCol, textCol, k, numHashes)
    val banded = bandKeys(withSig, numHashes, bands)
    val cands = banded.as("n")
      .join(bandsTable.as("s"), col("n.bkey") === col("s.bkey"))
      // a doc is never a dup of ITSELF: ids are unique across a healthy
      // ingest, so this exclusion is normally a no-op — but when a failed
      // micro-batch REPLAYS after its index.add committed, every replayed
      // row finds itself in the store at jaccard 1.0; ignoring id-equal
      // matches makes the replay recompute exactly the first attempt's
      // answer (crucial for continuousIngest's idempotent sink)
      .where(col("n.id") =!= col("s.id"))
      .select(col("n.id").as("id"), col("s.id").as("dup_of"))
      .dropDuplicates("id", "dup_of")
    val batchSh = withSig.select(col("id"), col("sh"))
    val verified = cands.as("c")
      .join(batchSh.as("x"), col("c.id") === col("x.id"))
      .join(shinglesTable.as("y"), col("c.dup_of") === col("y.id"))
      .select(col("c.id").as("id"), col("c.dup_of").as("dup_of"),
        (size(array_intersect(col("x.sh"), col("y.sh"))).cast("double")).as("inter"),
        size(col("x.sh")).as("n1"), size(col("y.sh")).as("n2"))
      .withColumn("jaccard", col("inter") / (col("n1") + col("n2") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id"), col("dup_of"), round(col("jaccard"), 6).as("jaccard"))
    // a replayed `add` can leave duplicate store rows (see add's scaladoc);
    // identical verified pairs collapse here so callers see each match once
    verified.dropDuplicates("id", "dup_of")
  }

  /** Batch rows that are NOT near-dups of anything already indexed, all
    * columns intact. Within-batch duplicates are intentionally NOT
    * handled here — run `Dedup.minhashLshPairs` on the batch first (the
    * two concerns compose; a typical ingest does batch-self-dedup, then
    * filterNovel, then add).
    */
  def filterNovel(batch: DataFrame, idCol: String, textCol: String,
                  threshold: Double = 0.5): DataFrame = {
    val dups = pairsAgainst(batch, idCol, textCol, threshold)
      .select(col("id").as("__dup_id")).distinct()
    batch.join(dups, batch(idCol) === col("__dup_id"), "left_anti")
  }

  /** Append a batch to the store through the catalog tables — inserts
    * into a bucketed table are laid out per its bucket spec, so the
    * exchange-free search property survives every increment. Callers
    * add AFTER filterNovel (add what was kept), or add everything and
    * treat the index as a full-corpus candidate set.
    *
    * `add` is NOT idempotent: a replayed micro-batch appends its band/
    * shingle rows a second time. That never changes any search answer
    * (pairsAgainst ignores id-equal matches and dedups candidate pairs;
    * filterNovel tests existence), it only wastes store bytes — the
    * at-least-once semantics continuousIngest's scaladoc documents.
    */
  def add(batch: DataFrame, idCol: String, textCol: String): Unit = {
    // a tombstoned id must be revive()d, never re-inserted (the
    // Tombstones duplicate-copy argument)
    graft.sources.Tombstones.requireNoneTombstoned(
      spark, dir, batch.select(col(idCol)), idCol)
    val withSig = prepare(batch, idCol, textCol, k, numHashes)
    bandKeys(withSig, numHashes, bands)
      .write.mode("append").insertInto(tableName(dir, "bands"))
    withSig.select(col("id"), col("sh"))
      .write.mode("append").insertInto(tableName(dir, "shingles"))
    // The write goes through the BATCH's session — under foreachBatch
    // that is a micro-batch CLONE whose insert refreshes only its own
    // relation cache. Invalidate in this index's owning session too, or
    // its next search re-reads a stale file listing and misses the
    // increment.
    spark.catalog.refreshTable(tableName(dir, "bands"))
    spark.catalog.refreshTable(tableName(dir, "shingles"))
  }
}

object MinHashIndex {

  val DefaultBuckets = 16

  /** One projection per indexed doc: id, hashed shingle set, MinHash
    * signature (from the STRING shingles — same seeds/hash as
    * `Dedup.minhashLshPairs`, so index pairs equal one-shot pairs).
    */
  private def prepare(df: DataFrame, idCol: String, textCol: String,
                      k: Int, numHashes: Int): DataFrame =
    df.select(col(idCol).as("id"), shingleSet(col(textCol), k).as("shingles"))
      .withColumn("sig", Dedup.minhashSignature(col("shingles"), numHashes))
      .withColumn("sh", array_sort(transform(col("shingles"), s => xxhash64(s))))
      .select(col("id"), col("sh"), col("sig"))

  /** (id, bkey) per band: bkey = xxhash64(band, xxhash64(band slice)) —
    * the single 8-byte LSH join key.
    */
  private def bandKeys(withSig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    withSig.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows)))))))
        .as("bkey"))
  }

  /** Deterministic catalog names from the index location, like
    * IvfIndex.postingsTable — any session over the same dir resolves the
    * same tables.
    */
  private def tableName(dir: String, which: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(dir.getBytes("UTF-8"))
    s"graft_mh_${which}_" + d.take(8).map(b => f"$b%02x").mkString
  }

  /** Build the store from a corpus and open it. The corpus is scanned
    * once per stored table (twice total — build is a once-per-corpus
    * cost; searches and increments never rescan it).
    */
  def create(spark: SparkSession, dir: String, corpus: DataFrame,
             idCol: String, textCol: String,
             k: Int = 3, numHashes: Int = 32, bands: Int = 8,
             buckets: Int = DefaultBuckets): MinHashIndex = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    // fresh generation: drop any tombstones left by a previous store in
    // this dir, which would otherwise mask freshly-written rows
    graft.sources.Tombstones.clear(spark, dir)
    val withSig = prepare(corpus, idCol, textCol, k, numHashes)
    graft.sources.Sources.writeBucketed(
      bandKeys(withSig, numHashes, bands), "bkey", buckets,
      tableName(dir, "bands"), s"$dir/bands")
    graft.sources.Sources.writeBucketed(
      withSig.select(col("id"), col("sh")), "id", buckets,
      tableName(dir, "shingles"), s"$dir/shingles")
    // driver-side manifest (Sources.writeMetaJson — no Spark job for
    // a one-line file; see IvfIndex.write)
    graft.sources.Sources.writeMetaJson(spark, s"$dir/meta",
      s"""{"k":$k,"numHashes":$numHashes,"bands":$bands}""")
    load(spark, dir)
  }

  /** Compact an ingest-fragmented store into a fresh dir — the
    * [[graft.sim.IvfIndex.compactTo]] contract for BOTH tables: plain
    * parquet re-read (the bucketed catalog scan would claim
    * HashPartitioning and elide the aligning repartition — the
    * documented optimizer trap), tombstoned ids dropped for real, one
    * aligning repartition per table, bucketed rewrite at the
    * one-file-per-bucket floor. The destination starts with an empty
    * tombstone set; write-then-swap stays with the caller. Returns
    * (filesBefore, filesAfter) summed over both tables.
    */
  def compactTo(spark: SparkSession, srcDir: String, dstDir: String,
                buckets: Int = DefaultBuckets): (Int, Int) = {
    import graft.sources.{Sources, Tombstones}
    val bandsRaw = spark.read.parquet(s"$srcDir/bands")
    val shRaw = spark.read.parquet(s"$srcDir/shingles")
    val before = bandsRaw.inputFiles.length + shRaw.inputFiles.length
    Sources.writeBucketed(
      Tombstones.filterOut(spark, srcDir, bandsRaw, "id")
        .repartition(buckets, col("bkey")),
      "bkey", buckets, tableName(dstDir, "bands"), s"$dstDir/bands")
    Sources.writeBucketed(
      Tombstones.filterOut(spark, srcDir, shRaw, "id")
        .repartition(buckets, col("id")),
      "id", buckets, tableName(dstDir, "shingles"), s"$dstDir/shingles")
    // parameter meta travels verbatim: signatures in the copied tables
    // were computed under these (k, numHashes, bands)
    graft.sources.Sources.writeMetaJson(spark, s"$dstDir/meta",
      graft.sources.Sources.readMetaJson(spark, s"$srcDir/meta"))
    load(spark, dstDir) // register the destination's catalog entries
    (before,
      spark.read.parquet(s"$dstDir/bands").inputFiles.length +
        spark.read.parquet(s"$dstDir/shingles").inputFiles.length)
  }

  /** Open a written index in this (or any later) session. Catalog
    * re-registration + stale-bucketing validation is Sources.loadBucketed
    * (manifest is the source of truth).
    */
  def load(spark: SparkSession, dir: String): MinHashIndex = {
    val meta = graft.sources.Sources.readMetaJson(spark, s"$dir/meta")
    def fld(f: String) = graft.sources.Sources.metaLong(meta, f).getOrElse(
      throw new IllegalStateException(s"manifest at $dir/meta has no $f: $meta")).toInt
    // register/validate the catalog entries once; per-access resolution
    // (bandsTable/shinglesTable defs) then picks up appended increments
    graft.sources.Sources.loadBucketed(spark, tableName(dir, "bands"), s"$dir/bands")
    graft.sources.Sources.loadBucketed(spark, tableName(dir, "shingles"), s"$dir/shingles")
    new MinHashIndex(spark, dir, fld("k"), fld("numHashes"), fld("bands"))
  }
}
