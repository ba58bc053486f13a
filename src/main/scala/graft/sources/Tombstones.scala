package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Logical deletes for the persistent index tiers (IVF/PQ postings,
  * MinHash bands+shingles) — the FAISS `remove_ids` / Lucene tombstone
  * pattern over immutable parquet: a delete APPENDS the ids to a small
  * `tombstones` table under the index dir (no bucket rewrite, no
  * read-modify-write of the big artifact), every read path anti-joins
  * them out, and the next compaction drops the rows physically and
  * starts the destination with an empty tombstone set.
  *
  * Why this shape at 100 TB: takedown sets (GDPR erasure, DMCA,
  * contamination discoveries) are tiny relative to the store, and the
  * store's value is its bucketed layout — rewriting buckets per delete
  * is a full-index job, while an appended id list is O(|takedown|).
  * The anti-join's build side is the tombstone table, so AQE broadcasts
  * it and the bucketed store side keeps its exchange-free scan.
  *
  * Undo is EXPLICIT, not insert-triggered: `revive` (= [[remove]])
  * unmasks the stored rows. The index `addTo`/`add` paths REFUSE a
  * batch intersecting the tombstone set instead of reviving — the
  * tombstoned row is still physically present, so appending a second
  * copy and unmasking would leave BOTH alive (duplicate search results;
  * the spec pins the counterexample). Fresh data for a dead id goes in
  * after a compaction has dropped the old row for real.
  *
  * The reference has no persistent-index lifecycle at all (bacon's
  * caches are rebuildable derivations); this contract exists for the
  * scale-out store tiers.
  */
object Tombstones {

  private def path(dir: String) = s"$dir/tombstones"

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(dir))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The current tombstoned id set (distinct), empty when none exist.
    * The id keeps the TYPE the first `add` wrote (the index layers put
    * no type constraint on their id columns — a long cast here would
    * silently no-op string-id takedowns under non-ANSI, or throw under
    * ANSI); all adds against one index dir must use the same id type.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    if (!exists(spark, dir)) spark.range(0).select(col("id"))
    else spark.read.parquet(path(dir)).select(col("id")).distinct()

  /** Mark ids deleted: append to the tombstone table. Idempotent in
    * effect (the read side is a distinct set); re-marking an id is a
    * few duplicate rows until the next compaction, never a wrong result.
    */
  def add(spark: SparkSession, dir: String, ids: DataFrame, idCol: String): Unit =
    ids.select(col(idCol).as("id")).distinct()
      .write.mode("append").parquet(path(dir))

  /** Revive ids — unmask their stored rows by rewriting the small
    * tombstone table without them. The survivor set is materialized
    * (localCheckpoint) BEFORE the overwrite — an overwrite of the path
    * a lazy plan still reads would otherwise consume its own deletion.
    */
  def remove(spark: SparkSession, dir: String, ids: DataFrame, idCol: String): Unit =
    if (exists(spark, dir)) {
      val survivors = read(spark, dir)
        .join(ids.select(col(idCol).as("id")), Seq("id"), "left_anti")
        .localCheckpoint(true)
      // reviving the LAST id deletes the table outright, restoring the
      // no-tombstones fast path (filterOut passes frames through with
      // their exact original plan) — an empty parquet dir would keep
      // every future read paying the anti-join forever
      if (survivors.isEmpty) clear(spark, dir)
      else survivors.write.mode("overwrite").parquet(path(dir))
    }

  /** Throw when `batch` contains a tombstoned id — the guard the index
    * insert paths run (see the class scaladoc for why re-insert must
    * not revive). One small-×-small join; no-op plan when no tombstone
    * table exists.
    */
  def requireNoneTombstoned(spark: SparkSession, dir: String, batch: DataFrame,
                            idCol: String): Unit =
    if (exists(spark, dir)) {
      val hit = batch.select(col(idCol).as("id"))
        .join(read(spark, dir), Seq("id")).limit(5)
        .collect().map(_.get(0))
      require(hit.isEmpty,
        s"batch contains tombstoned ids (${hit.mkString(", ")}…): revive() them " +
          "to unmask the stored rows, or compact the index first to insert fresh data")
    }

  /** Drop all tombstones (compaction wrote a physically-clean store). */
  def clear(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Anti-join the tombstoned ids out of an index read. When no
    * tombstone table exists the frame passes through UNTOUCHED — the
    * common no-deletes case keeps its exact plan (no join node, the
    * bucketed-scan exchange-free property unperturbed).
    */
  def filterOut(spark: SparkSession, dir: String, df: DataFrame,
                idCol: String): DataFrame =
    if (!exists(spark, dir)) df
    else df.join(read(spark, dir).withColumnRenamed("id", "__tomb_id"),
      df(idCol) === col("__tomb_id"), "left_anti")
}
