package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF ANN index — the train/add/search split of a classic
  * inverted-file index (the FAISS contract), re-expressed as two Spark
  * tables so the expensive parts run ONCE:
  *
  *  - `build` Lloyd-trains the coarse quantizer on a bounded sample and
  *    assigns every corpus vector to its cell in a single full pass;
  *  - `write`/`load` round-trip the centroid table and the posting-list
  *    table (cell id + vector + norm per corpus row) through parquet,
  *    so any later session — or any number of query workloads — searches
  *    without touching the raw corpus or retraining;
  *  - `search` answers an arbitrary query set: broadcast centroid
  *    ranking picks each query's nProbe cells (map-side), and the
  *    posting-list equi-join on cell id scores each candidate with the
  *    exact cosine inline — postings carry vector + norm precisely so
  *    no pair-sized row ever carries one.
  *
  * 100 TB shape: the posting table is the only big artifact and it
  * shuffles once at build; searches move only (query, cid) pairs plus
  * the probed cells' postings. Writing `postings` bucketed by `cid`
  * (Sources.writeBucketed) makes repeated searches exchange-free.
  *
  * Reference analogue: bacon has no ANN, but its cutting-board
  * materializations play the same build-once/serve-many role for
  * aggregates; this is that contract for similarity search.
  */
final class IvfIndex private (val centroids: DataFrame, val postings: DataFrame) {

  /** Top-k neighbours from the index for an arbitrary query frame (need
    * not be the indexed corpus). `excludeSelf` drops id-equal matches —
    * set it when querying the corpus against itself.
    */
  def search(queries: DataFrame, idCol: String, vecCol: String, k: Int,
             nProbe: Int = 4, excludeSelf: Boolean = false): DataFrame = {
    require(k > 0 && nProbe > 0)
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    // query vectors attach to the LINEAR probe table (|queries|×nProbe
    // rows); postings already carry their vector + norm, so the cell
    // equi-join scores each candidate inline and only slim (id1, id2, cos)
    // rows exist pair-wise — the former id-pair + two vector join-backs
    // sorted candidate×vector rows, which is what spilled >70 GB at 100×
    // data. No pair dedup is needed: each posting lives in exactly one
    // cell and a query's probed cells are distinct.
    val probes = Similarity.rankCentroids(q, centroids, nProbe).join(q, "id")
      .select(col("id").as("id1"), col("cid"),
        col("v").as("v1"), col("nrm").as("nrm1"))
    val idCond = if (excludeSelf) col("p.id1") =!= col("y.id") else lit(true)
    val w = Window.partitionBy(col("id1")).orderBy(col("cos").desc, col("id2").asc)
    probes.as("p")
      .join(postings.as("y"), col("p.cid") === col("y.cid") && idCond)
      .select(col("p.id1").as("id1"), col("y.id").as("id2"),
        (Similarity.dot(col("p.v1"), col("y.v")) / (col("p.nrm1") * col("y.nrm"))).as("cos"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos"))
  }

  /** Persist both tables; a later `load` serves searches from these
    * bytes alone. The postings — the one big artifact, and the probe
    * join's build side on every search — are written BUCKETED by `cid`
    * (Sources.writeBucketed): the loaded scan reports
    * HashPartitioning(cid, buckets), so repeat searches skip the
    * postings-side exchange entirely (asserted in IvfIndexSpec).
    */
  def write(dir: String, buckets: Int = IvfIndex.DefaultBuckets): Unit = {
    val spark = postings.sparkSession
    // fresh generation: drop any tombstones left by a previous index in
    // this dir, which would otherwise mask freshly-written rows
    graft.sources.Tombstones.clear(spark, dir)
    // coalesce(1): structure-sized table, usually a LocalRelation whose
    // scan otherwise fans out to defaultParallelism near-empty tasks
    // (see PqIndex.write)
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    graft.sources.Sources.writeBucketed(
      postings, "cid", buckets, IvfIndex.postingsTable(dir), s"$dir/postings")
    // bucket count for a FRESH session's load (which must re-register
    // the external bucketed table) — driver-side Hadoop-FS manifest
    // write (Sources.writeMetaJson): FS-agnostic like the Spark writer
    // it replaces, without a Spark job per one-line file
    graft.sources.Sources.writeMetaJson(spark, s"$dir/meta",
      s"""{"buckets":$buckets}""")
  }
}

object IvfIndex {

  /** Train the quantizer (bounded sample) and assign the full corpus —
    * the corpus is scanned exactly once. Postings keep the vector and
    * its norm so searches never need the original table.
    */
  def build(df: DataFrame, idCol: String, vecCol: String,
            numCentroids: Int = 16, iters: Int = 3,
            trainCap: Long = 1000000L): IvfIndex = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val cents = Similarity.trainQuantizer(v, numCentroids, iters, trainCap)
    // assignment carries the vector through the aggregation (one pass)
    // instead of a slim (id, cid) assignment + an id equi-join back to
    // the corpus — same rows, one fewer join build per invocation
    val postings = Similarity.assignWithVec(v, cents)
      .select(col("id"), col("cid"), col("v"), col("nrm"))
    new IvfIndex(cents, postings)
  }

  val DefaultBuckets = 16

  /** Append a batch to a WRITTEN index: vectors are assigned to the
    * frozen quantizer (standard IVF practice — the coarse centroids are
    * trained once; re-training would relocate existing postings) and
    * inserted into the bucketed postings table, so later loads and
    * searches in any session see them. The batch shuffles once on the
    * bucket key (insertInto honors the table's bucketing); nothing else
    * moves.
    */
  def addTo(spark: SparkSession, dir: String, batch: DataFrame,
            idCol: String, vecCol: String): Unit = {
    val idx = load(spark, dir) // registers/repairs the bucketed table
    val v = batch.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val posts = Similarity.rankCentroids(v, idx.centroids, 1).join(v, "id")
      .select(col("id"), col("cid"), col("v"), col("nrm"))
    // a tombstoned id must be revive()d, never re-inserted: its old
    // posting is still physically present and both copies would serve
    graft.sources.Tombstones.requireNoneTombstoned(
      spark, dir, batch.select(col(idCol)), idCol)
    val tbl = postingsTable(dir)
    if (spark.catalog.tableExists(tbl))
      posts.write.mode("append").insertInto(tbl)
    else // legacy unbucketed layout: plain parquet append
      posts.write.mode("append").parquet(s"$dir/postings")
  }

  /** Delete ids from a WRITTEN index — the FAISS `remove_ids` role via
    * [[graft.sources.Tombstones]]: O(|takedown|) append, no posting
    * rewrite; every `load`-based read (search, stats, dedup, rebuild)
    * anti-joins the set out, and [[compactTo]] drops the rows
    * physically. Undo via [[revive]]; [[addTo]] refuses tombstoned ids
    * (the [[graft.sources.Tombstones]] duplicate-copy argument).
    */
  def removeFrom(spark: SparkSession, dir: String, ids: DataFrame,
                 idCol: String): Unit =
    graft.sources.Tombstones.add(spark, dir, ids, idCol)

  /** Unmask previously-removed ids: their stored postings serve again. */
  def revive(spark: SparkSession, dir: String, ids: DataFrame,
             idCol: String): Unit =
    graft.sources.Tombstones.remove(spark, dir, ids, idCol)

  /** Assign batch vectors to the index's frozen cells: (idCol, cid).
    * The map-side max_by pass the ingest loop scopes its SemDedup to.
    */
  def assignCells(spark: SparkSession, dir: String, batch: DataFrame,
                  idCol: String, vecCol: String): DataFrame = {
    val idx = load(spark, dir)
    val v = batch.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    Similarity.rankCentroids(v, idx.centroids, 1)
      .select(col("id").as(idCol), col("cid"))
  }

  /** Batch rows that have a STORED semantic duplicate: cosine ≥
    * `threshold` against a posting in the SAME IVF cell (cell-exact,
    * SemDedup semantics — Abbas et al. 2023). Cell-exact rather than
    * multi-probe is a correctness choice, not a shortcut: "same
    * assigned cell" is a SYMMETRIC relation under the frozen quantizer,
    * so a batch replayed after its `addTo` committed detects exactly
    * the pairs its first attempt detected (minus id-equal self-matches,
    * ignored here) — the property the streaming ingest loop's
    * exactly-once reasoning needs. Searches that want recall over
    * consistency keep using [[IvfIndex.search]]'s nProbe.
    *
    * Returns distinct batch ids with a store duplicate.
    */
  def storeDupIds(spark: SparkSession, dir: String, batch: DataFrame,
                  idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val idx = load(spark, dir)
    val v = batch.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val cells = Similarity.rankCentroids(v, idx.centroids, 1).join(v, "id")
    cells.as("q")
      .join(idx.postings.as("y"),
        col("q.cid") === col("y.cid") && col("q.id") =!= col("y.id"))
      .where(Similarity.dot(col("q.v"), col("y.v"))
        / (col("q.nrm") * col("y.nrm")) >= threshold)
      .select(col("q.id").as("id")).distinct()
  }

  /** Per-cell occupancy of a written index: (cid, n_postings) for EVERY
    * trained cell, including empty ones (a zero-occupancy cell is the
    * strongest drift signal there is — the quantizer wastes a centroid on
    * a region the corpus has left). One aggregation over the postings
    * table; bucketed layouts answer it exchange-free.
    */
  def cellStats(spark: SparkSession, dir: String): DataFrame = {
    val idx = load(spark, dir)
    idx.centroids.select(col("cid"))
      .join(idx.postings.groupBy(col("cid")).agg(count(lit(1)).as("n_postings")),
        Seq("cid"), "left")
      .select(col("cid"), coalesce(col("n_postings"), lit(0L)).as("n_postings"))
  }

  /** Occupancy skew = max cell occupancy / mean occupancy (mean over ALL
    * trained cells, empty included). 1.0 = perfectly balanced; k means
    * the hottest cell's posting list — and every search that probes it —
    * is k× the design size. Continuous ingest drives this up when the
    * embedding distribution drifts away from the frozen quantizer
    * (the vector-space mirror of d37's token drift): new vectors pile
    * into the few cells nearest the new region. Two scalars from one
    * aggregation — cheap enough to check on every compaction cycle.
    */
  def occupancySkew(spark: SparkSession, dir: String): Double = {
    val r = cellStats(spark, dir)
      .agg(max(col("n_postings")).cast("double").as("mx"),
        avg(col("n_postings")).as("mean")).head()
    if (r.isNullAt(1) || r.getDouble(1) == 0.0) 1.0
    else r.getDouble(0) / r.getDouble(1)
  }

  /** Compact an ingest-fragmented index into a fresh index dir. Every
    * `addTo` micro-batch appends one file set per bucket write — after a
    * day of streaming ingest the postings table is thousands of KB-sized
    * files, and every search pays a task + footer parse per file (the
    * Sources.compact small-files tax, verbatim). This rewrites the
    * postings ONCE through the same bucketed writer (`write`), so the
    * compacted index keeps the exchange-free search property.
    *
    * Write-then-swap stays with the caller (the Sources.compact
    * contract): `dstDir` is a complete, self-contained index — flip the
    * search path to it, then delete `srcDir` at leisure. An in-place
    * rewrite that crashes mid-way loses the index; a new dir never can.
    * Callers coordinating with live ingest must quiesce `addTo` over the
    * copy window — batches appended to `srcDir` after the snapshot read
    * are not in `dstDir`. Returns (filesBefore, filesAfter) for the
    * postings table.
    */
  def compactTo(spark: SparkSession, srcDir: String, dstDir: String,
                buckets: Int = DefaultBuckets): (Int, Int) = {
    // read the postings as a PLAIN parquet scan, not the catalog's
    // bucketed table: the bucketed scan CLAIMS HashPartitioning(cid, b),
    // which makes the optimizer elide the repartition below as redundant —
    // and then the auto-bucketed-scan rule (no join/agg to exploit it)
    // falls back to packed plain-file reads, so tasks end up holding
    // arbitrary bucket mixes and the writer emits one file per
    // (task × bucket) instead of the floor
    // tombstoned rows die here for real: the destination is written
    // without them and starts with an empty tombstone set
    val raw = spark.read.parquet(s"$srcDir/postings")
    // full-row dropDuplicates collapses replay-duplicated rows (a batch
    // that crashed between insert and checkpoint commit re-inserts
    // identical postings on replay — same frozen quantizer, same row);
    // genuinely conflicting same-id rows both survive, staying visible
    val posts = graft.sources.Tombstones.filterOut(spark, srcDir, raw, "id")
      .dropDuplicates()
    val before = raw.inputFiles.length
    // align rows to their bucket's task before the bucketed write:
    // repartition's HashPartitioning and the bucket spec share the same
    // murmur3+pmod placement, so each task holds exactly one bucket and
    // writes exactly one file — files out = non-empty buckets, the
    // floor any bucketed layout can reach
    new IvfIndex(spark.read.parquet(s"$srcDir/centroids"),
        posts.repartition(buckets, col("cid")))
      .write(dstDir, buckets)
    (before, load(spark, dstDir).postings.inputFiles.length)
  }

  /** Re-train the quantizer over the index's CURRENT vector population
    * and emit a rebuilt index at `dstDir` — the drift answer `addTo`'s
    * frozen-quantizer contract defers. Freezing centroids is what makes
    * incremental ingest cheap and replay-idempotent, but after enough
    * drift the cell sizes skew (`occupancySkew`) and searches over the
    * hot cells degrade toward brute force. The rebuild is the standard
    * IVF response (FAISS retrain): one pass over the postings (which
    * carry every vector — the raw corpus is never touched), Lloyd on a
    * bounded sample, reassign, rewrite bucketed.
    *
    * Same write-then-swap contract as [[compactTo]]; after the flip,
    * searches and further `addTo` batches use the NEW cells — cell-exact
    * dedup (`storeDupIds`) stays symmetric because old and new batches
    * now assign against the same retrained centroid table.
    */
  def rebuildTo(spark: SparkSession, srcDir: String, dstDir: String,
                numCentroids: Int = 0, iters: Int = 3,
                trainCap: Long = 1000000L,
                buckets: Int = DefaultBuckets): Unit = {
    val idx = load(spark, srcDir)
    val k =
      if (numCentroids > 0) numCentroids
      // default: re-size to the GROWN corpus — ~√n cells (the e02 sizing
      // rule), so a 100× ingest since build gets 10× the cells instead
      // of 100×-deep posting lists
      else Similarity.suggestedCentroids(
        graft.dedup.Dedup.approxRowCount(idx.postings))
    build(idx.postings.select(col("id"), col("v")), "id", "v",
      k, iters, trainCap).write(dstDir, buckets)
  }

  /** Generation pointer for a MANAGED index location — delegates to the
    * shared [[graft.sources.GenerationPointer]] (atomic temp+rename
    * flip; see its scaladoc for the read-race argument). The
    * compact/rebuild dir-swap is a single safe cutover: write the new
    * generation completely, then flip the pointer; a crash before the
    * flip leaves the old generation live.
    */
  def writeGenerationPointer(spark: SparkSession, baseDir: String, gen: String): Unit =
    graft.sources.GenerationPointer.write(spark, baseDir, gen)

  /** The generation subdir the pointer names, or None when unmanaged. */
  def currentGeneration(spark: SparkSession, baseDir: String): Option[String] =
    graft.sources.GenerationPointer.current(spark, baseDir)

  /** Resolved index dir of a managed location: `baseDir/<current gen>`.
    * Throws when no pointer exists — a managed reader must not guess.
    */
  def currentIndexDir(spark: SparkSession, baseDir: String): String =
    currentGeneration(spark, baseDir) match {
      case Some(g) => s"$baseDir/$g"
      case None => throw new IllegalStateException(
        s"no generation pointer at $baseDir/_current — initialize with " +
          "build(...).write(s\"$baseDir/gen-0\") + writeGenerationPointer(spark, baseDir, \"gen-0\")")
    }

  /** Catalog name for the bucketed postings table — deterministic from the
    * index location so any session over the same dir resolves the same
    * table.
    */
  private[sim] def postingsTable(dir: String): String =
    tableName("graft_ivf_postings_", dir)

  /** Deterministic catalog name from an index location, so any session
    * over the same dir resolves the same table (shared by the IVF and
    * PQ tiers).
    */
  private[sim] def tableName(prefix: String, dir: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(dir.getBytes("UTF-8"))
    prefix + d.take(8).map(b => f"$b%02x").mkString
  }

  /** Bucket count the session catalog declares for `tbl`, None when the
    * table is absent or unbucketed. Read through DESCRIBE (public SQL)
    * rather than internal catalog classes.
    */
  private[sim] def catalogBuckets(spark: SparkSession, tbl: String): Option[Int] =
    if (!spark.catalog.tableExists(tbl)) None
    else spark.sql(s"DESCRIBE TABLE EXTENDED $tbl").collect()
      .find(_.getString(0) == "Num Buckets")
      .flatMap(r => r.getString(1).trim.toIntOption)

  /** Load a written index. Bucketing metadata lives in the session
    * catalog, not the parquet files, so a fresh session re-registers the
    * external bucketed table over the written layout (CLUSTERED BY cid,
    * bucket count from the index's meta file) before reading it; an index
    * written by an older (unbucketed) `write` — no meta file — falls back
    * to the plain parquet scan, never a mis-declared bucketing.
    *
    * The META FILE is the source of truth, not the catalog: an existing
    * registration is reused only when its declared bucket count matches
    * the meta's — the dir can be rewritten out-of-band (another session,
    * a rebuild job) with a different count, and a stale HashPartitioning
    * declaration would suppress exchanges the join/agg actually needs,
    * corrupting results. On mismatch the entry is dropped and recreated
    * (external table — dropping touches no data).
    */
  def load(spark: SparkSession, dir: String): IvfIndex =
    new IvfIndex(spark.read.parquet(s"$dir/centroids"),
      graft.sources.Tombstones.filterOut(spark, dir,
        loadBucketedTable(spark, dir, "postings", postingsTable(dir)), "id"))

  /** The re-registration mechanics behind [[load]] (and
    * [[PqIndex.load]]): read `dir/subdir` through an external
    * CLUSTERED BY (cid) table whose bucket count comes from the index's
    * meta file — the source of truth, per the [[load]] scaladoc. A
    * catalog entry with a different count is dropped and recreated
    * (external table — no data touched); no meta file means an
    * unbucketed legacy layout, read as a plain scan with any lingering
    * registration dropped rather than a mis-declared bucketing.
    */
  private[sim] def loadBucketedTable(spark: SparkSession, dir: String,
                                     subdir: String, tbl: String): DataFrame = {
    val metaBuckets =
      try graft.sources.Sources.metaLong(
        graft.sources.Sources.readMetaJson(spark, s"$dir/meta"), "buckets").map(_.toInt)
      catch { case scala.util.control.NonFatal(_) => None }
    metaBuckets match {
      case Some(b) =>
        if (catalogBuckets(spark, tbl) != Some(b)) {
          spark.sql(s"DROP TABLE IF EXISTS $tbl")
          val schema = spark.read.parquet(s"$dir/$subdir").schema.toDDL
          // '' escaping: a quote in the filesystem path must not break
          // (or worse, redirect) the DDL
          val loc = s"$dir/$subdir".replace("'", "''")
          spark.sql(
            s"""CREATE TABLE $tbl ($schema) USING parquet
               |CLUSTERED BY (cid) SORTED BY (cid) INTO $b BUCKETS
               |LOCATION '$loc'""".stripMargin)
        }
        spark.table(tbl)
      case None =>
        // no meta → the layout is not bucketed; a lingering registration
        // would mis-declare it, so drop before the plain scan
        if (spark.catalog.tableExists(tbl)) spark.sql(s"DROP TABLE IF EXISTS $tbl")
        spark.read.parquet(s"$dir/$subdir")
    }
  }
}
