package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVFADC index — faiss.IndexIVFPQ's on-disk role, on the
  * [[IvfIndex]] train/add/search contract: the expensive parts (two
  * Lloyd trainings + the corpus encode pass) run ONCE at `build`, the
  * artifacts round-trip through parquet, and any later session answers
  * queries from the stored bytes alone — no retraining, no raw-corpus
  * scan.
  *
  * Stored form is the RESIDUAL encoding ([[Pq.ivfAdcResidualTopK]]'s
  * math, Jégou et al. 2011 §IV.B — what IndexIVFPQ actually stores):
  * PQ codebooks quantize `v − centroid(cell(v))`, so the same m×k code
  * budget buys a finer grid once the coarse quantizer has explained the
  * cell structure. Three tables:
  *
  *  - `centroids` (cid, cv, cnrm): the coarse quantizer —
  *    numCentroids rows, always driver-collectable;
  *  - `codebooks` (sub, code, cv): the m residual-space PQ codebooks —
  *    m·k rows, the ADC lookup tables derive from these per query;
  *  - `codes` (id, codes, cid): the one data-sized artifact — m small
  *    ints per corpus row plus its cell id, written BUCKETED by `cid`
  *    so probe-pruned scans skip both the exchange and (with bucket
  *    pruning) the untouched buckets.
  *
  * 100 TB shape: searches never touch float vectors — the query's
  * per-probed-cell LUTs (nProbe·m·k floats) are driver-built literals,
  * pruning is a FILTER on the codes scan's own `cid`, and scoring is a
  * codegen'd array-aggregate over m codes. The optional exact rerank
  * ([[PqIndex.search]]) joins only the candidate-sized ADC survivors
  * back to a caller-supplied vector frame — the index itself stays
  * codes-only, which is the point of PQ (the FAISS refine split).
  *
  * Reference analogue: bacon has no ANN; its cutting-board
  * materializations play the same build-once/serve-many role for
  * aggregates (bacon/cube/cutting_board.py).
  */
final class PqIndex private[sim] (val centroids: DataFrame,
                                  val codebooks: DataFrame,
                                  val codes: DataFrame) {

  /** ADC candidates for one query: (id, d2) — the `candidates` rows
    * with the smallest summed residual-LUT distances among the query's
    * `nProbe` nearest cells. The scan is codes-only, pruned by its own
    * `cid` (a filter, never a join); the per-cell LUT map literal is
    * built driver-side from the two collected small tables.
    */
  def searchAdc(query: Array[Float], candidates: Int,
                nProbe: Int = 4): DataFrame = {
    require(candidates > 0 && nProbe > 0)
    val centRows = centroids.collect()
    val probeCids = Pq.probeCells(centRows, query, nProbe)
    val centVecs = centRows.map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    val bookRows = codebooks.collect()
    val lutByCid: Map[Int, Seq[Seq[Float]]] = probeCids.map { cid =>
      val cv = centVecs(cid)
      val qr = Array.tabulate(query.length)(i => query(i) - cv(i))
      cid -> Pq.lutArray(qr, bookRows).map(_.toSeq).toSeq
    }.toMap
    val lutCol = typedlit(lutByCid)
    val contrib = transform(col("codes"),
      (c, i) => element_at(element_at(
        element_at(lutCol, col("cid")), (i + 1).cast("int")), c))
    codes.where(col("cid").isin(probeCids.toSeq: _*))
      .withColumn("d2", aggregate(contrib, lit(0.0f), (acc, x) => acc + x))
      .select(col("id"), col("d2"))
      .orderBy(col("d2").asc, col("id").asc)
      .limit(candidates)
  }

  /** ADC search + exact rerank (the FAISS refine split): the top
    * `candidates` ADC hits re-score against their true vectors from
    * `vectors` (candidate-sized equi-join — AQE broadcasts it) and the
    * best `k` by exact L2 win. `vectors` is caller-supplied because
    * the index deliberately stores no floats; pass the corpus table
    * (or an id-keyed vector store).
    */
  def search(vectors: DataFrame, idCol: String, vecCol: String,
             query: Array[Float], k: Int, nProbe: Int = 4,
             candidates: Int = 100): DataFrame = {
    require(k <= candidates, s"k=$k > candidates=$candidates")
    val v = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
    Pq.exactRerank(searchAdc(query, candidates, nProbe), v, idCol, query, k)
  }

  /** Batch ADC search — a QUERY FRAME against the index, the
    * [[IvfIndex.search]] contract on compressed codes. Per-query LUT
    * literals (the single-query path) cannot scale to a frame, so each
    * probe ROW builds its own lookup table where the data still lives
    * distributed: the m·k codebooks travel as ONE constant literal
    * (m·k·dsub floats — structure-sized, never data- or query-sized),
    * and every (query, probed cell) row materializes
    * lut[s][c] = ‖qr_sub(s) − codebook(s, c)‖² ONCE — the classic ADC
    * discipline (Jégou et al. 2011 §V.A). Pair rows then pay m
    * element_at lookups + a sum, not m·dsub multiplies: the residual
    * arithmetic runs |queries|·nProbe times instead of once per
    * (probe × cell-occupancy) pair — a ~cell-size reduction in
    * floating-point work, with bit-identical d2 (the per-subspace
    * accumulation order is unchanged, the hoist only changes WHERE it
    * runs).
    *
    * Shape: probes = |queries|·nProbe slim rows carrying the query's
    * per-cell LUT (m·k floats — comparable to the residual it
    * replaces); the cell equi-join meets only the probed cells' codes;
    * pair rows are (id1, id2, d2) after the lookup-sum. Returns the
    * per-query ADC top-k — compose an exact rerank over the survivors
    * when fine ranking matters (the [[search]] split).
    */
  def searchBatch(queries: DataFrame, idCol: String, vecCol: String,
                  k: Int, nProbe: Int = 4,
                  excludeSelf: Boolean = false): DataFrame = {
    require(k > 0 && nProbe > 0)
    val (books, m, _, dsub) = PqIndex.bookNest(codebooks.collect())
    val bookLit = typedlit(books)
    // fail fast on a null or wrong-width query vector: its residual
    // arithmetic would yield d2 = NULL, which sorts NULLS FIRST and
    // would silently return arbitrary rows as the top-k (the
    // single-query path fails the same case via Pq.lutArray's require)
    val dim = m * dsub
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("v",
        when(col("v").isNull || size(col("v")) =!= lit(dim),
          raise_error(concat(
            lit(s"searchBatch: query vector must have $dim elements, got "),
            coalesce(size(col("v")).cast("string"), lit("NULL")),
            lit(" (id "), col("id").cast("string"), lit(")"))))
          .otherwise(col("v")))
      .withColumn("nrm", Similarity.norm(col("v")))
    // per-(query, probed cell) residual: the nProbe cell ranking plus one
    // broadcast centroid join — |queries|·nProbe rows. The LUT projection
    // sits BELOW the cell equi-join (computed once per probe row, reused
    // across every code row the join matches), which is the whole point
    // of the hoist — Catalyst never collapses a Project through a Join,
    // so the placement is stable.
    val qr = zip_with(col("v"), col("__ccv"), (a, b) => a - b)
    val probes = Similarity.rankCentroids(q, centroids, nProbe).join(q, "id")
      .join(broadcast(centroids.select(col("cid"), col("cv").as("__ccv"))), Seq("cid"))
      .select(col("id").as("id1"), col("cid"),
        transform(bookLit, (bs, s) => transform(bs, bv =>
          aggregate(
            zip_with(slice(qr, s * dsub + 1, lit(dsub)), bv,
              (a, b) => (a - b) * (a - b)),
            lit(0.0f), (acc, x) => acc + x))).as("lut"))
    val idCond = if (excludeSelf) col("id1") =!= col("id2") else lit(true)
    val contrib = transform(col("codes"), (c, s) =>
      element_at(element_at(col("lut"), s + 1), c))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id1")).orderBy(col("d2").asc, col("id2").asc)
    probes.join(codes.withColumnRenamed("id", "id2"), Seq("cid"))
      .where(idCond)
      .withColumn("d2", aggregate(contrib, lit(0.0f), (acc, x) => acc + x))
      .select(col("id1"), col("id2"), col("d2"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("id1"), col("id2"), col("d2"))
  }

  /** Persist all three tables; a later [[PqIndex.load]] serves searches
    * from these bytes alone. The codes — the one data-sized artifact —
    * are written BUCKETED by `cid` (Sources.writeBucketed), so loaded
    * probe-pruned scans are exchange-free; the two quantizer tables are
    * plain parquet (they are collected driver-side anyway).
    */
  def write(dir: String, buckets: Int = IvfIndex.DefaultBuckets): Unit = {
    val spark = codes.sparkSession
    // a full overwrite is a fresh generation: stale tombstones from a
    // previous index in this dir would silently mask freshly-written
    // rows (and make addTo refuse their ids) — clear them first
    graft.sources.Tombstones.clear(spark, dir)
    // coalesce(1): the quantizer tables are structure-sized (they are
    // collected driver-side on every search) and usually LocalRelations,
    // whose physical scan otherwise fans out to defaultParallelism
    // near-empty tasks — 32 tiny files written and 32 tasks on every
    // later collect, for ~100 rows (measured: 2×32 tasks, ~1 s runtime
    // + 3.3 s deserialize per write at sf0.1)
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    codebooks.coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    graft.sources.Sources.writeBucketed(
      codes, "cid", buckets, PqIndex.codesTable(dir), s"$dir/codes")
    // driver-side manifest (see IvfIndex.write)
    graft.sources.Sources.writeMetaJson(spark, s"$dir/meta",
      s"""{"buckets":$buckets}""")
  }
}

object PqIndex {

  /** Train the coarse quantizer and the residual PQ codebooks, encode
    * the full corpus — the corpus is scanned once for residuals (one
    * assignment pass + one broadcast centroid join) and once for the
    * encode; both trainings run on the bounded `trainCap` sample.
    */
  def build(df: DataFrame, idCol: String, vecCol: String,
            m: Int = 8, codesPerSub: Int = 16,
            numCentroids: Int = 16, iters: Int = 3,
            trainCap: Long = 1000000L): PqIndex = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val cents = Similarity.trainQuantizer(v, numCentroids, iters, trainCap)
    val resid = residuals(v, cents).localCheckpoint(true)
    val books = Pq.train(resid, "id", "rv", m, codesPerSub, iters, trainCap)
    val codes = Pq.encode(resid, "id", "rv", books)
      .join(resid.select(col("id"), col("cid")), Seq("id"))
    new PqIndex(cents, books, codes)
  }

  /** Append a batch to a WRITTEN index: vectors assign to the FROZEN
    * coarse quantizer and encode against the FROZEN codebooks (standard
    * IVF-PQ practice — retraining would relocate or re-code existing
    * rows), then insert into the bucketed codes table. The batch
    * shuffles once on the bucket key; nothing else moves.
    */
  def addTo(spark: SparkSession, dir: String, batch: DataFrame,
            idCol: String, vecCol: String): Unit = {
    val idx = load(spark, dir)
    val v = batch.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val r = residuals(v, idx.centroids)
    val posts = Pq.encode(r, "id", "rv", idx.codebooks)
      .join(r.select(col("id"), col("cid")), Seq("id"))
    insertCodes(spark, dir, posts.select(col("id"), col("codes"), col("cid")),
      batch.select(col(idCol).as("id")))
  }

  /** [[addTo]] for a batch ALREADY encoded by [[codeReconstructions]] —
    * the ingest loop's insert half, paying no second residual/codebook
    * pass. Rows must come from THIS index's frozen quantizers.
    */
  def addToEncoded(spark: SparkSession, dir: String, recon: DataFrame): Unit =
    insertCodes(spark, dir, recon.select(col("id"), col("codes"), col("cid")),
      recon.select(col("id")))

  private def insertCodes(spark: SparkSession, dir: String,
                          posts: DataFrame, ids: DataFrame): Unit = {
    // a tombstoned id must be revive()d, never re-inserted (the
    // Tombstones duplicate-copy argument); checked on the bare id
    // column so the guard never drags the encode plan along
    graft.sources.Tombstones.requireNoneTombstoned(spark, dir, ids, "id")
    val tbl = codesTable(dir)
    if (spark.catalog.tableExists(tbl))
      posts.write.mode("append").insertInto(tbl)
    else
      posts.write.mode("append").parquet(s"$dir/codes")
  }

  /** Delete ids from a WRITTEN index — the FAISS `remove_ids` role via
    * [[graft.sources.Tombstones]]: O(|takedown|) append; `load`-based
    * reads anti-join the set out, [[compactTo]] drops the rows
    * physically. Undo via [[revive]]; [[addTo]] refuses tombstoned ids.
    */
  def removeFrom(spark: SparkSession, dir: String, ids: DataFrame,
                 idCol: String): Unit =
    graft.sources.Tombstones.add(spark, dir, ids, idCol)

  /** Unmask previously-removed ids: their stored codes serve again. */
  def revive(spark: SparkSession, dir: String, ids: DataFrame,
             idCol: String): Unit =
    graft.sources.Tombstones.remove(spark, dir, ids, idCol)

  /** (id, cid, rv = v − centroid(cell(v))): cell assignment + one
    * broadcast join against the centroid table — the residual pass both
    * build and addTo encode from.
    */
  private def residuals(v: DataFrame, cents: DataFrame): DataFrame =
    Similarity.assignWithVec(v, cents)
      .join(broadcast(cents.select(col("cid"), col("cv").as("__ccv"))), Seq("cid"))
      .select(col("id"), col("cid"),
        zip_with(col("v"), col("__ccv"), (a, b) => a - b).as("rv"))

  /** Per-cell code occupancy of a written index: (cid, n_codes) for
    * EVERY trained cell, empty ones included — the same drift signal as
    * [[IvfIndex.cellStats]] (PQ codes are lossy, so a skewed cell
    * degrades both probe cost AND ADC fidelity: the residual grid was
    * trained for the old population). One aggregation over the codes
    * table; bucketed layouts answer it exchange-free.
    */
  def cellStats(spark: SparkSession, dir: String): DataFrame = {
    val idx = load(spark, dir)
    idx.centroids.select(col("cid"))
      .join(idx.codes.groupBy(col("cid")).agg(count(lit(1)).as("n_codes")),
        Seq("cid"), "left")
      .select(col("cid"), coalesce(col("n_codes"), lit(0L)).as("n_codes"))
  }

  /** Compact an ingest-fragmented index into a fresh dir — the
    * [[IvfIndex.compactTo]] contract verbatim (each `addTo` micro-batch
    * appends one file set per bucket; searches pay a task + footer
    * parse per file). Codes are re-read as a PLAIN parquet scan (the
    * bucketed catalog scan would claim HashPartitioning and elide the
    * aligning repartition — the documented optimizer trap), repartition
    * by cid aligns rows to their bucket's task, and the bucketed
    * rewrite reaches the one-file-per-bucket floor. Write-then-swap
    * stays with the caller (flip via [[graft.sources.GenerationPointer]]
    * when managed). Returns (filesBefore, filesAfter) for the codes
    * table.
    *
    * Compaction also collapses REPLAY-DUPLICATED rows: a micro-batch
    * that crashed between its insert and its checkpoint commit
    * re-inserts its survivors on replay (the ingest loop's documented
    * at-least-once window), leaving two identical code rows for the
    * same id. The dedup is over the FULL row, so only bit-identical
    * replays collapse — two genuinely CONFLICTING rows for one id (a
    * caller double-inserting different vectors) both survive and stay
    * visible, rather than one being dropped arbitrarily.
    */
  def compactTo(spark: SparkSession, srcDir: String, dstDir: String,
                buckets: Int = IvfIndex.DefaultBuckets): (Int, Int) = {
    // tombstoned rows die here for real: the destination is written
    // without them and starts with an empty tombstone set
    val raw = spark.read.parquet(s"$srcDir/codes")
    val codes = graft.sources.Tombstones.filterOut(spark, srcDir, raw, "id")
      .dropDuplicates()
    val before = raw.inputFiles.length
    new PqIndex(spark.read.parquet(s"$srcDir/centroids"),
        spark.read.parquet(s"$srcDir/codebooks"),
        codes.repartition(buckets, col("cid")))
      .write(dstDir, buckets)
    (before, load(spark, dstDir).codes.inputFiles.length)
  }

  /** The collected codebooks as a dense (subspace → code → vector)
    * nest for a constant literal, plus (m, kCodes, dsub) — shared by
    * [[PqIndex.searchBatch]]'s inline ADC and [[decoded]]'s
    * reconstruction. Missing (sub, code) slots (possible when a
    * degenerate training sample left a code unused) fill with a
    * huge-distance sentinel so they can never win.
    */
  private[sim] def bookNest(bookRows: Array[org.apache.spark.sql.Row])
      : (Seq[Seq[Seq[Float]]], Int, Int, Int) = {
    val m = bookRows.map(_.getInt(0)).max + 1
    val kCodes = bookRows.map(_.getInt(1)).max
    val dsub = bookRows.head.getSeq[Float](2).length
    val books: Seq[Seq[Seq[Float]]] = (0 until m).map { s =>
      val bySub = bookRows.filter(_.getInt(0) == s)
      (1 to kCodes).map { c =>
        bySub.find(_.getInt(1) == c).map(_.getSeq[Float](2).toSeq)
          .getOrElse(Seq.fill(dsub)(Float.MaxValue / (2 * m)))
      }
    }
    (books, m, kCodes, dsub)
  }

  /** (id, cid, vhat): decode code rows back to their reconstruction
    * v̂ = centroid(cid) + concat_s codebook(s, codes[s]) — the inverse
    * of the residual encode, and the vector the compressed tier
    * actually "remembers". Both small tables travel as constant
    * literals (structure-sized); the decode is a pure map expression.
    */
  private def decoded(codes: DataFrame, cents: DataFrame,
                      codebooks: DataFrame): DataFrame = {
    val (books, _, _, _) = bookNest(codebooks.collect())
    val bookLit = typedlit(books)
    val centMap: Map[Int, Seq[Float]] = cents.collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toSeq).toMap
    val centLit = typedlit(centMap)
    codes.select(col("id"), col("cid"), col("codes"),
      zip_with(
        flatten(transform(col("codes"),
          (c, s) => element_at(element_at(bookLit, s + 1), c))),
        element_at(centLit, col("cid")),
        (a, b) => a + b).as("vhat"))
  }

  /** Encode a batch through the FROZEN quantizer + codebooks and decode
    * straight back: (id, cid, codes, vhat). This is the batch's view IN
    * THE INDEX'S OWN METRIC — comparing these reconstructions against
    * [[storedReconstructions]] makes batch-vs-batch and batch-vs-store
    * comparisons exactly consistent (the replay-determinism requirement
    * of the ingest loop: a replayed row meets its batch-mates' stored
    * codes at the SAME distances the first attempt saw in self-dedup).
    * The codes ride along so ONE encoding pass serves dedup AND the
    * eventual insert ([[addToEncoded]]) — the ingest loop must never
    * pay the residual/codebook join three times per batch.
    */
  def codeReconstructions(spark: SparkSession, dir: String, batch: DataFrame,
                          idCol: String, vecCol: String): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids")
    val books = spark.read.parquet(s"$dir/codebooks")
    val v = batch.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val r = residuals(v, cents)
    val codes = Pq.encode(r, "id", "rv", books)
      .join(r.select(col("id"), col("cid")), Seq("id"))
    decoded(codes, cents, books)
  }

  /** (id, cid, vhat) for every LIVE stored code (tombstones masked). */
  def storedReconstructions(spark: SparkSession, dir: String): DataFrame = {
    val idx = load(spark, dir)
    decoded(idx.codes, idx.centroids, idx.codebooks)
  }

  /** Cell assignment of a batch under the index's frozen coarse
    * quantizer — the [[IvfIndex.assignCells]] contract on the PQ tier.
    */
  def assignCells(spark: SparkSession, dir: String, batch: DataFrame,
                  idCol: String, vecCol: String): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids")
    val v = batch.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    Similarity.rankCentroids(v, cents, 1)
      .select(col("id").as(idCol), col("cid"))
  }

  /** max/mean cell occupancy over the codes — the [[IvfIndex
    * .occupancySkew]] drift signal for the compressed tier (a skewed
    * cell degrades probe cost AND ADC fidelity — its residual grid was
    * trained for the old population). 1.0 on an empty index.
    */
  def occupancySkew(spark: SparkSession, dir: String): Double = {
    val r = cellStats(spark, dir)
      .agg(max(col("n_codes")).cast("double").as("mx"),
        avg(col("n_codes")).as("mean")).head()
    if (r.isNullAt(1) || r.getDouble(1) == 0.0) 1.0
    else r.getDouble(0) / r.getDouble(1)
  }

  /** Batch rows with a STORED near-duplicate in the index's own metric:
    * cosine of RECONSTRUCTIONS ≥ `threshold` against a live code in the
    * same cell, id-equal matches ignored (replay safety — see
    * [[codeReconstructions]]). The compressed-tier mirror of
    * [[IvfIndex.storeDupIds]]: the store holds no floats, so the
    * comparison runs on what the store can actually reproduce.
    */
  def storeDupIds(spark: SparkSession, dir: String, batch: DataFrame,
                  idCol: String, vecCol: String,
                  threshold: Double): DataFrame =
    storeDupIdsFromRecon(spark, dir,
      codeReconstructions(spark, dir, batch, idCol, vecCol), threshold)

  /** [[storeDupIds]] over an ALREADY-ENCODED batch (a
    * [[codeReconstructions]] frame) — the ingest loop encodes once and
    * feeds the same frame here and to [[addToEncoded]].
    */
  def storeDupIdsFromRecon(spark: SparkSession, dir: String, recon: DataFrame,
                           threshold: Double): DataFrame = {
    val b = recon.select(col("id"), col("cid"), col("vhat").as("__bv"))
    val s = storedReconstructions(spark, dir)
      .select(col("id").as("__sid"), col("cid"), col("vhat").as("__sv"))
    b.join(s, Seq("cid"))
      .where(col("id") =!= col("__sid") &&
        Similarity.cosine(col("__bv"), col("__sv")) >= threshold)
      .select(col("id")).distinct()
  }

  /** Catalog name for the bucketed codes table — deterministic from the
    * index location (the [[IvfIndex.postingsTable]] convention).
    */
  private[sim] def codesTable(dir: String): String =
    IvfIndex.tableName("graft_pq_codes_", dir)

  /** Load a written index: the two quantizer tables as plain parquet,
    * the codes through a re-registered external bucketed table
    * ([[IvfIndex.loadBucketedTable]] — meta file is the source of truth
    * for the bucket count; a stale or mismatched catalog entry is
    * dropped and recreated, and an unbucketed legacy layout falls back
    * to the plain scan rather than a mis-declared bucketing).
    */
  def load(spark: SparkSession, dir: String): PqIndex =
    new PqIndex(spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/codebooks"),
      graft.sources.Tombstones.filterOut(spark, dir,
        IvfIndex.loadBucketedTable(spark, dir, "codes", codesTable(dir)), "id"))
}
