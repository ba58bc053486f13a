package graft.cube

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The reference's CuttingBoard (bacon/cutting.py:21): a dataset + cubedef
  * with a slice cache and reuse strategies.
  *
  * Spark re-expression of the three reuse strategies:
  *  - ReuseCachedSlice (bacon/cutting.py:235): exact query → serve the
  *    persisted slice directly.
  *  - DrillOnFirstAxis (bacon/cutting.py:274) and ManipulateSlice
  *    (bacon/cutting.py:336): a persisted slice on a SUPERSET of axes
  *    answers the query by filtering on axis values and re-aggregating —
  *    touching only the (small) materialized aggregate, never the base
  *    data. This is classic OLAP cube materialization: at 100 TB the
  *    finer slice is maybe 10⁶ rows while the base is 10¹²; every
  *    dashboard drill-down after the first scan is served from it.
  *
  * Directly re-aggregatable measures (Sum/Min/Max/Count/UnionSet) merge
  * their finished values from a coarser-than-cached query; the quotient
  * accumulators Avg/StdDev/RatioSum are served through the hidden
  * companion columns every cached slice carries ([[companionAggs]]):
  * the components (Σx, Σx², counts) re-aggregate additively and the
  * finished quotient is rebuilt after the merge — never avg-of-avgs.
  * Only GroupConsistent and the distinct-count family fall through to
  * the base scan (no bounded cached form merges them), exactly as a
  * correct materialized-view rewriter must.
  *
  * Persistence: with `warehouseDir` set, every cached slice is ALSO
  * written as a parquet table named by a fingerprint of its query (plus a
  * tiny manifest holding the query's URL string, row count and creation
  * stamp). A later board over the same warehouse reloads those tables, so
  * materializations survive the driver — the real 100 TB materialized-
  * view story, where in-memory persist() dies with the session.
  *
  * Staleness: `maxAgeMillis` mirrors the reference's TTL'd dataset cache
  * (bacon/utils/cache.py:1-127 re-checks a callable dataset per slice):
  * once the board's data is older than the TTL, the next slice() first
  * refreshes — re-invoking `datasetSource` when given — and drops every
  * cached slice (memory and warehouse). `clock` is injectable for tests.
  *
  * Warehouse GC: in-memory eviction keeps the parquet table (a future
  * board may reload it), so a long-lived service accretes tables for
  * every distinct query it ever materialized. `maxWarehouseSlices` /
  * `maxWarehouseBytes` bound that: after every materializing write the
  * least-recently-SERVED tables (manifest mtime, touched on each reuse
  * hit) are deleted until both budgets hold. Tables backing a slice
  * still in the in-memory cache are never deleted — the persisted frame
  * re-reads those files on block eviction — they count toward the
  * budget but only cold tables are evictable.
  *
  * Warehouse concurrency: READERS are always safe — tables land
  * temp-then-swap and manifests rename atomically, so a second board's
  * reload (or a persisted frame's lazy re-read) sees a complete old or
  * complete new table, never a torn one. WRITERS within one JVM are
  * safe too: every filesystem mutation of a warehouse serializes on a
  * JVM-wide lock keyed by the dir's canonical path
  * ([[CuttingBoard.warehouseWriteLock]]), so two boards sharing a
  * warehouseDir cannot interleave a temp-dir clobber or a delete
  * mid-swap. ACROSS processes the contract is single-writer: two
  * writer PROCESSES on one warehouse are unguarded (as with any
  * filesystem-backed materialized-view store without a lock service) —
  * run one writing board per warehouse and any number of readers.
  */
final class CuttingBoard(
    initialDataset: DataFrame,
    val cubedef: CubeDef,
    maxSlices: Int = 20,
    storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    warehouseDir: Option[String] = None,
    maxAgeMillis: Option[Long] = None,
    datasetSource: Option[() => DataFrame] = None,
    clock: () => Long = () => System.currentTimeMillis(),
    maxWarehouseSlices: Int = Int.MaxValue,
    maxWarehouseBytes: Long = Long.MaxValue,
) {
  /** A cached slice: its query, the persisted frame, its exact row count
    * (known because slices are materialized eagerly on insert) and its
    * column width — rows × width is the cost input for cheapest-slice
    * selection (proportional to the cells a re-aggregation reads),
    * mirroring the reference's estimate_cost scoring
    * (bacon/cutting.py:216,262,313).
    */
  private final case class Cached(q: CubeQuery, df: DataFrame, rows: Long) {
    // width from the QUERY, not the frame: cached frames carry hidden
    // maintenance companions (__m_*) that reuse never reads, and the
    // cost score must keep mirroring the reference's visible-cell count
    val width: Int = q.axes.length + math.max(q.valuesInSlice.length, 1)
    def cost: Long = rows * width
  }

  /** MRU cache: most recently used first (bacon keeps a deque of 20).
    * Volatile so [[gcWarehouse]] can re-read the pin set lock-free while
    * holding only the warehouse lock (board→warehouse is the only legal
    * lock order; taking the board lock there would deadlock against
    * refresh/purgePersisted).
    */
  @volatile private var cache: Vector[Cached] = Vector.empty
  private var current: DataFrame = initialDataset
  private var hitCount = 0L
  private var missCount = 0L
  private var lastRefreshMillis: Long = clock()

  /** Per-query-fingerprint compute locks: a miss holds only its own
    * query's lock while the (long) Spark job materializes, so concurrent
    * hits — and misses on OTHER queries — pass straight through the short
    * board-level critical sections instead of queueing behind it. Two
    * concurrent misses on the SAME query serialize here and the second
    * re-checks the cache, so the base scan runs once.
    */
  private val computeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  // Reload persisted slices: materialized views written by an earlier
  // board over the same warehouse. Unreadable or TTL-expired entries are
  // skipped (recompute is always sound). Filter values round-trip through
  // the labels' ValueCodecs (typed URL parse); codec-less non-string
  // values reload as strings and simply miss the cache — never wrong.
  warehouseDir.foreach { dir =>
    val d = new java.io.File(dir)
    d.mkdirs()
    val manifests = Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("slice_") && f.getName.endsWith(".manifest"))
      .sortBy(-_.lastModified())
    manifests.take(maxSlices).foreach { mf =>
      try {
        val lines = java.nio.file.Files.readAllLines(mf.toPath)
        val url = lines.get(0)
        val rows = lines.get(1).toLong
        val created = lines.get(2).toLong
        val pq = new java.io.File(dir, mf.getName.stripSuffix(".manifest"))
        if (maxAgeMillis.forall(a => clock() - created <= a) && pq.exists()) {
          val q = UrlQueryBuilder.parse(url, cubedef)
          val reread = initialDataset.sparkSession.read
            .parquet(pq.getAbsolutePath)
          // every table this board writes carries the full companion set
          // for ITS CubeDef's measures; a table missing any (older
          // layout, or the same measure name re-declared with a
          // different accumulator — the URL fingerprint cannot see an
          // agg change) is skipped (recompute is always sound) rather
          // than cached as a frame the append/delete paths cannot
          // maintain
          if (companionCols(q.valuesInSlice).forall(reread.columns.contains)) {
            val df = reread.persist(storageLevel)
            cache = cache :+ Cached(q, df, rows)
          }
        }
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    // Tables beyond the reloaded set (or beyond the byte budget) are
    // dead weight from an earlier, larger board — collect them now.
    gcWarehouse(pinnedFingerprints)
  }

  def dataset: DataFrame = current
  def stats: (Long, Long) = (hitCount, missCount)

  /** The query of the cached slice that served the last reuse hit —
    * observable cost-based-selection evidence for specs/diagnostics.
    */
  @volatile var lastServedFrom: Option[CubeQuery] = None

  /** Execute a query, reusing a cached slice when possible.
    *
    * Locking: cache lookups/mutations take the (short) board lock; the
    * expensive part of a miss — the base scan + materializing write — runs
    * under a per-query lock only (`computeLocks`). CubeService serves HTTP
    * from one board, so a slow cold slice must not block every concurrent
    * cache hit.
    */
  def slice(q: CubeQuery): DataFrame = {
    synchronized { maybeAutoRefresh() }
    tryServe(q) match {
      case Some(df) => df
      case None =>
        val lock = computeLocks.computeIfAbsent(fingerprint(q), _ => new Object)
        lock.synchronized {
          // Re-check under the query lock: a concurrent miss on the same
          // query may have just cached it.
          tryServe(q).getOrElse {
            val base = synchronized { missCount += 1; lastServedFrom = None; current }
            if (cacheable(q)) {
              // Materialize eagerly: the caller's next action reads the cache
              // instead of re-firing the base scan, and the row count becomes
              // the cost estimate for later cheapest-slice selection. With a
              // warehouse, materialization IS the parquet write; the cached
              // frame reads the table back so even post-eviction the bytes
              // survive for a future board. The cached form is WIDE: the
              // query's own columns plus the hidden maintenance companions
              // (companionAggs) riding the same groupBy — the caller only
              // ever sees the query's columns.
              val wide = Slicer.slice(base, cubedef, q,
                extraAggs = companionAggs(q.valuesInSlice))
              val (persisted, rows) = materialize(q, wide)
              synchronized {
                if (cache.length >= maxSlices) {
                  // drop the in-memory handle; the parquet table (if any)
                  // stays for a future board, until the warehouse GC
                  // below reclaims it as LRU
                  cache.last.df.unpersist()
                  cache = cache.dropRight(1)
                }
                cache = Cached(q, persisted, rows) +: cache
              }
              // OUTSIDE the board lock: gcWarehouse blocks on the shared
              // per-warehouse write lock, which a peer board can hold
              // across a long materialize write — pinning this board's
              // lock for that duration would stall every tryServe hit
              gcWarehouse(pinnedFingerprints)
              val outCols =
                if (q.valuesInSlice.nonEmpty) q.axes ++ q.valuesInSlice
                else q.axes :+ "count"
              persisted.select(outCols.map(col): _*)
            } else Slicer.slice(base, cubedef, q)
          }
        }
    }
  }

  /** [[slice]] plus post-aggregation MEASURE predicates — the HAVING
    * face of the board (the §2.33 post-agg filter composed WITH the
    * reuse strategies instead of applied to a raw Slicer pass). Each
    * `having` term names a visible measure of `q` (or "count" on a
    * values-less query) and evaluates on the FINISHED served frame —
    * after cache serving, strategy-2 re-aggregation, hierarchy widening
    * and quotient rebuild — so a coarse HAVING query over an
    * Avg/StdDev/RatioSum measure is answered from a finer cached slice
    * through the companion columns at re-aggregation cost, never a base
    * rescan (previously only quotient VALUES served; a filter on one
    * recomputed). The underlying predicate-free query is what the cache
    * keys on, so ONE materialization serves every HAVING variant over
    * it — the right cache economics: measure thresholds vary per
    * dashboard interaction, the grouped slice does not.
    *
    * limit/offset are refused here: [[slice]] applies them before this
    * predicate could run (not HAVING semantics) — order and limit on
    * the returned frame instead.
    */
  def sliceHaving(q: CubeQuery, having: Seq[Filter]): DataFrame = {
    require(q.limit.isEmpty && q.offset.isEmpty,
      "sliceHaving: limit/offset would apply BEFORE the measure " +
        "predicate — compose them on the returned frame")
    // a pivoted slice renames measure columns per pivot value, so
    // col(f.name) would either fail unresolved or coincidentally match
    // a pivot-value column named like the measure — refuse loudly
    require(q.pivot.isEmpty,
      "sliceHaving: pivoted output has per-pivot-value columns — " +
        "apply HAVING on the unpivoted query, then pivot the result")
    having.foreach { f =>
      val ok =
        if (q.valuesInSlice.isEmpty) f.name == "count"
        else q.values.contains(f.name)
      require(ok, s"sliceHaving: '${f.name}' is not a visible measure of " +
        "this query (HAVING terms evaluate on the finished slice output)")
    }
    having.foldLeft(slice(q)) { (acc, f) =>
      acc.where(FilterOp.compile(f.op, col(f.name), f.value))
    }
  }

  /** Board-locked cache probe: returns the served frame on a hit. Plan
    * construction only — never runs a Spark job — so holding the board
    * lock here is cheap.
    */
  private def tryServe(q: CubeQuery): Option[DataFrame] = synchronized {
    reuse(q).map { df =>
      hitCount += 1
      // LRU recency for the warehouse GC: serving from a slice marks its
      // manifest as freshly used (reuse() just promoted it to the head).
      cache.headOption.foreach(c => touchManifest(fingerprint(c.q)))
      df
    }
  }

  /** Incremental maintenance: the dataset grows by `delta` and every
    * cached slice is brought current WITHOUT touching the (100 TB) base
    * table — the materialized-view maintenance step. A slice is
    * maintainable when every measure is merge-capable from its CACHED
    * form: directly for Sum/Count/Min/Max/Union (the same set the
    * drill-down reuse path re-aggregates), and through the hidden
    * companion columns ([[companionAggs]]) for the quotient accumulators
    * Avg/StdDev/RatioSum — their components (sum, count, sum²) merge
    * additively and the finished quotient is rebuilt after the merge, so
    * they too update at cost ∝ |delta| + |slice|, never ∝ |base|. Only
    * GroupConsistent (and the distinct-count family) still evicts: its
    * finished value cannot be merged and no bounded companion exists
    * (all-agree-else-null needs the group's value multiset). Evicted
    * slices delete their warehouse tables and manifests so a future
    * board cannot reload a stale materialization, and recompute on next
    * touch. A values-less query (the reference's default row count)
    * maintains too: its synthetic "count" column merges like Agg.Count.
    *
    * The delta must carry the base schema (unionByName). Counts stay
    * exact: a delta row lands in exactly one group of each slice, and
    * the merge rules are the accumulators' own merge semantics. The
    * rebuilt StdDev uses the closed form √((Σx² − (Σx)²/n)/(n−1))
    * (clamped at 0 for FP dust on near-constant groups): same value as
    * stddev_samp up to FP associativity — bit-exact on exactly-
    * representable data, last-ulp on arbitrary doubles, the tolerance
    * any distributed stddev already carries across partitionings.
    */
  def append(delta: DataFrame): Unit = synchronized {
    current = current.unionByName(delta)
    cache = cache.flatMap { c =>
      val vals = c.q.valuesInSlice
      if (!vals.forall(mergeableFromCache)) {
        c.df.unpersist()
        dropPersisted(c.q)
        None
      } else {
        // a values-less query slices to the reference's default row
        // count — a synthetic Count measure named "count", maintainable
        // like any other (the __m_n companion is its support on delete)
        val measureCols = if (vals.nonEmpty) vals else Vector("count")
        def aggOf(v: String): Agg =
          if (vals.isEmpty) Agg.Count else cubedef.measure(v).agg
        val deltaSlice = Slicer.slice(delta, cubedef, c.q,
            extraAggs = companionAggs(vals))
          .select(c.df.columns.map(col): _*)
        val aggs = measureCols.map { v =>
          (aggOf(v) match {
            case Agg.Count              => sum(col(v))
            case Agg.UnionIncludedEmpty => max(col(v))
            // quotient placeholders: rebuilt from merged companions below
            case Agg.Avg | Agg.StdDev | Agg.Ratio(_, _) => first(col(v))
            case other                  => other.compile(col(v))
          }).as(v)
        } ++ companionCols(vals).map(cn => sum(col(cn)).as(cn))
        val axisCols = c.q.axes.map(col)
        val union = c.df.unionByName(deltaSlice)
        val merged0 = union.groupBy(axisCols: _*).agg(aggs.head, aggs.tail: _*)
        val merged = measureCols.foldLeft(merged0) { (acc, v) =>
          finishedFromCompanions(v, aggOf(v)).fold(acc)(f => acc.withColumn(v, f))
        }.select(c.df.columns.map(col): _*)
        val (persisted, rows) = materialize(c.q, merged)
        c.df.unpersist()
        Some(Cached(c.q, persisted, rows))
      }
    }
    gcWarehouse(pinnedFingerprints)
  }

  /** Incremental DELETE maintenance — the takedown face of [[append]]:
    * the dataset shrinks by `deleted` and every cached slice is brought
    * current without touching the (100 TB) base table. A slice whose
    * measures are all INVERTIBLE is updated at delta cost: slice the
    * deleted rows with the slice's own query, left-join on the axes,
    * subtract. Invertible means the cached form is a linear sum of
    * per-row contributions: Sum and Count directly, and Avg/StdDev/
    * RatioSum through their hidden companion columns ([[companionAggs]])
    * — components subtract, the finished quotient is rebuilt after. The
    * always-present __m_n companion (count(*)) is the SUPPORT indicator,
    * so a group all of whose rows were deleted drops out entirely (a
    * zero-support row would be observably wrong, not just stale) — a
    * Sum-only slice no longer needs an explicit Count measure for that.
    * Min/Max/Union/GroupConsistent (and the distinct-count family) still
    * evict + recompute on next touch: they are not invertible from any
    * bounded cached form (deleting the max leaves no way to find the
    * runner-up without re-reading the group).
    * Sum inversion yields 0 (not NULL) for a group whose surviving rows
    * are all-NULL in the measure column — exact under the cube
    * convention that measure columns are non-null (the same caveat
    * applies to the Avg/StdDev/Ratio companion sums); evict-by-config if
    * that guarantee does not hold.
    *
    * `deleted` rows must be exact copies of base rows (the multiset
    * except); alternatively pass `keyCols` to delete by key (anti-join —
    * the O(|takedown|) form a 100 TB base wants). In the key form the
    * subtracted amounts are derived from the BASE rows the keys match
    * (a semi-join), never from the caller's frame — a takedown list
    * carries ids, not trustworthy measure values, and subtracting stale
    * values would silently corrupt every maintained slice. Updated
    * slices REWRITE their warehouse tables (temp-then-swap) and evicted
    * slices delete theirs, so a fresh board over the same warehouse can
    * never reload pre-delete bytes.
    */
  def delete(deleted: DataFrame, keyCols: Seq[String] = Seq.empty): Unit = synchronized {
    val base = current
    val deletedRows =
      if (keyCols.isEmpty) deleted
      else base.join(deleted.select(keyCols.map(col): _*).distinct(),
        keyCols, "left_semi")
    current =
      if (keyCols.nonEmpty)
        base.join(deleted.select(keyCols.map(col): _*).distinct(),
          keyCols, "left_anti")
      else base.exceptAll(deleted)
    cache = cache.flatMap { c =>
      val vals = c.q.valuesInSlice
      val measureCols = if (vals.nonEmpty) vals else Vector("count")
      def aggOf(v: String): Agg =
        if (vals.isEmpty) Agg.Count else cubedef.measure(v).agg
      val invertible = measureCols.forall(v => aggOf(v) match {
        case Agg.Sum | Agg.Count | Agg.Avg | Agg.StdDev | Agg.Ratio(_, _) => true
        case _ => false
      })
      if (!invertible) {
        c.df.unpersist()
        dropPersisted(c.q)
        None
      } else {
        val comps = companionCols(vals)
        val deltaSlice = Slicer.slice(deletedRows, cubedef, c.q,
            extraAggs = companionAggs(vals))
          .select(c.df.columns.map(col): _*)
        val axes = c.q.axes
        // equi-join key even for the grand-total (axis-less) slice: a
        // constant column keeps the plan a hash join, never a
        // BroadcastNestedLoopJoin
        val joinKeys = if (axes.nonEmpty) axes else Seq("__one")
        val lhs = if (axes.nonEmpty) c.df else c.df.withColumn("__one", lit(1))
        val rhs0 = if (axes.nonEmpty) deltaSlice
          else deltaSlice.withColumn("__one", lit(1))
        // subtracted columns: finished Sum/Count directly, quotient
        // measures via their companions (finished value rebuilt below)
        val subCols = measureCols.filter(v => aggOf(v) match {
          case Agg.Sum | Agg.Count => true
          case _ => false
        }) ++ comps
        val rhs = rhs0.select(joinKeys.map(k => col(k).as(s"__k_$k")) ++
          subCols.map(v => col(v).as(s"__d_$v")): _*)
        // null-SAFE key equality: a NULL group (null axis value) must
        // still meet its delta row, or its measures silently stay stale
        val joinCond = joinKeys.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _)
        val inverted0 = lhs.join(rhs, joinCond, "left")
          .select(joinKeys.filterNot(_ == "__one").map(col) ++
            measureCols.filterNot(subCols.contains).map(col) ++
            subCols.map(v => (col(v) - coalesce(col(s"__d_$v"),
              lit(0).cast("long"))).as(v)): _*)
        val merged = measureCols.foldLeft(inverted0) { (acc, v) =>
          finishedFromCompanions(v, aggOf(v)).fold(acc)(f => acc.withColumn(v, f))
        }
          .where(col("__m_n") > 0)
          .select(c.df.columns.map(col): _*)
        val (persisted, rows) = materialize(c.q, merged)
        c.df.unpersist()
        Some(Cached(c.q, persisted, rows))
      }
    }
    gcWarehouse(pinnedFingerprints)
  }

  /** Measures maintainable under [[append]] from the cached (wide) form:
    * directly mergeable finished values, plus the quotient accumulators
    * whose companions merge. GroupConsistent / the distinct-count family
    * stay out — no bounded cached form merges them.
    */
  private def mergeableFromCache(name: String): Boolean =
    cubedef.measure(name).agg match {
      case Agg.Sum | Agg.Min | Agg.Max | Agg.Count | Agg.UnionSet |
           Agg.UnionIncludedEmpty | Agg.Avg | Agg.StdDev | Agg.Ratio(_, _) => true
      case _ => false
    }

  /** Hidden maintenance companions riding the cached slice's own groupBy
    * (one pass, one shuffle — Slicer.slice's extraAggs): per-group
    * count(*) (`__m_n`, the universal support indicator) plus, per
    * quotient measure, the decomposed parts its finished value divides —
    * Avg: Σx; StdDev: Σx, Σx², non-null n; RatioSum: Σnum, Σden. The
    * components merge (append) and invert (delete) additively where the
    * published quotient cannot, which is what makes Avg/StdDev/Ratio
    * slices delta-maintainable instead of evict-and-recompute.
    */
  private def companionAggs(vals: Vector[String]): Seq[Column] = {
    val per = vals.flatMap { v =>
      cubedef.measure(v).agg match {
        case Agg.Avg => Seq(sum(cubedef.measure(v).expr).as(s"__m_${v}_s"))
        case Agg.StdDev =>
          val e = cubedef.measure(v).expr.cast("double")
          Seq(sum(e).as(s"__m_${v}_s"), sum(e * e).as(s"__m_${v}_s2"),
            count(e).as(s"__m_${v}_nn"))
        case Agg.Ratio(num, den) =>
          Seq(sum(num).as(s"__m_${v}_sn"), sum(den).as(s"__m_${v}_sd"))
        case _ => Seq.empty
      }
    }
    count(lit(1)).as("__m_n") +: per
  }

  /** The companion column names [[companionAggs]] produces, in order. */
  private def companionCols(vals: Vector[String]): Seq[String] =
    "__m_n" +: vals.flatMap { v =>
      cubedef.measure(v).agg match {
        case Agg.Avg         => Seq(s"__m_${v}_s")
        case Agg.StdDev      => Seq(s"__m_${v}_s", s"__m_${v}_s2", s"__m_${v}_nn")
        case Agg.Ratio(_, _) => Seq(s"__m_${v}_sn", s"__m_${v}_sd")
        case _               => Seq.empty
      }
    }

  /** Rebuild a quotient measure's finished value from (already merged or
    * inverted) companion columns; None for measures whose finished value
    * is maintained directly. Avg divides by the TOTAL row count (the
    * reference's Average contract); StdDev is the closed sample form
    * clamped at 0 against FP dust, NULL below two samples (stddev_samp's
    * contract); RatioSum is NULL on a zero or NULL denominator.
    */
  private def finishedFromCompanions(v: String, agg: Agg): Option[Column] =
    agg match {
      case Agg.Avg => Some(col(s"__m_${v}_s") / col("__m_n"))
      case Agg.StdDev =>
        val n = col(s"__m_${v}_nn")
        val s = col(s"__m_${v}_s"); val s2 = col(s"__m_${v}_s2")
        Some(when(n >= 2, sqrt(greatest((s2 - s * s / n) / (n - 1), lit(0.0)))))
      case Agg.Ratio(_, _) =>
        Some(when(col(s"__m_${v}_sd") =!= 0,
          col(s"__m_${v}_sn") / col(s"__m_${v}_sd")))
      case _ => None
    }

  /** Materialize a computed slice: warehouse write + read-back when a
    * warehouse exists (the bytes survive the driver), plain persist
    * otherwise. Returns the frame to cache and its exact row count.
    *
    * The write lands in a temp directory first and is swapped into the
    * final `slice_<fp>` name only when complete. `append` merges a slice
    * FROM its own persisted table (c.df reads slice_<fp>): a direct
    * mode("overwrite") there would delete the very files the merge plan
    * re-reads if any persisted block got evicted mid-write — failing the
    * job or, worse, committing a slice computed from half-deleted input.
    * Temp-then-swap means the plan's source files stay intact until the
    * new table is fully written (same pattern as writeManifest and
    * Sources.compact). A crash between delete and move leaves a manifest
    * pointing at a missing table — reload's `pq.exists()` check skips it
    * and the slice recomputes, which is sound.
    */
  private def materialize(q: CubeQuery, computed: DataFrame): (DataFrame, Long) =
    warehouseDir match {
      case Some(dir) => CuttingBoard.warehouseWriteLock(dir).synchronized {
        val fp = fingerprint(q)
        val tmp = new java.io.File(dir, s".slice_$fp.tmp")
        val dst = new java.io.File(dir, s"slice_$fp")
        deleteRecursively(tmp)
        computed.write.mode("overwrite").parquet(tmp.getAbsolutePath)
        deleteRecursively(dst)
        java.nio.file.Files.move(tmp.toPath, dst.toPath)
        val reread = computed.sparkSession.read
          .parquet(dst.getAbsolutePath).persist(storageLevel)
        val n = reread.count()
        writeManifest(dir, fp, s"${UrlQueryBuilder.toUrlString(q, cubedef)}\n$n\n${clock()}\n")
        touchManifest(fp) // GC recency from the injectable clock, not FS time
        (reread, n)
      }
      case None =>
        val p = computed.persist(storageLevel)
        (p, p.count())
    }

  /** Mark a slice's materialization as freshly used (GC recency). Uses
    * the injectable clock so specs can order evictions deterministically.
    */
  private def touchManifest(fp: String): Unit = warehouseDir.foreach { dir =>
    new java.io.File(dir, s"slice_$fp.manifest").setLastModified(clock())
    ()
  }

  /** Enforce the warehouse budgets: while the slice count exceeds
    * `maxWarehouseSlices` or the total table+manifest bytes exceed
    * `maxWarehouseBytes`, delete the least-recently-served COLD
    * materialization (manifest mtime order; fingerprints in the
    * in-memory cache are pinned — their persisted frames lazily re-read
    * the table files). Runs WITHOUT the board lock (only the shared
    * per-warehouse write lock), so the caller's pin snapshot can go
    * stale: a concurrent miss on this board may materialize AND cache a
    * new slice between the snapshot and this GC. Two defenses close
    * that window without inverting the board→warehouse lock order:
    * (1) once inside the warehouse lock the pin set is re-derived from
    * a lock-free read of the volatile [[cache]] reference, and (2) any
    * manifest touched at or after the snapshot's clock is exempt this
    * pass — covering a slice whose materialize finished but whose cache
    * insert is not yet visible (manifest mtimes and the recency bound
    * share the injectable `clock`, so the comparison is exact; a
    * recently-touched survivor is re-considered on the next GC).
    * Driver-side directory walking only — the warehouse holds aggregate
    * slices (bounded by group cardinality), never base data, and runs
    * after a materializing write, not per serve.
    */
  private def gcWarehouse(snapshot: PinSnapshot): Unit = warehouseDir.foreach { dir =>
    if (maxWarehouseSlices == Int.MaxValue && maxWarehouseBytes == Long.MaxValue) return
    CuttingBoard.warehouseWriteLock(dir).synchronized {
      val live = snapshot.pinned ++ cache.map(c => fingerprint(c.q))
      gcWarehouseLocked(dir, live, snapshot.atClock)
    }
  }

  /** A pin snapshot: the fingerprints the in-memory cache pins plus the
    * clock at snapshot time (the recency bound for [[gcWarehouse]]'s
    * exemption). Taken under the board lock — [[gcWarehouse]] itself
    * runs WITHOUT the board lock, because it blocks on the shared
    * per-warehouse write lock (held by a peer board across a whole
    * materialize parquet write); taking the snapshot separately keeps
    * this board's tryServe cache hits responsive during a peer's long
    * write.
    */
  private final case class PinSnapshot(pinned: Set[String], atClock: Long)

  private def pinnedFingerprints: PinSnapshot =
    synchronized { PinSnapshot(cache.map(c => fingerprint(c.q)).toSet, clock()) }

  private def gcWarehouseLocked(dir: String, pinned: Set[String],
      snapClock: Long): Unit = {
    def entries = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("slice_") && f.getName.endsWith(".manifest"))
      .map { mf =>
        val fp = mf.getName.stripPrefix("slice_").stripSuffix(".manifest")
        val table = new java.io.File(dir, s"slice_$fp")
        (fp, mf.lastModified(), totalBytes(table) + mf.length())
      }
    var es = entries
    var evictable = es.filterNot(e => pinned(e._1) || e._2 >= snapClock)
      .sortBy(_._2).toList
    while ((es.length > maxWarehouseSlices || es.map(_._3).sum > maxWarehouseBytes)
        && evictable.nonEmpty) {
      val (fp, _, _) = evictable.head
      evictable = evictable.tail
      deleteRecursively(new java.io.File(dir, s"slice_$fp"))
      new java.io.File(dir, s"slice_$fp.manifest").delete()
      es = es.filterNot(_._1 == fp)
    }
  }

  private def totalBytes(f: java.io.File): Long =
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).map(totalBytes).sum
    else if (f.exists()) f.length() else 0L

  /** Delete one slice's warehouse table + manifest (eviction that must
    * not resurrect on reload — e.g. made stale by `append`).
    */
  private def dropPersisted(q: CubeQuery): Unit = warehouseDir.foreach { dir =>
    CuttingBoard.warehouseWriteLock(dir).synchronized {
      val fp = fingerprint(q)
      deleteRecursively(new java.io.File(dir, s"slice_$fp"))
      new java.io.File(dir, s"slice_$fp.manifest").delete()
      ()
    }
  }

  /** Atomic manifest write: temp name + rename, so a writer crashing
    * mid-write can never leave a torn `slice_*.manifest` that silently
    * skips a valid slice table on reload (the reload's NonFatal catch
    * would eat the parse error). The `.manifest` name only ever appears
    * with complete contents; the rename is atomic on POSIX and HDFS-style
    * stores alike.
    */
  private def writeManifest(dir: String, fp: String, contents: String): Unit = {
    val tmp = java.nio.file.Paths.get(dir, s".slice_$fp.manifest.tmp")
    val dst = java.nio.file.Paths.get(dir, s"slice_$fp.manifest")
    java.nio.file.Files.writeString(tmp, contents)
    java.nio.file.Files.move(tmp, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** Stable filesystem-safe name for a query's materialization. */
  private def fingerprint(q: CubeQuery): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(UrlQueryBuilder.toUrlString(q, cubedef).getBytes("UTF-8"))
    d.take(8).map(b => f"$b%02x").mkString
  }

  /** TTL check (bacon/utils/cache.py analogue): an expired board
    * refreshes itself before serving — from `datasetSource` when
    * configured, else just dropping every (stale) cached slice.
    */
  private def maybeAutoRefresh(): Unit =
    maxAgeMillis.foreach { maxAge =>
      if (clock() - lastRefreshMillis > maxAge)
        refresh(datasetSource.map(_()).getOrElse(current))
    }

  /** Swap in a refreshed dataset (the reference's dataset is a callable
    * re-checked per slice, bacon/cutting.py:122): every cached slice is
    * stale by definition, so the cache is dropped and unpersisted — and
    * with a warehouse, the persisted slice tables are deleted too.
    */
  def refresh(newDataset: DataFrame): Unit = synchronized {
    clear()
    purgePersisted()
    current = newDataset
    lastRefreshMillis = clock()
  }

  /** Delete every persisted slice table + manifest in the warehouse. */
  private def purgePersisted(): Unit = warehouseDir.foreach { dir =>
    CuttingBoard.warehouseWriteLock(dir).synchronized {
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.getName.startsWith("slice_") || f.getName.startsWith(".slice_"))
        .foreach(deleteRecursively)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRecursively)
    f.delete(); ()
  }

  /** The un-aggregated filtered dataset (bacon CuttingBoard.filter). */
  def filter(q: CubeQuery): DataFrame = Slicer.filter(current, cubedef, q)

  /** Pivot/limit/ordered queries are served but not cached (their shape
    * is presentation-specific; the underlying groupBy IS cacheable when
    * issued plainly).
    */
  private def cacheable(q: CubeQuery): Boolean =
    q.pivot.isEmpty && q.limit.isEmpty && q.offset.isEmpty

  private def promote(i: Int): Unit =
    if (i > 0) cache = cache(i) +: (cache.take(i) ++ cache.drop(i + 1))

  /** Can a wanted measure be re-aggregated to a coarser grain from this
    * cached frame? Directly-mergeable finished values always; the
    * quotient accumulators (Avg/StdDev/RatioSum) only when the frame
    * carries their companion columns — every table THIS board writes
    * does, but the check keeps an older-layout or hand-written frame
    * from being served wrong (it falls through to the base scan, which
    * is always sound).
    */
  private def reaggregatableFrom(name: String, cachedColumns: Array[String]): Boolean =
    cubedef.measure(name).agg match {
      case Agg.Sum | Agg.Min | Agg.Max | Agg.Count | Agg.UnionSet |
           Agg.UnionIncludedEmpty => true
      case Agg.Avg | Agg.StdDev | Agg.Ratio(_, _) =>
        companionCols(Vector(name)).forall(cachedColumns.contains)
      case _ => false
    }

  private def truncExpr(unit: String, c: org.apache.spark.sql.Column) = unit match {
    case "day" => to_date(c)
    case u     => trunc(c, u)
  }

  /** Resolve a wanted label to a Column over a cached slice's axes:
    * either the axis itself, or — hierarchy widening — a date label
    * derived by truncating a FINER cached date axis (month from a
    * day-grained slice). This is the classic materialized-view rewrite
    * along the time dimension: at 100 TB the day-grained slice is maybe
    * 10⁶ rows, so every coarser period query after the first scan costs
    * one tiny re-aggregation instead of a base-table pass.
    *
    * Widening requires TRUE period containment (day ⊂ month ⊂ quarter ⊂
    * year). A week-grained cached axis is never a valid source for a
    * coarser period: ISO weeks straddle year boundaries (the week of
    * 2019-12-30 contains 2020 days), so trunc(week_start, 'year') would
    * silently aggregate boundary weeks into the wrong year even though
    * week is childOf year in the hierarchy DAG.
    */
  private def overSlice(name: String, cachedAxes: Vector[String]): Option[org.apache.spark.sql.Column] = {
    if (cachedAxes.contains(name)) return Some(col(name))
    if (!cubedef.hasLabel(name)) return None
    cubedef.label(name).codec.collect { case ValueCodec.DateUnitCodec(u) => u }
      .flatMap { unit =>
        cachedAxes.find { a =>
          cubedef.hasLabel(a) && cubedef.ancestors(a).contains(name) &&
            cubedef.label(a).codec.exists {
              case ValueCodec.DateUnitCodec(srcUnit) => srcUnit != "week" || unit == "week"
              case _ => false
            }
        }.map(a => truncExpr(unit, col(a)))
      }
  }

  private def reuse(q: CubeQuery): Option[DataFrame] = {
    // Pivot queries produce a wide shape the cached (long) slices cannot
    // serve — a pivot query can otherwise match Strategy 1/2 on its axes
    // and be answered in the wrong shape.
    if (q.pivot.nonEmpty) return None
    // Strategy 1: exact slice (axes + filters match, values covered).
    // All exact matches answer with zero re-aggregation, so cost ties —
    // take the most recently used.
    val exact = cache.indexWhere { c =>
      c.q.axes == q.axes &&
        c.q.filters.toSet == q.filters.toSet &&
        q.valuesInSlice.toSet.subsetOf(c.q.valuesInSlice.toSet)
    }
    if (exact >= 0) {
      promote(exact)
      val c = cache.head
      lastServedFrom = Some(c.q)
      // a values-less query's slice is the synthetic row count: a
      // values-less CACHED slice's own "count" column, or — when the
      // exact match is a value-carrying slice (∅ ⊆ anything) — the
      // __m_n companion, which IS count(*) at the same (axes, filters).
      // The dispatch keys on the cached QUERY's shape, never on column
      // presence: a value-carrying slice whose user measure is merely
      // NAMED "count" (Sum of an arbitrary column) must not be served
      // as a row count (strategy-2's rule, applied here too). Otherwise
      // the visible values; companions never leave here.
      val served: Seq[org.apache.spark.sql.Column] =
        if (q.valuesInSlice.isEmpty)
          q.axes.map(col) :+ (if (c.q.valuesInSlice.isEmpty) col("count")
            else col("__m_n").as("count"))
        else (q.axes ++ q.values).map(col)
      return Some(finish(c.df.select(served: _*), q))
    }

    // Strategy 2: re-aggregate a finer cached slice. Conditions mirror
    // ManipulateSlice.is_compatible (bacon/cutting.py:346), widened along
    // date hierarchies: every wanted axis and every extra filter must be
    // resolvable over the cached axes — directly, or derived by
    // truncating a finer cached date axis (overSlice); cached filters ⊆
    // wanted filters; every wanted value present and mergeable.
    //
    // ALL compatible slices are scored and the cheapest wins — the
    // reference scores every strategy × cached slice with estimate_cost
    // and takes the min (bacon/cutting.py:216,262,313,378). Cost here is
    // rows × width (the cells the re-aggregation must read): a tiny
    // exact-grain slice beats a huge finer one regardless of MRU
    // position, and a narrow finer slice beats a wide one whose fewer
    // rows carry more columns.
    val finerIdx = cache.indices.filter { i =>
      val cq = cache(i).q
      // A cached slice grouped on a SET axis was exploded per-element —
      // each base row contributed once per element — so dropping that
      // axis in a re-aggregation would multi-count rows. Such a slice
      // only serves queries that keep every set axis it has.
      val setAxesKept = cq.axes
        .filter(a => cubedef.hasLabel(a) && cubedef.label(a).isSet)
        .forall(q.axes.contains)
      // a values-less query (the reference's default row count) re-sums
      // the cached per-group __m_n support — present on EVERY frame this
      // board holds (materialization always rides companionAggs, reload
      // requires companionCols ⊆ columns); the check guards older-layout
      // frames, which fall through to the (always sound) base scan. The
      // visible "count" of a values-less slice is NOT an alternative
      // source: a frame without __m_n could carry a user measure merely
      // NAMED count, and summing it would serve an arbitrary sum as a
      // row count.
      val countable = q.valuesInSlice.nonEmpty ||
        cache(i).df.columns.contains("__m_n")
      setAxesKept && countable &&
        q.axes.forall(a => overSlice(a, cq.axes).isDefined) &&
        cq.filters.toSet.subsetOf(q.filters.toSet) &&
        (q.filters.toSet -- cq.filters.toSet).forall(f => overSlice(f.name, cq.axes).isDefined) &&
        q.valuesInSlice.toSet.subsetOf(cq.valuesInSlice.toSet) &&
        q.valuesInSlice.forall(v => reaggregatableFrom(v, cache(i).df.columns))
    }
    if (finerIdx.nonEmpty) {
      val best = finerIdx.minBy(i => (cache(i).cost, i))
      promote(best)
      val Cached(cq, df, _) = cache.head
      lastServedFrom = Some(cq)
      val extraFilters = q.filters.toSet -- cq.filters.toSet
      // Extra filters evaluate against the slice's axis columns (already
      // computed values) or their hierarchy-derived truncations, never
      // the base expressions.
      val filtered = extraFilters.foldLeft(df) { (acc, f) =>
        acc.where(FilterOp.compile(f.op, overSlice(f.name, cq.axes).get, f.value))
      }
      val axisCols = q.axes.map(a => overSlice(a, cq.axes).get.as(a))
      if (q.valuesInSlice.isEmpty) {
        val counted = filtered.groupBy(axisCols: _*)
          .agg(sum(col("__m_n")).as("count"))
        return Some(finish(counted.select((q.axes :+ "count").map(col): _*), q))
      }
      // quotient measures (Avg/StdDev/RatioSum) cannot merge their
      // finished values — they re-aggregate through the slice's hidden
      // companion columns and the quotient is rebuilt after the merge
      // (never avg-of-avgs), same machinery as append/delete maintenance
      val quotient = q.valuesInSlice.filter(v =>
        finishedFromCompanions(v, cubedef.measure(v).agg).isDefined)
      val comps = if (quotient.isEmpty) Seq.empty else companionCols(quotient)
      val aggs = q.valuesInSlice.map { v =>
        (cubedef.measure(v).agg match {
          case Agg.Count => sum(col(v)) // counts add up
          // merging cached flags is any-true, NOT the base-expression
          // size test (the cached column is already boolean)
          case Agg.UnionIncludedEmpty => max(col(v))
          // quotient placeholders: rebuilt from merged companions below
          case Agg.Avg | Agg.StdDev | Agg.Ratio(_, _) => first(col(v))
          case other                  => other.compile(col(v))
        }).as(v)
      } ++ comps.map(cn => sum(col(cn)).as(cn))
      val merged0 = filtered.groupBy(axisCols: _*).agg(aggs.head, aggs.tail: _*)
      val merged = quotient.foldLeft(merged0) { (acc, v) =>
        acc.withColumn(v, finishedFromCompanions(v, cubedef.measure(v).agg).get)
      }
      return Some(finish(merged.select((q.axes ++ q.values).map(col): _*), q))
    }

    None
  }

  /** Apply presentation (order/limit) on a served slice. */
  private def finish(df: DataFrame, q: CubeQuery): DataFrame = {
    val ordered =
      if (q.order.isEmpty) df
      else df.orderBy(q.order.map(o =>
        if (o.ascending) col(o.name).asc_nulls_first else col(o.name).desc_nulls_last): _*)
    val limited = q.limit match {
      case Some(n) => q.offset.fold(ordered.limit(n))(o => ordered.offset(o).limit(n))
      case None    => q.offset.fold(ordered)(o => ordered.offset(o))
    }
    limited
  }

  /** Unpersist everything (end of session). */
  def clear(): Unit = synchronized {
    cache.foreach(_.df.unpersist())
    cache = Vector.empty
    lastServedFrom = None
  }
}

object CuttingBoard {
  /** JVM-wide per-warehouse write locks (canonical path → monitor):
    * every filesystem MUTATION of a warehouse — slice-table
    * temp-then-swap, manifest write, eviction delete, purge, GC —
    * serializes here, so two boards sharing one warehouseDir in the
    * same JVM can never interleave a temp-dir clobber or a delete
    * mid-swap. Lock ordering: this is the INNERMOST lock (taken under
    * the board lock or a per-query compute lock, never the reverse),
    * so no cycle is possible. Cross-process write safety is the
    * documented single-writer contract (see the class scaladoc).
    */
  private val warehouseWriteLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def warehouseWriteLock(dir: String): Object =
    warehouseWriteLocks.computeIfAbsent(
      new java.io.File(dir).getCanonicalPath, _ => new Object)
}
