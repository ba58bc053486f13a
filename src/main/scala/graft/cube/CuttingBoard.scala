package graft.cube

import org.apache.spark.sql.DataFrame
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
  * Only algebraically re-aggregatable measures (Sum/Min/Max/Count/
  * UnionSet) can be served from a coarser-than-cached query; others
  * (Avg/StdDev/CountDistinct/Ratio/Group) fall through to the base scan,
  * exactly as a correct materialized-view rewriter must.
  */
final class CuttingBoard(
    val dataset: DataFrame,
    val cubedef: CubeDef,
    maxSlices: Int = 20,
    storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) {
  /** MRU cache: most recently used first (bacon keeps a deque of 20). */
  private var cache: Vector[(CubeQuery, DataFrame)] = Vector.empty
  private var hitCount = 0L
  private var missCount = 0L

  def stats: (Long, Long) = (hitCount, missCount)

  /** Execute a query, reusing a cached slice when possible. */
  def slice(q: CubeQuery): DataFrame = synchronized {
    reuse(q) match {
      case Some(df) =>
        hitCount += 1
        df
      case None =>
        missCount += 1
        val computed = Slicer.slice(dataset, cubedef, q)
        if (cacheable(q)) {
          val persisted = computed.persist(storageLevel)
          if (cache.length >= maxSlices) {
            cache.last._2.unpersist()
            cache = cache.dropRight(1)
          }
          cache = (q -> persisted) +: cache
          persisted
        } else computed
    }
  }

  /** The un-aggregated filtered dataset (bacon CuttingBoard.filter). */
  def filter(q: CubeQuery): DataFrame = Slicer.filter(dataset, cubedef, q)

  /** Pivot/limit/ordered queries are served but not cached (their shape
    * is presentation-specific; the underlying groupBy IS cacheable when
    * issued plainly).
    */
  private def cacheable(q: CubeQuery): Boolean =
    q.pivot.isEmpty && q.limit.isEmpty && q.offset.isEmpty

  private def promote(i: Int): Unit =
    if (i > 0) cache = cache(i) +: (cache.take(i) ++ cache.drop(i + 1))

  private def reaggregatable(name: String): Boolean =
    cubedef.measure(name).agg match {
      case Agg.Sum | Agg.Min | Agg.Max | Agg.Count | Agg.UnionSet => true
      case _ => false
    }

  private def reuse(q: CubeQuery): Option[DataFrame] = {
    // Pivot queries produce a wide shape the cached (long) slices cannot
    // serve — a pivot query can otherwise match Strategy 1/2 on its axes
    // and be answered in the wrong shape.
    if (q.pivot.nonEmpty) return None
    // Strategy 1: exact slice (axes + filters match, values covered)
    val exact = cache.indexWhere { case (cq, _) =>
      cq.axes == q.axes &&
        cq.filters.toSet == q.filters.toSet &&
        q.valuesInSlice.toSet.subsetOf(cq.valuesInSlice.toSet)
    }
    if (exact >= 0) {
      promote(exact)
      val (_, df) = cache.head
      return Some(finish(df.select((q.axes ++ q.values).map(col): _*), q))
    }

    // Strategy 2: re-aggregate a finer cached slice. Conditions mirror
    // ManipulateSlice.is_compatible (bacon/cutting.py:346): cached axes ⊇
    // wanted axes; cached filters ⊆ wanted filters; every extra filter
    // targets a cached axis (so it can run on the materialized rows);
    // every wanted value is present and algebraically mergeable.
    val finer = cache.indexWhere { case (cq, _) =>
      q.axes.toSet.subsetOf(cq.axes.toSet) &&
        cq.filters.toSet.subsetOf(q.filters.toSet) &&
        (q.filters.toSet -- cq.filters.toSet).forall(f => cq.axes.contains(f.name)) &&
        q.valuesInSlice.toSet.subsetOf(cq.valuesInSlice.toSet) &&
        q.valuesInSlice.forall(reaggregatable)
    }
    if (finer >= 0) {
      promote(finer)
      val (cq, df) = cache.head
      val extraFilters = q.filters.toSet -- cq.filters.toSet
      // Extra filters evaluate against the slice's AXIS COLUMNS (already
      // computed values), not the base expressions.
      val filtered = extraFilters.foldLeft(df) { (acc, f) =>
        acc.where(FilterOp.compile(f.op, col(f.name), f.value))
      }
      val merged = Slicer.Reagg.from(
        filtered.select((cq.axes ++ q.valuesInSlice).map(col): _*),
        q.axes,
        q.valuesInSlice.map(v => v -> cubedef.measure(v).agg))
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
    cache.foreach(_._2.unpersist())
    cache = Vector.empty
  }
}
